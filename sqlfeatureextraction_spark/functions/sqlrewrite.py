"""F11: ClickHouse -> Druid SQL dialect rewrite (eval path).

Re-expression of the reference's ordered regex rule chain
(tools/SQLConverter.java:14-216 ``convertClickhouseToDruid``) plus the
GROUP-BY-by-position pass (tools/SqlGroupByReplacer.java:11-98).  The
rule ORDER is load-bearing and mirrored exactly:

  * ``avg(x)`` -> ``sum(x)/sum("count")`` runs BEFORE the
    sum/min/max measure-suffix rule, so the produced ``sum(x)``
    is then suffixed to ``sum(x_sum)`` (SQLConverter.java:46-48,
    80-97 — net effect ``avg(dur)`` -> ``sum(dur_sum)/sum("count")``);
  * ``\bts\b`` -> ``__time`` runs before every TIME_FLOOR rule, which
    therefore match on ``toStartOfInterval(__time, ...)``
    (SQLConverter.java:26-28, 99-160);
  * the bare-word rules (``group``/``method``/``maxOrNull``) are
    case-SENSITIVE like the Java patterns, so uppercase ``GROUP BY``
    survives (:30-41);
  * ``count()`` -> ``sum("count")`` is the LAST chain rule (:162-172).

Spark posture: this is an eval-side per-string transformation, applied
via an Arrow-batched pandas UDF (``druid_rewrite_udf``) like the other
parser-grade string work (SURVEY §2.10 declared exception) — it is not
on the feature hot path.
"""

import re

import pandas as pd


def _to_datetime64_repl(m: re.Match) -> str:
    """SQLConverter.java:62-77 — the literal seconds/millis are emitted
    as TEXT inside MILLIS_TO_TIMESTAMP, not evaluated."""
    parts = [p for p in m.group(1).split(".") if p != ""]  # Java split
    seconds = int(parts[0])
    if len(parts) > 1:
        frac = parts[1]
        if len(frac) < 3:
            # Java substring(0, 3) throws on a shorter fraction; the
            # exception propagates out of convertClickhouseToDruid
            raise ValueError(
                f"toDateTime64 fraction shorter than 3 digits: {frac!r}"
            )
        millis = int(frac[:3])  # parseInt drops leading zeros
        return f"MILLIS_TO_TIMESTAMP({seconds} * 1000 + {millis})"
    return f"MILLIS_TO_TIMESTAMP({seconds} * 1000)"


def _agg_suffix_repl(m: re.Match) -> str:
    """SQLConverter.java:80-97 — sum(dur) -> sum(dur_sum) etc."""
    func, column = m.group(1), m.group(2)
    return f"{func}({column}_{func})"


_ISO = {"day": lambda n: f"P{n}D", "hour": lambda n: f"PT{n}H",
        "minute": lambda n: f"PT{n}M"}


def _interval_repl(m: re.Match) -> str:
    """SQLConverter.java:113-160 — INTERVAL n unit -> TIME_FLOOR ISO."""
    return f"TIME_FLOOR(__time, '{_ISO[m.group(2)](m.group(1))}')"


# (pattern, replacement) in the reference's exact order
# (SQLConverter.java:14-172); callables are the dynamic rules.
_RULES = [
    (re.compile(r"FROM\s+([\w]+)_cluster\b"), r"FROM \1"),
    (re.compile(r"JOIN\s+([\w]+)_cluster\b"), r"JOIN \1"),
    (re.compile(r"\bts\b"), "__time"),
    (re.compile(r"\bgroup\b"), '"group"'),
    (re.compile(r"\bmethod\b"), '"method"'),
    (re.compile(r"\bmaxOrNull\b"), '"max"'),
    (re.compile(r"\bLIMIT\s+0\s*,\s*(\d+)"), r"LIMIT \1"),
    (re.compile(r"avg\((\w+)\)"), r'sum(\1)/sum("count")'),
    (re.compile(r"FROM\s+pmone\w+\.(\w+)\b"), r"FROM \1"),
    (re.compile(r"\bis_model\s*=\s*true\b"), "is_model = '1'"),
    (re.compile(r"\bis_model\s*=\s*false\b"), "is_model = '0'"),
    (re.compile(r"toDateTime64\(\s*([\d]+\.[\d]*)\s*,\s*3\s*\)"),
     _to_datetime64_repl),
    (re.compile(r"(sum|min|max)\(([\w]+)\)"), _agg_suffix_repl),
    (re.compile(r"toStartOfInterval\s*\(\s*__time,\s*toIntervalDay"
                r"\((\d+)\),\s*'([\w/]+)'\s*\)"),
     r"TIME_FLOOR(__time, 'P\1D')"),
    (re.compile(r"toStartOfInterval\s*\(\s*__time,\s*toIntervalDay"
                r"\((\d+)\)\s*\)"),
     r"TIME_FLOOR(__time, 'P\1D')"),
    (re.compile(r"toStartOfInterval\s*\(\s*__time,\s*toIntervalHour"
                r"\((\d+)\)\s*\)"),
     r"TIME_FLOOR(__time, 'PT\1H')"),
    (re.compile(r"toStartOfInterval\s*\(\s*__time,\s*INTERVAL\s*(\d+)"
                r"\s*(day|hour|minute)\s*,\s*'\S+'\)"),
     _interval_repl),
    (re.compile(r"toStartOfInterval\s*\(\s*__time\s*,\s*INTERVAL\s*(\d+)"
                r"\s*(day|hour|minute)\s*\)"),
     _interval_repl),
    (re.compile(r"count\(\)"), 'sum("count")'),
]

_GROUP_BY = re.compile(
    r"\bGROUP BY\s+([^;]+?)(?=\s*(?:ORDER BY|LIMIT|HAVING|$))",
    re.IGNORECASE | re.DOTALL,
)
_SELECT_FROM = re.compile(r"SELECT(.*?)FROM", re.IGNORECASE | re.DOTALL)
_ALIAS = re.compile(r"\bAS\s+\"?([\w_]+)\"?$", re.IGNORECASE)


def _split_fields(fields_part: str) -> list:
    """Paren-depth-aware top-level comma split
    (SqlGroupByReplacer.java:76-97)."""
    fields, depth, cur = [], 0, []
    for ch in fields_part:
        if ch == "(":
            depth += 1
        if ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    fields.append("".join(cur).strip())
    return fields


def extract_select_aliases(sql: str) -> list:
    """Only AS-aliased select items are collected — bare columns are
    deliberately NOT (the commented-out else branch,
    SqlGroupByReplacer.java:68-71)."""
    m = _SELECT_FROM.search(sql)
    if not m:
        return []
    out = []
    for field in _split_fields(m.group(1).strip()):
        am = _ALIAS.search(field.strip())
        if am:
            out.append(am.group(1))
    return out


def replace_group_by_with_position(sql: str) -> str:
    """SqlGroupByReplacer.replaceGroupByWithPosition (:11-45): each
    GROUP BY field equal to a select alias becomes its 1-based select
    position; the field split here is a PLAIN comma split (the Java
    uses String.split, not the depth-aware helper)."""
    aliases = extract_select_aliases(sql)
    if not aliases:
        return sql

    def repl(m: re.Match) -> str:
        fields = [f.strip() for f in m.group(1).strip().split(",")]
        replaced = []
        for field in fields:
            pos = aliases.index(field) + 1 if field in aliases else 0
            replaced.append(str(pos) if pos > 0 else field)
        return "GROUP BY " + ", ".join(replaced)

    return _GROUP_BY.sub(repl, sql)


def convert_clickhouse_to_druid(sql: str) -> str:
    """The full F11 chain (SQLConverter.convertClickhouseToDruid
    :196-216): every rule applied globally, in order, then the
    GROUP-BY-position pass."""
    out = sql
    for pattern, repl in _RULES:
        out = pattern.sub(repl, out)
    return replace_group_by_with_position(out)


def druid_rewrite_udf():
    """Arrow-batched Series->Series UDF for applying the rewrite to a
    query column at scale (one pass per batch, no shuffle)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def rewrite(queries: pd.Series) -> pd.Series:
        return queries.map(
            lambda q: convert_clickhouse_to_druid(q) if q is not None else None
        )

    return rewrite
