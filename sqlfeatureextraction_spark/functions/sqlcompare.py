"""Where-clause diff + date-range rewrite + GLOBAL-join rewrite.

Re-expression of the reference's Druid-cache reuse pair and the
distributed-ClickHouse join rewriter:

  * ``compare_where_clauses`` — ch/visitor/WhereClauseComparator.java
    :20-199: walk two WHERE expression trees in parallel; report
    whether they are identical, whether every difference is a
    ``'YYYY-MM-DD'`` date literal, and the per-side lower/upper
    bounds over the differing date literals.  The consumer caches a
    query's result set and, when a later query differs only by date
    range, fetches just the incremental range instead of re-running.
  * ``rewrite_cached_date_sql`` — ch/visitor/RewrittenDateSqlBuilder
    .java:14-27: rebuild the CACHED query text with its date range
    shifted to the uncovered tail: cached-lower -> cached-upper and
    cached-upper -> current-upper (so the rewritten query scans
    [cached_hi, current_hi]).
  * ``rewrite_global_joins`` — ch/visitor/GlobalJoinAstRewriter.java
    :11-32: force LEFT/RIGHT/INNER/bare JOINs to their GLOBAL
    variants (distributed ClickHouse requires GLOBAL for correct
    distributed-table joins) and report whether any join was missing
    the keyword.  Pinned on the reference's own TestRewriter
    queries (test/sql/clickhouse/visitor/TestRewriter.java:13-47).

The expression trees come from the engine's existing ClickHouse
tokenizer + recursive-descent parser (functions/apmencode.py —
``("fn", name, args)`` / ``("id", name)`` / ``("lit", text)`` /
``("sub", tokens)`` nodes), so the comparator shares one grammar with
the APM encoder instead of growing a second parser.

Documented divergences from the Java (representation only, semantics
preserved — see tests/test_sqlcompare.py for the reference-pair pins):

  * the shared tokenizer lowercases identifiers, so identifier
    comparison is case-insensitive (Java's Identifier.equals is
    case-sensitive); dashboard-template queries are case-stable so
    the pinned pairs agree;
  * ComparedResult stores date bounds UNQUOTED (the Java keeps the
    surrounding quotes and strips them at every use site);
  * the Java's AsteriskColumnExpr branch tests ``expr1`` twice
    (WhereClauseComparator.java:41) and would ClassCastException on a
    star-vs-non-star pair; here star-vs-star compares true and a
    mismatched pair falls through to the default no-op, like every
    other mismatched node-kind pair (:59 returns the current state
    unchanged — a quirk this port preserves deliberately).

Spark posture: pure per-string functions applied via Arrow-batched
pandas UDFs (``where_diff_udf``, ``global_join_rewrite_udf``) on
eval/query-log frames — parser-grade string work, the SURVEY §2.10
declared exception, never on the feature hot path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd

from .apmencode import _parse_expr, _Cursor, _split_clauses, _tokenize

__all__ = [
    "ComparedResult",
    "compare_where_clauses",
    "extract_where_expr",
    "rewrite_cached_date_sql",
    "rewrite_global_joins",
    "where_diff_udf",
    "global_join_rewrite_udf",
]

_DATE_RE = re.compile(r"[0-9]{4}-[0-9]{2}-[0-9]{2}")


@dataclass
class ComparedResult:
    """Mirror of ch/visitor/ComparedResult.java (bounds unquoted)."""

    totally_the_same: bool = True
    only_date_different: bool = True
    first_value_upper_bound: str | None = None
    first_value_lower_bound: str | None = None
    second_value_upper_bound: str | None = None
    second_value_lower_bound: str | None = None

    @property
    def date_range_extendable(self) -> bool:
        """True when the pair differs ONLY by date literals — the
        cache-reuse precondition the reference's consumer checks."""
        return (not self.totally_the_same) and self.only_date_different


def extract_where_expr(sql: str):
    """Parse one SELECT statement and return its WHERE expression
    tree, or None when there is no WHERE clause (the first depth-0
    WHERE span, same clause segmentation as the APM walk)."""
    toks = _tokenize(sql)
    for name, span in _split_clauses(toks):
        if name == "where":
            return _parse_expr(_Cursor(list(span)))
    return None


def _is_date(text: str) -> bool:
    """WhereClauseComparator.java:151-157 (quotes already stripped by
    the tokenizer)."""
    return bool(_DATE_RE.fullmatch(text))


def _update_bounds(cr: ComparedResult, side: str, text: str) -> None:
    """WhereClauseComparator.java:159-199: running min/max over the
    DIFFERING literals of one side; the first one seeds both bounds.
    ISO dates compare identically as strings and as timestamps."""
    lo = getattr(cr, f"{side}_value_lower_bound")
    hi = getattr(cr, f"{side}_value_upper_bound")
    if lo is None and hi is None:
        setattr(cr, f"{side}_value_lower_bound", text)
        setattr(cr, f"{side}_value_upper_bound", text)
        return
    if _is_date(text) and _is_date(hi) and _is_date(lo):
        if text > hi:
            setattr(cr, f"{side}_value_upper_bound", text)
        if text < lo:
            setattr(cr, f"{side}_value_lower_bound", text)


def _visit(cr: ComparedResult, e1, e2) -> bool:
    """visitColumnExpr (WhereClauseComparator.java:40-60) over the
    tuple AST.  Same accumulation discipline as the Java: failures
    latch onto the shared result object; mismatched node kinds are a
    no-op returning the current state."""
    k1 = e1[0] if isinstance(e1, tuple) else None
    k2 = e2[0] if isinstance(e2, tuple) else None
    if k1 == "star" and k2 == "star":
        return True
    if k1 == "fn" and k2 == "fn":
        return _visit_fn(cr, e1, e2)
    if k1 == "sub" and k2 == "sub":
        # visitSubqueryColumnExpr (:92-101): only exact equality
        # passes; any difference poisons both flags
        if e1[1] == e2[1]:
            return True
        cr.totally_the_same = False
        cr.only_date_different = False
        return False
    if k1 == "id" and k2 == "id":
        return _visit_identifier(cr, e1[1], e2[1])
    if k1 == "lit" and k2 == "lit":
        return _visit_literal(cr, e1[1], e2[1])
    return cr.totally_the_same


def _visit_identifier(cr: ComparedResult, n1: str, n2: str) -> bool:
    """visitIdentifier (:103-115): name mismatch poisons BOTH flags —
    a structural difference is never 'only dates'."""
    if n1 == n2:
        return True
    cr.totally_the_same = False
    cr.only_date_different = False
    return False


def _visit_literal(cr: ComparedResult, t1: str, t2: str) -> bool:
    """visitLiteralColumnExpr (:124-136): differing literals unset
    totally_the_same; non-date differences also unset
    only_date_different; bounds track each side's differing
    literals."""
    if t1 != t2:
        cr.totally_the_same = False
        if not _is_date(t1) or not _is_date(t2):
            cr.only_date_different = False
        _update_bounds(cr, "first", t1)
        _update_bounds(cr, "second", t2)
    return cr.totally_the_same


def _visit_fn(cr: ComparedResult, e1, e2) -> bool:
    """visitFunctionColumnExpr (:76-90): name as identifier, then the
    argument lists pairwise (visitColumnExprList :138-149 — a length
    mismatch unsets totally_the_same but, per the Java, NOT
    only_date_different)."""
    same = _visit_identifier(cr, e1[1], e2[1]) and cr.totally_the_same
    cr.totally_the_same = same
    a1 = e1[2] if e1[2] is not None else []
    a2 = e2[2] if e2[2] is not None else []
    if len(a1) != len(a2):
        cr.totally_the_same = False
        return False
    for c1, c2 in zip(a1, a2):
        cr.totally_the_same = _visit(cr, c1, c2) and cr.totally_the_same
    return cr.totally_the_same


def compare_where_clauses(
    current_sql: str, cached_sql: str
) -> ComparedResult:
    """Compare the WHERE clauses of two queries — ``current`` is the
    incoming query, ``cached`` the one whose results sit in cache
    (WhereClauseComparator.compare, :24-38: first=current,
    second=cached, matching TestComparator.java:40's argument
    order)."""
    cr = ComparedResult()
    w1 = extract_where_expr(current_sql)
    w2 = extract_where_expr(cached_sql)
    if w1 is None and w2 is None:
        return cr
    if (w1 is None) != (w2 is None):
        cr.totally_the_same = False
        cr.only_date_different = False
        return cr
    cr.totally_the_same = _visit(cr, w1, w2)
    return cr


def rewrite_cached_date_sql(cached_sql: str, cr: ComparedResult) -> str:
    """RewrittenDateSqlBuilder.java:14-27 — rebuild the cached query
    with its date range shifted onto the uncovered tail:

        cached_lower -> cached_upper     (second lower -> second upper)
        cached_upper -> current_upper    (second upper -> first upper)

    so the rewritten query scans exactly [cached_hi, current_hi], the
    increment the cache is missing.  Both replacements apply in ONE
    pass over the string literals (the Java replaces during a single
    AST rebuild, so a swapped value is never re-examined); the
    rewrite is text-level on the quoted literals, preserving the rest
    of the query byte-for-byte instead of re-serializing the AST.
    No-op unless the pair differs only by dates."""
    if not cr.date_range_extendable:
        return cached_sql
    mapping = {}
    if cr.second_value_lower_bound is not None:
        mapping[cr.second_value_lower_bound] = cr.second_value_upper_bound
    if cr.second_value_upper_bound is not None:
        mapping[cr.second_value_upper_bound] = cr.first_value_upper_bound

    def repl(m: re.Match) -> str:
        inner = m.group(1)
        return "'" + mapping.get(inner, inner) + "'"

    return re.sub(r"'([^']*)'", repl, cached_sql)


_JOIN_RE = re.compile(
    r"(?i)\b(?:(?P<global>global)\s+)?"
    r"(?:(?P<type>left|right|inner|full|cross)\s+)?"
    r"(?:(?P<outer>outer)\s+)?join\b"
)


def rewrite_global_joins(sql: str) -> tuple[str, bool]:
    """GlobalJoinAstRewriter.java:11-32 — force every join operator to
    its GLOBAL variant and report whether any join was missing the
    keyword (the signal the reference uses to flag queries that would
    read distributed tables locally on each shard):

        LEFT/RIGHT/INNER [OUTER] JOIN -> GLOBAL <type> JOIN   (flag)
        any other JOIN               -> GLOBAL JOIN           (no flag
        — the Java default case never sets withoutGlobalKeyword)

    ``GLOBAL IN (subquery)`` predicates are untouched (they are not
    join operators — TestRewriter.java:38-45 pins that).  String
    literals are masked so a quoted 'left join' never rewrites.
    Returns (rewritten_sql, without_global_keyword)."""
    missing = False
    parts: list[str] = []
    last = 0
    # split on string literals; rewrite only the code segments
    for m in re.finditer(r"'(?:[^']|'')*'", sql):
        parts.append(("code", sql[last : m.start()]))
        parts.append(("str", m.group(0)))
        last = m.end()
    parts.append(("code", sql[last:]))

    def join_repl(m: re.Match) -> str:
        nonlocal missing
        jtype = (m.group("type") or "").upper()
        had_global = m.group("global") is not None
        if jtype in ("LEFT", "RIGHT", "INNER"):
            if not had_global:
                missing = True
            return f"GLOBAL {jtype} JOIN"
        return "GLOBAL JOIN"

    out = []
    for kind, seg in parts:
        out.append(_JOIN_RE.sub(join_repl, seg) if kind == "code" else seg)
    return "".join(out), missing


def where_diff_udf():
    """Arrow-batched pair comparator for query-log frames: (current,
    cached) -> struct(totally_the_same, only_date_different,
    date_range_extendable, rewritten_sql).  rewritten_sql is the
    cache-extension query when the pair is date-extendable, else
    NULL."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "struct<totally_the_same:boolean, only_date_different:boolean,"
        " date_range_extendable:boolean, rewritten_sql:string>"
    )
    def diff(current: pd.Series, cached: pd.Series) -> pd.DataFrame:
        rows = []
        for cur, cac in zip(current, cached):
            cr = compare_where_clauses(cur or "", cac or "")
            rows.append(
                {
                    "totally_the_same": cr.totally_the_same,
                    "only_date_different": cr.only_date_different,
                    "date_range_extendable": cr.date_range_extendable,
                    "rewritten_sql": (
                        rewrite_cached_date_sql(cac or "", cr)
                        if cr.date_range_extendable
                        else None
                    ),
                }
            )
        return pd.DataFrame(rows)

    return diff


def global_join_rewrite_udf():
    """Arrow-batched GLOBAL-join rewriter: sql -> struct(rewritten,
    without_global_keyword)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "struct<rewritten:string, without_global_keyword:boolean>"
    )
    def rew(queries: pd.Series) -> pd.DataFrame:
        rows = []
        for q in queries:
            s, miss = rewrite_global_joins(q or "")
            rows.append(
                {"rewritten": s, "without_global_keyword": miss}
            )
        return pd.DataFrame(rows)

    return rew
