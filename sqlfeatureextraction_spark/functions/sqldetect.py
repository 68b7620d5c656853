"""SQL metadata detectors: referred tables + Distributed-engine info.

Re-expression of the reference's two AST detectors, the last tested
behaviors of its ClickHouse parser stack without an engine analog:

  * ``referred_tables`` — ch/parser/ReferredTablesDetector.java:17-73:
    every table identifier a query references, across FROM items,
    JOIN operands and nested subqueries (the reference walks the AST
    and collects TableIdentifier.getQualifiedName() in visit order).
    Consumers use it to route queries to clusters and to build
    query→table lineage.
  * ``distributed_cluster_name`` / ``distributed_local_table`` —
    ch/parser/ast/DistributedTableInfoDetector.java:12-97: from a
    ``CREATE TABLE ... Engine = Distributed(cluster, db, local_tbl,
    sharding)`` DDL, the cluster name (first engine arg, quotes
    stripped) and ``db.local_tbl`` (second + third args); any other
    engine yields None, exactly like the Java's null.

Pinned on the reference's own test queries
(test/sql/clickhouse/parser/TestAstParser.java:34-80:
testReferredTablesDetector + testDistributedTableInfoDetector 1-3).

Shares the engine's single ClickHouse tokenizer/expression parser
(functions/apmencode.py).  Divergence (representation only): the
tokenizer lowercases identifiers, so detected table/engine names come
back lowercase (the Java preserves case and compares the engine name
case-sensitively to "Distributed"; ClickHouse itself treats engine
names case-sensitively but emits the canonical spelling in DDL, so
the lowercase compare accepts the same inputs).

Spark posture: pure per-string functions + an Arrow-batched pandas
UDF (``referred_tables_udf``) for query-log lineage frames — parser
work off the hot path, SURVEY §2.10's declared exception.
"""

from __future__ import annotations

import re

import pandas as pd

from .apmencode import _Cursor, _parse_expr, _tokenize

__all__ = [
    "referred_tables",
    "distributed_cluster_name",
    "distributed_local_table",
    "referred_tables_udf",
]

# keywords that can directly precede a table identifier
_TABLE_INTRO = {"from", "join"}
# ids that may appear between FROM/JOIN and the table when the operand
# is not a plain table (subquery, table function)
_NOT_TABLE_START = {"select"}


def referred_tables(sql: str) -> list[str]:
    """All table names a query references, in appearance order, one
    entry per reference (duplicates preserved — the Java list is not
    deduped).  A FROM/JOIN operand that opens a subquery contributes
    nothing itself; the subquery's own FROM/JOIN tokens are found by
    the same scan because it runs over the full token stream at every
    depth (the AST walk's recursion, flattened)."""
    toks = _tokenize(sql)
    out: list[str] = []
    i = 0
    n = len(toks)
    while i < n:
        k, v = toks[i]
        if k == "id" and v in _TABLE_INTRO:
            j = i + 1
            kj, vj = toks[j] if j < n else (None, None)
            if kj == "id" and vj not in _NOT_TABLE_START:
                # dotted qualified name; stop at a '(' — that is a
                # table FUNCTION (e.g. numbers(10)), not a table
                name = [vj]
                j += 1
                while (
                    j + 1 < n
                    and toks[j] == ("op", ".")
                    and toks[j + 1][0] == "id"
                ):
                    name.append(toks[j + 1][1])
                    j += 2
                if not (j < n and toks[j] == ("op", "(")):
                    out.append(".".join(name))
                i = j
                continue
        i += 1
    return out


def _engine_expr(sql: str):
    """Locate ``Engine = <expr>`` in a CREATE TABLE statement and
    parse the engine expression (EngineClause of the reference AST).
    Returns the ("fn", name, args) / ("id", name) node or None."""
    if not re.match(r"\s*create\s+table\b", sql, re.I):
        return None
    toks = _tokenize(sql)
    for i, (k, v) in enumerate(toks):
        if k == "id" and v == "engine":
            j = i + 1
            if j < len(toks) and toks[j] == ("op", "="):
                j += 1
            return _parse_expr(_Cursor(toks[j:]))
    return None


def _unquote(text: str) -> str:
    """eliminateQuotes (DistributedTableInfoDetector.java:91-97) — the
    shared tokenizer already strips quotes from string literals, so
    this only fires for identifier-form args."""
    if text.startswith("'") and text.endswith("'"):
        return text[1:-1]
    return text


def distributed_cluster_name(create_sql: str) -> str | None:
    """Cluster name from a Distributed-engine CREATE TABLE (first
    engine arg), else None (searchCluster, :21-48)."""
    eng = _engine_expr(create_sql)
    if (
        eng is not None
        and eng[0] == "fn"
        and eng[1] == "distributed"
        and eng[2]
    ):
        first = eng[2][0]
        if first[0] in ("lit", "id"):
            return _unquote(first[1])
    return None


def distributed_local_table(create_sql: str) -> str | None:
    """``db.local_table`` from a Distributed-engine CREATE TABLE
    (second + third engine args), else None (searchLocalTableFullName,
    :59-89)."""
    eng = _engine_expr(create_sql)
    if (
        eng is not None
        and eng[0] == "fn"
        and eng[1] == "distributed"
        and eng[2] is not None
        and len(eng[2]) >= 3
    ):
        db, tbl = eng[2][1], eng[2][2]
        if db[0] in ("lit", "id") and tbl[0] in ("lit", "id"):
            return _unquote(db[1]) + "." + _unquote(tbl[1])
    return None


def referred_tables_udf():
    """Arrow-batched lineage extractor: sql -> array<string> of
    referenced tables (appearance order, duplicates preserved)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def tables(queries: pd.Series) -> pd.Series:
        return queries.map(lambda q: referred_tables(q or ""))

    return tables
