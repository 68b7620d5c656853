"""Reference-parity per-row text transforms (SURVEY §2.2 P1-P4).

All pure column expressions — pushed into the scan stage, codegen'd.

P1 clean_sql_text    rdr/StringCleaner.java:11-23 (strip backticks/#/
                     escapes/newlines; `_cluster` suffix → '')
P2 filter_ddl_dml    rdr/ExcelReader.java:123-132 `filterSql`
P3 statement_gate    enc/IntentCreatorMultiThread.java:54-56,150-152
P4 extract_table     tools/IOUtil.java:117-136 `extractTable`
D5 recurring prune   enc/IntentCreatorMultiThread.java:206-247
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas-UDF type hints must resolve
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ = pd  # re-exported into module globals for stringified hints


def clean_sql_text(col: Column) -> Column:
    """P1: strip quoting/comment/escape characters and newlines, drop
    ClickHouse `_cluster` suffixes, collapse whitespace."""
    c = F.regexp_replace(col, r"[`;\\]", "")
    c = F.regexp_replace(c, r"[\r\n\t]+", " ")
    c = F.regexp_replace(c, r"_cluster\b", "")
    return F.trim(F.regexp_replace(c, r"\s{2,}", " "))


def filter_ddl_dml(df: DataFrame, sql_col: str = "text") -> DataFrame:
    """P2: drop CREATE/DROP/ALTER/materialized-view statements, keep
    query-shaped rows."""
    bad = r"^\s*(create|drop|alter|truncate)\b|materialized\s+view"
    return df.where(~F.lower(F.col(sql_col)).rlike(bad))


def statement_gate(df: DataFrame, sql_col: str = "text") -> DataFrame:
    """P3: accept select/insert/update/delete prefixes only."""
    return df.where(
        F.lower(F.col(sql_col)).rlike(r"^\s*(select|insert|update|delete)\b")
    )


def extract_table(col: Column) -> Column:
    """P4: from a log `tables` field like "['db.events_cluster']" take
    the first entry, strip brackets/quotes and `_cluster`, return the
    bare table name after the dot."""
    first = F.split(F.regexp_replace(col, r"[\[\]'\" ]", ""), ",")[0]
    tbl = F.element_at(F.split(first, r"\."), -1)
    return F.regexp_replace(tbl, r"_cluster$", "")


def prune_recurring(
    df: DataFrame, patterns: list[str], sql_col: str = "text"
) -> DataFrame:
    """D5: drop rows matching hand-listed recurring patterns."""
    cond = None
    for p in patterns:
        c = F.col(sql_col).rlike(p)
        cond = c if cond is None else (cond | c)
    return df.where(~cond) if cond is not None else df


def longest_common_substrings(s: str, t: str) -> set:
    """F7: ALL longest common substrings of two strings — exact DP
    semantics of enc/MINCFragmentIntent.java:667-690
    ``longestCommonSubstrings`` (a tie returns every maximal substring;
    two empty inputs return the empty set).  Unused on the reference's
    main encode path (SURVEY §2.8) — provided for template-similarity
    work; O(|s|·|t|) per pair, so at scale apply it only AFTER a
    candidate-pair generation stage (MinHash/SimHash bucketing in
    operators/dedup.py), never all-pairs."""
    longest = 0
    result: set = set()
    prev = [0] * len(t)
    for i in range(len(s)):
        cur = [0] * len(t)
        si = s[i]
        for j in range(len(t)):
            if si != t[j]:
                continue
            v = 1 if (i == 0 or j == 0) else 1 + prev[j - 1]
            cur[j] = v
            if v > longest:
                longest = v
                result.clear()
            if v == longest:
                result.add(s[i - longest + 1 : i + 1])
        prev = cur
    return result


def lcs_pairs_udf():
    """Arrow-batched (Series, Series) -> Series UDF producing the
    sorted longest-common-substring array per candidate pair."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def lcs(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                sorted(longest_common_substrings(x, y))
                if x is not None and y is not None
                else None
                for x, y in zip(a, b)
            ]
        )

    return lcs
