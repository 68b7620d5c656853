"""Interval merge (overlap union) + consecutive near-duplicate pruning.

merge_intervals — reference `QueryTemplateConverter` interval union
(tools/QueryTemplateConverter.java:568-582, a driver-side loop):
classic gaps-and-islands with window functions — running max of
interval ends per key; a new island starts when the current start
exceeds every previous end.  One shuffle on the key, fully codegen'd.

prune_consecutive_neardups — reference D4
(enc/IntentCreatorMultiThread.java:258-271,396-415): drop a turn whose
token-set cosine similarity with the PREVIOUS turn exceeds a threshold
(theirs: simmetrics string cosine, row-at-a-time Java; ours: set cosine
|A∩B|/√(|A|·|B|) over lag()'d token arrays — array_intersect +
size, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sqlfeatureextraction_spark.functions.text import tokenize_col


def merge_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_s",
    end_col: str = "end_s",
) -> DataFrame:
    """Union overlapping/touching [start, end] intervals per key.
    Output: (key, island_start, island_end, n_merged)."""
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    run = w.rowsBetween(Window.unboundedPreceding, -1)
    prev_max_end = F.max(end_col).over(run)
    new_island = (
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end)
    ).cast("int")
    island = F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("_island", island)
        .groupBy(key_col, "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count("*").alias("n_merged"),
        )
        .drop("_island")
    )


def prune_consecutive_neardups(
    df: DataFrame,
    threshold: float = 0.8,
    entity_col: str = "conv_id",
    text_col: str = "text",
    ts_col: str = "ts",
    order_cols: tuple = ("turn_idx",),
) -> DataFrame:
    """Drop rows whose distinct-token-set cosine vs the previous row in
    the same entity exceeds `threshold`.  Adds prev_cos for inspection
    on the survivors."""
    toks = F.array_distinct(tokenize_col(F.col(text_col)))
    w = Window.partitionBy(entity_col).orderBy(ts_col, *order_cols)
    prev = F.lag(toks).over(w)
    inter = F.size(F.array_intersect(toks, prev))
    denom = F.sqrt(F.size(toks) * F.size(prev))
    cos = (
        F.when(prev.isNull(), F.lit(None))
        .when(denom > 0, inter / denom)
        .otherwise(F.lit(0.0))
    )
    out = df.withColumn("prev_cos", F.round(cos, 6))
    return out.where(
        F.col("prev_cos").isNull() | (F.col("prev_cos") <= threshold)
    )
