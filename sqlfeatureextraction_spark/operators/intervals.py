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


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_sec",
    start_col: str = "island_start",
    end_col: str = "island_end",
    bucket_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Containment join: attach to each event the same-key interval
    with ``start <= ts <= end``.  Disjoint intervals (merge_intervals
    output) ⇒ at most one match per event.

    Spark's own plan for a range predicate like this is a
    BroadcastNestedLoopJoin — O(|events|·|intervals|) and a
    broadcast of a whole side, hopeless at corpus scale.  Instead:
    replicate each interval into the fixed-width time buckets it
    overlaps (``sequence`` + ``explode``; replication factor =
    ceil(len/bucket) + 1, bounded for bounded intervals), bucket each
    event once, and equi-join on (key, bucket) + containment filter.
    An event meets an interval copy only in the event's OWN bucket, so
    the pair appears at most once — no post-join dedupe.  ONE shuffle
    per side on (key, bucket); pick ``bucket_s`` near the typical
    interval length to balance replication vs candidates-per-bucket.

    ``how='left'`` keeps unmatched events with NULL interval columns.
    Both modes are ONE join: because an event sits in exactly one
    bucket, putting the containment predicate in the join condition
    (equi keys + non-equi residual — SortMergeJoin supports the
    residual natively) gives left-outer semantics directly, with no
    inner+anti-join union that would recompute the join subtree and
    double-emit matched events carrying NULLs in payload columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    reserved = {"_k", "_b", start_col, end_col}
    clash = reserved.intersection(events.columns)
    if clash:
        raise ValueError(
            f"events must not contain columns {sorted(clash)} "
            "(interval-side / internal names)"
        )
    iv = intervals.select(
        F.col(key_col).alias("_k"),
        start_col,
        end_col,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_s),
                F.floor(F.col(end_col) / bucket_s),
            )
        ).alias("_b"),
    )
    ev = events.withColumn("_b", F.floor(F.col(ts_col) / bucket_s))
    cond = (
        (F.col(key_col) == F.col("_k"))
        & (ev["_b"] == iv["_b"])
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    return ev.join(iv, cond, how).drop("_k", "_b")


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
