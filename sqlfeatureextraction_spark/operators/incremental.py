"""Incremental feature recomputation over snapshot appends.

At 10^12-turn scale a full feature recompute per ingest batch is
infeasible; the standard feature-store move is to recompute only the
entities the new batch TOUCHES and carry everything else forward.
That is exact (not approximate) for this engine because every feature
at (conv_id, ts) is a function of rows of the SAME conv_id with
ts' ≤ ts — the per-entity point-in-time contract (SURVEY §2.5, the
zero-leakage invariant) — so an entity with no new rows has bit-equal
features in the old and new table versions.

    incremental_update(all, new, old_features, feature_fn)
        touched  = distinct entity keys of `new`
        carried  = old_features ⟕̸ touched        (left_anti, narrow)
        redone   = feature_fn(all ⋉ touched)     (left_semi prunes the
                                                  scan to touched keys)
        result   = carried ∪ redone  ==  feature_fn(all)   [exact]

Shuffle budget: `touched` is delta-sized (distinct keys of the new
batch); both the anti- and semi-joins are AQE-broadcastable when the
delta is small, so the dominant cost is feature_fn over ONLY the
touched entities' history.  With the input bucketed/partitioned by the
entity key, the semi join prunes at the scan.

The snapshot-table composition (incremental_snapshot_update) feeds
`new` from an Iceberg-style incremental append scan
(sources/snaptable.py) — the resume story: a job checkpointed at
snapshot A updates to snapshot B touching only B−A's entities.

Reference analog: the reference re-reads the growing log from a line
offset and recomputes everything after it single-process
(enc/APMFragmentIntent.java:856-864); this is the distributed,
entity-pruned generalization.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def incremental_update(
    turns_all: DataFrame,
    turns_new: DataFrame,
    old_features: DataFrame,
    feature_fn: Callable[[DataFrame], DataFrame],
    key: str = "conv_id",
) -> DataFrame:
    """Exact refresh of a per-entity point-in-time feature table after
    appending `turns_new`: recompute feature_fn only over entities with
    new rows; carry the rest from `old_features` unchanged.

    `feature_fn` must be per-entity point-in-time (each output row a
    function of same-key input rows only) — true of every window/
    sessionize/vectorize operator in this engine.  Equality with a full
    recompute is pinned in tests/test_incremental.py for both the
    pit-window and the flagship vectorize+window paths."""
    touched = turns_new.select(key).distinct()
    carried = old_features.join(touched, key, "left_anti")
    redone = feature_fn(turns_all.join(touched, key, "left_semi"))
    return carried.unionByName(redone)


def incremental_snapshot_update(
    spark: SparkSession,
    table_root: str,
    from_snapshot_id: int,
    old_features: DataFrame,
    feature_fn: Callable[[DataFrame], DataFrame],
    key: str = "conv_id",
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """incremental_update fed from a snapshot table: `new` is the
    incremental append scan (from_snapshot_id, to_snapshot_id] and
    `all` the table as of to_snapshot_id (current if None)."""
    from ..sources import snaptable

    turns_all = snaptable.read(spark, table_root, to_snapshot_id)
    turns_new = snaptable.incremental_read(
        spark, table_root, from_snapshot_id, to_snapshot_id
    )
    return incremental_update(
        turns_all, turns_new, old_features, feature_fn, key=key
    )
