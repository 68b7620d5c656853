"""Sort-merge point-in-time window features with explicit skew handling
— the throughput-critical path (north rule).

Same semantics as pit_window.window_features_builtin (trailing
right-closed ``(ts−W, ts]`` window per distinct (conv_id, ts); dedupe
intent-equal members summing cost; top-K entities; top-N members;
fixed-width assembly — reference enc/APMWindowFragmentIntent.java:
266-493), but executed as ONE shuffle + ONE sorted pandas pass:

  1. hot-key detection: a cheap ``groupBy(conv_id).count()`` finds
     conversations holding more than ``hot_key_threshold`` of all rows
     (the reference pins a hot session to one thread,
     enc/APMFragmentIntent.java:1069-1097 — it cannot split it; we can);
  2. salting by time range: hot conversations are split into buckets of
     ``span = max(8·W, hot_span/salt_buckets)`` seconds; rows in the
     trailing ``W−1`` seconds of a bucket are REPLICATED into the next
     bucket as context-only (is_anchor=false) so every anchor still
     sees its full trailing window — overlap replication, the classic
     point-in-time-join trick (SURVEY §7.3);
  3. ``groupBy(conv_id, salt).applyInPandas``: inside, a two-pointer
     ``np.searchsorted`` builds (anchor, member) pairs and dedupe /
     top-K / top-N / assembly are pandas groupby + 2-D fancy-index
     scatter — numpy column ops only, no per-row Python.

Compared to the built-in path this avoids materializing a
``collect_list`` of feature arrays per anchor and the three downstream
shuffles on (conv_id, ts) — it shuffles each input row at most twice
(once if not replicated).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlfeatureextraction_spark.config import FeatureConfig
from sqlfeatureextraction_spark.layout import VectorLayout, window_vector_width
from sqlfeatureextraction_spark.vocab import Vocabulary


def _salted(vec: DataFrame, cfg: FeatureConfig) -> DataFrame:
    """Adaptive time-range salting with overlap replication.

    A fixed global span is wrong at both ends: tied to the window width
    it shatters sparse long-lived conversations into millions of tiny
    groups (measured 34× slower than the built-in path at sf0.1); tied
    to the data span it leaves hot conversations unsplit.  Instead a
    cheap per-conversation stats pass (count, min/max ts — one
    map-side-combined shuffle on conv_id, NOT a driver-side census)
    sizes the span per conversation:

      buckets = ceil(n_rows / cfg.merge_rows_per_bucket)
      span    = max(ceil(lifetime / buckets), 8·W)   if buckets > 1
      span    = lifetime + W + 2                     if buckets == 1

    so a normal conversation is exactly ONE group with ZERO replication
    and a hot conversation splits into ~n/64k tasks with ≤ (W−1)/8W ≈
    12% replicated context rows.  The stats join and the groupBy that
    follows share the conv_id partitioning.  Replicated rows carry
    is_anchor=false and emit nothing themselves (the reference's
    single-thread-per-session split, enc/APMFragmentIntent.java:
    1069-1097, can never split a hot session; this can).
    """
    w = cfg.window_size_s
    stats = vec.groupBy("conv_id").agg(
        F.count("*").alias("_n"),
        F.min("ts_sec").alias("_t0"),
        F.max("ts_sec").alias("_t1"),
    )
    nb = F.ceil(F.col("_n") / cfg.merge_rows_per_bucket)
    life = F.col("_t1") - F.col("_t0")
    span = F.when(nb <= 1, life + w + 2).otherwise(
        F.greatest(F.ceil(life / nb), F.lit(8 * w))
    )
    stats = stats.select(
        "conv_id", F.col("_t0"), span.cast("long").alias("_span")
    )

    vec = vec.join(stats, "conv_id")
    rel = F.col("ts_sec") - F.col("_t0")
    bucket = F.floor(rel / F.col("_span")).cast("long")
    base = vec.withColumn("salt", bucket).withColumn("is_anchor", F.lit(True))
    repl = (
        vec.where(rel % F.col("_span") >= F.col("_span") - (w - 1))
        .withColumn("salt", (bucket + 1).cast("long"))
        .withColumn("is_anchor", F.lit(False))
    )
    return base.unionByName(repl).drop("_t0", "_span")


def _window_merge_fn(cfg: FeatureConfig, audit: bool = False):
    """Member-selection core of the merge path.

    Returns SLIM selected-member rows — (anchor conv_id, ts_sec, ts,
    slot_idx, member_idx, tool, rep_turn_idx) — NOT assembled vectors:
    shipping the wide feature arrays through the pandas stage (input
    AND output) measured 30× slower than the narrow formulation at
    local[2] (object-dtype vstack of millions of tiny ndarrays + Arrow
    list-array materialization).  The ≤ k·n selected representatives
    join their feature vectors back JVM-side and reuse the builtin
    path's Arrow assembler, so the wide arrays cross the wire exactly
    once, identically to pit_window."""
    k, n = cfg.top_k_entities, cfg.top_n_members
    win = cfg.window_size_s

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # A group is a HASH BUCKET of conversations (× time salt), not a
        # single conversation: per-call pandas overhead (~5-10 ms) made
        # one-conv-per-group 10× slower than the builtin path on many
        # small conversations.  All conversations in the bucket are
        # processed in ONE vectorized pass over a composite timeline:
        # ts′ = ts + conv_ordinal · OFFSET with OFFSET > span + 2W, so a
        # single searchsorted serves every conversation and windows can
        # never cross conversation boundaries.
        pdf = pdf.sort_values(
            ["conv_id", "ts_sec", "turn_idx"], kind="mergesort"
        ).reset_index(drop=True)
        ts = pdf["ts_sec"].to_numpy(np.int64)
        anchor_mask = pdf["is_anchor"].to_numpy(bool)
        empty = {
            "conv_id": pd.Series(dtype=object),
            "ts_sec": pd.Series(dtype=np.int64),
            "ts": pd.Series(dtype="datetime64[us]"),
            "slot_idx": pd.Series(dtype=np.int32),
            "member_idx": pd.Series(dtype=np.int32),
            "tool": pd.Series(dtype=object),
            "rep_turn_idx": pd.Series(dtype=np.int64),
        }
        if audit:
            empty["max_member_ts_sec"] = pd.Series(dtype=np.int64)
        if len(ts) == 0 or not anchor_mask.any():
            return pd.DataFrame(empty)
        conv_arr = pdf["conv_id"].to_numpy()
        # ordinal per conversation (input is conv-sorted)
        new_conv = np.empty(len(ts), dtype=bool)
        new_conv[0] = True
        new_conv[1:] = conv_arr[1:] != conv_arr[:-1]
        ordinal = np.cumsum(new_conv) - 1
        off = np.int64(int(ts.max()) - int(ts.min()) + 2 * win + 10)
        tsx = ts + ordinal * off
        anchor_tsx = np.unique(tsx[anchor_mask])
        lo = np.searchsorted(tsx, anchor_tsx - win, side="right")
        hi = np.searchsorted(tsx, anchor_tsx, side="right")
        counts = hi - lo
        total = int(counts.sum())
        # vectorized ragged ranges: member row index per (anchor, member)
        ridx = np.repeat(np.arange(len(anchor_tsx)), counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        midx = np.repeat(lo, counts) + offs

        pairs = pd.DataFrame(
            {
                "a": ridx,
                "tool": pdf["tool"].fillna("").to_numpy()[midx],
                "h": pdf["vec_hash"].to_numpy(np.int64)[midx],
                "cost": pdf["cost"].to_numpy(np.int64)[midx],
                "mts": ts[midx],
                "mturn": pdf["turn_idx"].to_numpy(np.int64)[midx],
            }
        )
        # A2 dedupe: first (ts, turn) representative + summed cost per
        # (anchor, tool, vec_hash) — input is ts/turn-sorted already
        grp = pairs.groupby(["a", "tool", "h"], sort=False)
        dd = grp.agg(
            cost=("cost", "sum"),
            mts=("mts", "first"),
            mturn=("mturn", "first"),
        ).reset_index()

        # W6 top-K tools by summed cost (cost desc, tool asc)
        tc = dd.groupby(["a", "tool"], sort=False)["cost"].sum().reset_index()
        tc = tc.sort_values(["a", "cost", "tool"], ascending=[True, False, True], kind="mergesort")
        tc["slot"] = tc.groupby("a", sort=False).cumcount()
        tc = tc[tc["slot"] < k]

        # W7 top-N members per selected tool (cost desc, ts, turn asc)
        mm = dd.merge(tc[["a", "tool", "slot"]], on=["a", "tool"])
        mm = mm.sort_values(
            ["a", "slot", "cost", "mts", "mturn"],
            ascending=[True, True, False, True, True],
            kind="mergesort",
        )
        mm["mi"] = mm.groupby(["a", "slot"], sort=False).cumcount()
        mm = mm[mm["mi"] < n]

        # anchor representative = first (min turn_idx) row at each
        # anchor epoch — same convention as the builtin path/oracle
        first_at = np.searchsorted(tsx, anchor_tsx, side="left")
        a = mm["a"].to_numpy()
        res = {
            "conv_id": conv_arr[first_at[a]],
            "ts_sec": ts[first_at[a]],
            "ts": pdf["ts"].to_numpy()[first_at[a]],
            "slot_idx": mm["slot"].to_numpy().astype(np.int32),
            "member_idx": mm["mi"].to_numpy().astype(np.int32),
            "tool": mm["tool"].to_numpy(),
            "rep_turn_idx": mm["mturn"].to_numpy(np.int64),
        }
        if audit:
            # provenance: newest member actually in the window per
            # anchor — audit_member_bound asserts ≤ the anchor ts
            res["max_member_ts_sec"] = ts[hi - 1][a]
        return pd.DataFrame(res)

    return fn


def window_features_merge(
    vec: DataFrame,
    vocab: Vocabulary,
    cfg: FeatureConfig,
    layout: VectorLayout,
    audit: bool = False,
    scalars_only: bool = False,
) -> DataFrame:
    """(conv_id, ts) → window_features via salted applyInPandas merge.

    Stage plan (all NARROW until the final join):
      1. per-conv stats + adaptive time salting (`_salted`) — feature
         arrays are NOT selected into this branch;
      2. ONE narrow shuffle into coarse conversation buckets
         ((hash(conv_id) % 4·cores, salt)) → vectorized pandas member
         selection (searchsorted over the composite timeline, dedupe,
         top-K/top-N) emitting ≤ k·n slim rows per anchor;
      3. the selected representatives join their feature vectors back
         by (conv_id, turn_idx) — the wide array crosses the wire
         exactly once — and the builtin path's Arrow assembler builds
         the fixed-width output.

    audit=True appends max_member_ts_sec provenance for
    audit.audit_member_bound."""
    from sqlfeatureextraction_spark.operators.pit_window import (
        SCALAR_FIELDS,
        _assemble_udf,
    )

    cols = ["conv_id", "ts", "ts_sec", "turn_idx", "tool", "cost", "vec_hash"]
    salted = _salted(vec.select(*cols), cfg)
    # coarse conversation buckets: many conversations per pandas call
    # (per-call overhead amortized ~300×), vectorized inside over the
    # composite timeline; the time salt still splits hot conversations
    n_grp = max(vec.sparkSession.sparkContext.defaultParallelism * 4, 8)
    salted = salted.withColumn(
        "_grp", F.pmod(F.xxhash64("conv_id"), F.lit(n_grp))
    )
    fn = _window_merge_fn(cfg, audit=audit)
    member_schema = (
        "conv_id string, ts_sec long, ts timestamp, slot_idx int,"
        " member_idx int, tool string, rep_turn_idx long"
    )
    if audit:
        member_schema += ", max_member_ts_sec long"
    members = salted.groupBy("_grp", "salt").applyInPandas(fn, member_schema)

    feats = vec.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("rep_turn_idx"),
        F.col("features").alias("g_features"),
    )
    joined = members.join(feats, ["conv_id", "rep_turn_idx"])

    assemble, out_w = _assemble_udf(vocab, cfg, layout, scalars_only)
    aggs = [
        F.collect_list(
            F.struct(
                F.col("slot_idx"),
                F.col("member_idx"),
                F.col("tool"),
                F.col("g_features").alias("features"),
            )
        ).alias("slots")
    ]
    if audit:
        aggs.append(F.max("max_member_ts_sec").alias("max_member_ts_sec"))
    slots = joined.groupBy("conv_id", "ts_sec", "ts").agg(*aggs)
    if scalars_only:
        out_cols = [
            "conv_id",
            "ts_sec",
            "ts",
            assemble(F.col("slots")).alias("s"),
        ]
        if audit:
            out_cols.append("max_member_ts_sec")
        keep = ["conv_id", "ts_sec", "ts"] + [
            f"s.{f}" for f in SCALAR_FIELDS
        ]
        if audit:
            keep.append("max_member_ts_sec")
        return slots.select(*out_cols).select(*keep)
    out_cols = [
        "conv_id",
        "ts_sec",
        "ts",
        assemble(F.col("slots")).alias("window_features"),
    ]
    if audit:
        out_cols.append("max_member_ts_sec")
    return slots.select(*out_cols)
