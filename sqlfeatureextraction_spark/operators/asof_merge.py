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


def _window_merge_fn(
    vocab: Vocabulary,
    cfg: FeatureConfig,
    layout: VectorLayout,
    audit: bool = False,
):
    turn_w = layout.width
    tool_bits = dict(vocab.tools)
    n_tools = layout.seg("tool").width
    k, n = cfg.top_k_entities, cfg.top_n_members
    out_w = window_vector_width(layout, k, n)
    win = cfg.window_size_s

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_sec", "turn_idx"], kind="mergesort").reset_index(
            drop=True
        )
        ts = pdf["ts_sec"].to_numpy(np.int64)
        anchor_ts = np.unique(ts[pdf["is_anchor"].to_numpy(bool)])
        if len(anchor_ts) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype=object),
                    "ts_sec": pd.Series(dtype=np.int64),
                    "ts": pd.Series(dtype="datetime64[us]"),
                    "window_features": pd.Series(dtype=object),
                }
            )
        lo = np.searchsorted(ts, anchor_ts - win, side="right")
        hi = np.searchsorted(ts, anchor_ts, side="right")
        counts = hi - lo
        total = int(counts.sum())
        # vectorized ragged ranges: member row index per (anchor, member)
        ridx = np.repeat(np.arange(len(anchor_ts)), counts)
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
                "row": midx,
            }
        )
        # A2 dedupe: first (ts, turn) representative + summed cost per
        # (anchor, tool, vec_hash) — input is ts/turn-sorted already
        grp = pairs.groupby(["a", "tool", "h"], sort=False)
        dd = grp.agg(
            cost=("cost", "sum"),
            row=("row", "first"),
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

        # W8 assembly: 2-D fancy-index scatter of member turn vectors
        out = np.zeros((len(anchor_ts), out_w), dtype=np.float64)
        bit = mm["tool"].map(tool_bits)
        ok = bit.notna().to_numpy()
        out[mm["a"].to_numpy()[ok], bit.to_numpy(np.float64, na_value=-1).astype(np.int64)[ok]] = 1.0
        feats = np.vstack(pdf["features"].to_numpy())
        starts = n_tools + (mm["slot"].to_numpy() * n + mm["mi"].to_numpy()) * turn_w
        pos = starts[:, None] + np.arange(turn_w)[None, :]
        out[mm["a"].to_numpy()[:, None], pos] = feats[mm["row"].to_numpy()]

        # anchor representative = first (min turn_idx) row at each
        # anchor epoch — same convention as the builtin path/oracle
        first_at = np.searchsorted(ts, anchor_ts, side="left")
        res = {
            "conv_id": pdf["conv_id"].iloc[0],
            "ts_sec": anchor_ts,
            "ts": pdf["ts"].to_numpy()[first_at],
            "window_features": list(out),
        }
        if audit:
            # provenance: newest member actually used per anchor —
            # audit_member_bound asserts it never exceeds the anchor ts
            res["max_member_ts_sec"] = ts[hi - 1]
        return pd.DataFrame(res)

    return fn


def window_features_merge(
    vec: DataFrame,
    vocab: Vocabulary,
    cfg: FeatureConfig,
    layout: VectorLayout,
    audit: bool = False,
) -> DataFrame:
    """(conv_id, ts) → window_features via salted applyInPandas merge.

    audit=True appends max_member_ts_sec provenance for
    audit.audit_member_bound."""
    cols = [
        "conv_id",
        "ts",
        "ts_sec",
        "turn_idx",
        "tool",
        "cost",
        "vec_hash",
        "features",
    ]
    salted = _salted(vec.select(*cols), cfg)
    fn = _window_merge_fn(vocab, cfg, layout, audit=audit)
    out_schema = (
        "conv_id string, ts_sec long, ts timestamp,"
        " window_features array<double>"
    )
    if audit:
        out_schema += ", max_member_ts_sec long"
    return salted.groupBy("conv_id", "salt").applyInPandas(fn, out_schema)
