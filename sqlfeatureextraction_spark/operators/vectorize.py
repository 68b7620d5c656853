"""Per-turn feature vectorization (the reference's per-query encoder).

Reference analog: ``APMFragmentIntent.getQueryIntent``
(enc/APMFragmentIntent.java:1240-1261) — parse one SQL, scatter
fragment bits into a fixed-width BitSet, serialized as a '0'/'1'
string.  Executed row-at-a-time in Java; re-parsed once per window the
row appears in (enc/APMWindowFragmentIntent.java:312-320 — an O(W·N)
re-compute the Spark plan eliminates: the vector is computed ONCE per
turn here and reused by every downstream window).

Spark-first restatement:
  * day-of-week / hour / lag computed by JVM built-ins
    (``dayofweek``, ``hour``, ``lag().over(window)``) — codegen'd;
  * the scatter into the fixed-width vector is ONE Arrow-vectorized
    pandas UDF whose body is numpy column ops (``np.add.at``,
    ``Series.explode().map``) — no per-row Python loop;
  * the vocabulary rides inside the UDF closure — Spark pickles it once
    per task (equivalent to a broadcast for a dict this small).

Output columns appended: ts_sec:long, lag_sec:long(null first turn),
features:array<float> (layout width; float32 — elements are 0/1 bits
and small counts, exact below 2^24, and the narrower dtype halves the
dominant memory/shuffle traffic), cost:long, vec_hash:long.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlfeatureextraction_spark.config import FeatureConfig
from sqlfeatureextraction_spark.functions.text import tokenize_col
from sqlfeatureextraction_spark.layout import VectorLayout
from sqlfeatureextraction_spark.vocab import Vocabulary

TURN_ORDER = ["ts", "turn_idx"]  # stable secondary sort (north rule)


def _scatter_udf(vocab: Vocabulary, cfg: FeatureConfig):
    layout = vocab.layout(n_grans=len(cfg.granularities_s))
    width = layout.width
    t_off = layout.seg("time").offset
    r_off, r_w = layout.seg("role").offset, layout.seg("role").width
    o_off, o_w = layout.seg("tool").offset, layout.seg("tool").width
    b_off = layout.seg("bow").offset
    l_off = layout.seg("lag").offset
    grans = np.asarray(cfg.granularities_s, dtype=np.int64)
    roles = dict(vocab.roles)
    tools = dict(vocab.tools)
    tokens = dict(vocab.tokens)
    binary = cfg.binary_bow

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def encode(
        dow: pd.Series,
        hour: pd.Series,
        role: pd.Series,
        tool: pd.Series,
        toks: pd.Series,
        lag_sec: pd.Series,
    ) -> pd.Series:
        n = len(dow)
        # float32: every element is a 0/1 bit or a small token count —
        # exact below 2^24 — and the vector columns dominate cache /
        # shuffle / Arrow bytes, so halving the element width halves
        # the pipeline's memory-bus traffic (the scaling bottleneck)
        mat = np.zeros((n, width), dtype=np.float32)
        rows = np.arange(n)

        # time one-hot: 7 dow ‖ 24 hour (enc/APMFragmentIntent.java:752-777)
        mat[rows, t_off + dow.to_numpy(dtype=np.int64)] = 1.0
        mat[rows, t_off + 7 + hour.to_numpy(dtype=np.int64)] = 1.0

        # role / tool one-hot — vectorized dict lookup; OOV leaves bits
        # unset (reference swallows lookup misses,
        # enc/APMFragmentIntent.java:303-305; we count them instead)
        r_idx = role.map(roles).to_numpy(dtype=np.float64, na_value=np.nan)
        r_ok = ~np.isnan(r_idx)
        mat[rows[r_ok], r_off + r_idx[r_ok].astype(np.int64)] = 1.0
        o_idx = (
            tool.fillna("").map(tools).to_numpy(dtype=np.float64, na_value=np.nan)
        )
        o_ok = ~np.isnan(o_idx)
        mat[rows[o_ok], o_off + o_idx[o_ok].astype(np.int64)] = 1.0

        # bag-of-token: explode + map + np.add.at scatter
        ex = toks.explode()
        ex = ex[ex.notna()]
        if len(ex):
            pos = ex.map(tokens)
            keep = pos.notna()
            if keep.any():
                ridx = ex.index.to_numpy()[keep.to_numpy()]
                cidx = pos[keep].to_numpy(dtype=np.int64) + b_off
                np.add.at(mat, (ridx, cidx), 1.0)
                if binary:
                    np.minimum(
                        mat[:, b_off : b_off + len(tokens)],
                        1.0,
                        out=mat[:, b_off : b_off + len(tokens)],
                    )

        # lag buckets: bit i set iff lag >= gran_i; null lag ⇒ all ones
        # (enc/APMFragmentIntent.java:791-802: null ⇒ all bits set)
        lag = lag_sec.to_numpy(dtype=np.float64, na_value=np.nan)
        lag_bits = np.where(
            np.isnan(lag)[:, None], 1.0, (lag[:, None] >= grans[None, :]) * 1.0
        )
        mat[:, l_off : l_off + len(grans)] = lag_bits

        return pd.Series(list(mat))

    return encode, layout


def _scatter_sparse_udf(vocab: Vocabulary, cfg: FeatureConfig):
    """Sparse variant of the per-turn encoder: emits
    struct<idx:array<int>, val:array<float>> (canonical: idx strictly
    ascending) instead of the dense width-length array.

    Why it exists: a turn vector has ~10-30 nonzeros regardless of
    vocabulary size, but the DENSE representation costs
    width×4 bytes/turn through Arrow, cache and every shuffle it
    crosses.  Measured at 10k-token vocabulary (turn width 10 046,
    sf0.1): the dense vectorize+cache stage is 137 s / ~4 GB while the
    narrow window pass (3 s) and the assembly (5 s) are width-robust —
    the dense format IS the bottleneck.  Sparse keeps the pipeline
    identical (same scatter semantics, the assembler densifies per
    selected representative) at ~nonzeros×8 bytes/turn.

    The COO construction is fully vectorized: all (row, col, val)
    triplets built by numpy segment ops, lex-sorted, duplicate (bow
    count) cells summed, then split per row — no (n×width) allocation
    anywhere."""
    layout = vocab.layout(n_grans=len(cfg.granularities_s))
    t_off = layout.seg("time").offset
    r_off = layout.seg("role").offset
    o_off = layout.seg("tool").offset
    b_off = layout.seg("bow").offset
    l_off = layout.seg("lag").offset
    grans = np.asarray(cfg.granularities_s, dtype=np.int64)
    roles = dict(vocab.roles)
    tools = dict(vocab.tools)
    tokens = dict(vocab.tokens)
    binary = cfg.binary_bow

    @F.pandas_udf("struct<idx:array<int>, val:array<float>>")
    def encode_sparse(
        dow: pd.Series,
        hour: pd.Series,
        role: pd.Series,
        tool: pd.Series,
        toks: pd.Series,
        lag_sec: pd.Series,
    ) -> pd.DataFrame:
        n = len(dow)
        rows = np.arange(n, dtype=np.int64)
        rr, cc, vv = [], [], []

        def add(r, c, v=None):
            rr.append(r.astype(np.int64))
            cc.append(c.astype(np.int64))
            vv.append(
                np.ones(len(r), dtype=np.float32) if v is None else v
            )

        add(rows, t_off + dow.to_numpy(dtype=np.int64))
        add(rows, t_off + 7 + hour.to_numpy(dtype=np.int64))
        r_idx = role.map(roles).to_numpy(dtype=np.float64, na_value=np.nan)
        ok = ~np.isnan(r_idx)
        add(rows[ok], r_off + r_idx[ok].astype(np.int64))
        o_idx = (
            tool.fillna("").map(tools).to_numpy(dtype=np.float64, na_value=np.nan)
        )
        ok = ~np.isnan(o_idx)
        add(rows[ok], o_off + o_idx[ok].astype(np.int64))
        ex = toks.explode()
        ex = ex[ex.notna()]
        if len(ex):
            pos = ex.map(tokens)
            keep = pos.notna()
            if keep.any():
                add(
                    ex.index.to_numpy()[keep.to_numpy()],
                    pos[keep].to_numpy(dtype=np.int64) + b_off,
                )
        # lag bits from the SAME elementwise (lag >= gran_i) mask as the
        # dense path (bit i independently, null ⇒ all bits) — correct
        # for any granularity ordering, not just ascending configs
        lag = lag_sec.to_numpy(dtype=np.float64, na_value=np.nan)
        mask = np.isnan(lag)[:, None] | (lag[:, None] >= grans[None, :])
        ri, ci = np.nonzero(mask)
        add(rows[ri], l_off + ci)

        r = np.concatenate(rr)
        c = np.concatenate(cc)
        v = np.concatenate(vv)
        order = np.lexsort((c, r))
        r, c, v = r[order], c[order], v[order]
        # merge duplicate (row, col) cells (bow token counts)
        if len(r):
            new_cell = np.concatenate(
                ([True], (r[1:] != r[:-1]) | (c[1:] != c[:-1]))
            )
            cell_id = np.cumsum(new_cell) - 1
            merged_v = np.zeros(cell_id[-1] + 1, dtype=np.float32)
            np.add.at(merged_v, cell_id, v)
            if binary:
                np.minimum(merged_v, 1.0, out=merged_v)
            r, c = r[new_cell], c[new_cell]
            v = merged_v
        bounds = np.searchsorted(r, np.arange(n + 1))
        c32 = c.astype(np.int32)
        return pd.DataFrame(
            {
                "idx": [c32[bounds[i] : bounds[i + 1]] for i in range(n)],
                "val": [v[bounds[i] : bounds[i + 1]] for i in range(n)],
            }
        )

    return encode_sparse, layout


def with_turn_features(
    transcripts: DataFrame,
    vocab: Vocabulary,
    cfg: FeatureConfig,
    sparse: bool | str = False,
) -> tuple[DataFrame, VectorLayout]:
    """Append per-turn feature vectors.

    The lag window shuffles once on conv_id; everything else is
    per-partition (no further shuffle).  At scale the input should
    already be bucketed/partitioned by conv_id so this is shuffle-free.

    sparse=False → dense array<float> `features` (the reference's
    fixed-width format, right for narrow vocabularies); sparse=True →
    struct<idx,val> sparse rows (width-independent bytes — see
    _scatter_sparse_udf); sparse="auto" → sparse iff the turn width
    exceeds 1024.  Window paths accept either; full window vectors are
    bit-identical (pinned by tests)."""
    if sparse == "auto":
        width = vocab.layout(n_grans=len(cfg.granularities_s)).width
        sparse = width > 1024
    if sparse:
        encode, layout = _scatter_sparse_udf(vocab, cfg)
    else:
        encode, layout = _scatter_udf(vocab, cfg)

    w = Window.partitionBy("conv_id").orderBy(*TURN_ORDER)
    df = (
        transcripts.withColumn(
            # NTZ parquet timestamps need the intermediate cast; session TZ
            # is pinned to UTC so the epoch is well-defined
            "ts_sec",
            F.col("ts").cast("timestamp").cast("long"),
        )
        .withColumn("lag_sec", F.col("ts_sec") - F.lag("ts_sec").over(w))
        .withColumn("_toks", tokenize_col(F.col("text")))
    )
    df = df.withColumn(
        "features",
        encode(
            # ISO day-of-week, Monday=bit 0 — matches the reference's
            # getDayOfWeek().getValue()-1 (enc/APMFragmentIntent.java:752-777)
            F.weekday("ts").cast("int"),
            F.hour("ts").cast("int"),
            F.col("role"),
            F.col("tool"),
            F.col("_toks"),
            F.col("lag_sec"),
        ),
    ).drop("_toks")
    df = df.withColumn(
        "cost", F.coalesce(F.col("duration_ms"), F.lit(1)).cast("long")
    ).withColumn("vec_hash", F.xxhash64("features"))
    return df, layout
