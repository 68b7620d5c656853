"""W9: session re-organization (lead-chaining) + A4 OR-combine.

reorganize_sessions — reference ``reorganizeSqlList``
(enc/APMWindowFragmentIntent.java:590-688, exercised by
test/APMWindowFragmentIntentTest.java:17-19): for each output row i,
synthesize a "session": row i, then repeatedly the first row whose ts
exceeds the running window end, advancing the end by W seconds each
hop.  One input row → many output rows (UDTF shape) — applyInPandas
per conversation; the hop map is ONE vectorized ``np.searchsorted``
and chains materialize level-synchronously (≤ max_hops numpy rounds,
zero per-row Python).  Time-range salting à la asof_merge._salted is
deliberately NOT applied: a forward chain's next hop is the first row
past the running end, which under large gaps can live arbitrarily far
in the future, so no bounded overlap replication is correct; a hot
conversation instead costs O(n·max_hops) vectorized work in one task
(measured ≈ hundreds of ms per million rows).

or_combine_window_features — reference "merge" combine mode
(enc/MinWindowQueryIntent.java:124-153 ``updateMinBitSet``; the
declared-but-unimplemented branch at APMWindowFragmentIntent.java:
449-451): the window vector is the bitwise OR of all member turn
vectors instead of the concat-and-pad layout.  Relational member
pairing is shared with pit_window; the OR itself is one numpy
``maximum.reduce`` per anchor inside an Arrow UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlfeatureextraction_spark.config import FeatureConfig
from sqlfeatureextraction_spark.operators.pit_window import pit_member_pairs


def reorganize_sessions(
    anchors: DataFrame,
    window_s: int,
    max_hops: int = 32,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per entity: for every anchor row, emit the lead-chain
    (chain_start_sec, seq, ts) rows."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # The hop target nxt[i] = first row with ts > ts[i] + W is
        # independent of which chain reaches row i, so chains are
        # materialized LEVEL-synchronously: one searchsorted for the
        # whole group, then <= max_hops vectorized pointer-follow
        # rounds (nxt is strictly advancing, so every chain terminates)
        # — no per-row Python, a hot conversation costs O(n·hops)
        # numpy ops, not interpreter iterations.
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        ts = pdf[ts_col].astype("datetime64[s]").astype("int64").to_numpy()
        conv = pdf[entity_col].iloc[0]
        n = len(ts)
        nxt = np.searchsorted(ts, ts + window_s, side="right")
        orig = np.arange(n)
        cur = np.arange(n)
        res_start = [ts.copy()]
        res_seq = [np.zeros(n, dtype=np.int32)]
        res_row = [cur]
        for seq in range(1, max_hops):
            cand = nxt[cur]
            keep = cand < n
            orig, cur = orig[keep], cand[keep]
            if len(cur) == 0:
                break
            res_start.append(ts[orig])
            res_seq.append(np.full(len(cur), seq, dtype=np.int32))
            res_row.append(cur)
        rows = np.concatenate(res_row)
        return pd.DataFrame(
            {
                entity_col: conv,
                "chain_start_sec": np.concatenate(res_start),
                "seq": np.concatenate(res_seq),
                ts_col: pdf[ts_col].to_numpy()[rows],
            }
        )

    schema = (
        f"{entity_col} string, chain_start_sec long, seq int, "
        f"{ts_col} timestamp"
    )
    return anchors.select(entity_col, ts_col).groupBy(entity_col).applyInPandas(
        fn, schema
    )


def or_combine_window_features(
    vec: DataFrame, cfg: FeatureConfig, width: int | None = None
) -> DataFrame:
    """(conv_id, ts) → element-wise OR (max) of all member turn vectors
    in the trailing (ts−W, ts] window.

    OR is idempotent, so only DISTINCT member vectors matter per
    anchor: memberships are deduped by (conv_id, ts, vec_hash) while
    still NARROW (8-byte hash, never the ~KB array), and the wide
    vectors join back once per distinct (conv_id, vec_hash) — the same
    narrow-structs-then-one-wide-join-back shape as the flagship W8
    path, instead of shipping the full array once per (anchor, member)
    pair (mean-window-size amplification).

    Accepts either turn-vector transport format (matching
    vectorize.with_turn_features): dense ``array<float>`` rows, or
    sparse ``struct<idx,val>`` rows — sparse input additionally
    requires ``width`` (the turn layout width) so the OR result can be
    densified; the output is always the dense array."""
    is_sparse = isinstance(vec.schema["features"].dataType, T.StructType)
    if is_sparse and width is None:
        raise ValueError(
            "sparse turn vectors require width=layout.width so the OR "
            "result can be densified"
        )
    hashed = vec.select(
        "conv_id",
        F.col("turn_idx").alias("m_turn_idx"),
        F.xxhash64("features").alias("vh"),
    )
    pairs = pit_member_pairs(vec, cfg).join(
        hashed, ["conv_id", "m_turn_idx"]
    )
    distinct_members = pairs.select("conv_id", "ts", "vh").distinct()
    reps = vec.select(
        "conv_id", F.xxhash64("features").alias("vh"), "features"
    ).dropDuplicates(["conv_id", "vh"])
    wide = distinct_members.join(reps, ["conv_id", "vh"])

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def or_reduce(vlists: pd.Series) -> pd.Series:
        out = []
        for vl in vlists.to_numpy():
            if len(vl) == 0:
                out.append(np.zeros(0, dtype=np.float32))
            elif isinstance(vl[0], dict):
                # sparse struct<idx,val> members: densify + scatter-max
                # (mirrors pit_window._assemble_udf's dict branch)
                acc = np.zeros(width, dtype=np.float32)
                for f in vl:
                    np.maximum.at(
                        acc,
                        np.asarray(f["idx"], dtype=np.int64),
                        np.asarray(f["val"], dtype=np.float32),
                    )
                out.append(acc)
            else:
                out.append(np.maximum.reduce(np.vstack(vl)))
        return pd.Series(out)

    grouped = wide.groupBy("conv_id", "ts").agg(
        F.collect_list("features").alias("vecs")
    )
    return grouped.select(
        "conv_id", "ts", or_reduce(F.col("vecs")).alias("window_features_or")
    )
