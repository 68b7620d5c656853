"""W9: session re-organization (lead-chaining) + A4 OR-combine.

reorganize_sessions — reference ``reorganizeSqlList``
(enc/APMWindowFragmentIntent.java:590-688, exercised by
test/APMWindowFragmentIntentTest.java:17-19): for each output row i,
synthesize a "session": row i, then repeatedly the first row whose ts
exceeds the running window end, advancing the end by W seconds each
hop.  One input row → many output rows (UDTF shape) — applyInPandas
per conversation, two-pointer ``np.searchsorted`` per hop (O(log n)
per hop, not a rescan).

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
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        ts = pdf[ts_col].astype("datetime64[s]").astype("int64").to_numpy()
        conv = pdf[entity_col].iloc[0]
        starts, seqs, out_ts = [], [], []
        n = len(ts)
        for i in range(n):
            end = ts[i] + window_s
            starts.append(ts[i])
            seqs.append(0)
            out_ts.append(pdf[ts_col].iloc[i])
            seq = 1
            j = i
            while seq < max_hops:
                # first row strictly past the running window end
                j = int(np.searchsorted(ts, end, side="right"))
                if j >= n:
                    break
                starts.append(ts[i])
                seqs.append(seq)
                out_ts.append(pdf[ts_col].iloc[j])
                end = ts[j] + window_s
                seq += 1
        return pd.DataFrame(
            {
                entity_col: conv,
                "chain_start_sec": np.asarray(starts, dtype=np.int64),
                "seq": np.asarray(seqs, dtype=np.int32),
                ts_col: out_ts,
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
    vec: DataFrame, cfg: FeatureConfig
) -> DataFrame:
    """(conv_id, ts) → element-wise OR (max) of all member turn vectors
    in the trailing (ts−W, ts] window."""
    pairs = pit_member_pairs(vec, cfg)
    feats = vec.select(
        "conv_id", F.col("turn_idx").alias("m_turn_idx"), "features"
    )
    pairs = pairs.join(feats, ["conv_id", "m_turn_idx"])

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def or_reduce(vlists: pd.Series) -> pd.Series:
        out = [
            np.maximum.reduce(np.vstack(vl)) if len(vl) else np.zeros(0)
            for vl in vlists.to_numpy()
        ]
        return pd.Series(out)

    grouped = pairs.groupBy("conv_id", "ts").agg(
        F.collect_list("features").alias("vecs")
    )
    return grouped.select(
        "conv_id", "ts", or_reduce(F.col("vecs")).alias("window_features_or")
    )
