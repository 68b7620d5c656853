"""Integer-exact (quantize_dp) paths of the float-fragile operators.

The cross-engine correctness gate hashes values after a 6dp round;
run-order-dependent double aggregation (avg, long prefix sums) can
drift by ulps into a rounding boundary and flip between engines.  The
quantize_dp paths carry every accumulation in scaled integers so the
statistic is bit-identical regardless of partition-merge order,
window-frame association, or engine.  These tests pin (a) equivalence
to the double path within fp tolerance, (b) exactness of the integer
formulation against a sequential NumPy replay, and (c) the new exact
integer companion columns of conversation_features.
"""

import numpy as np
import pandas as pd


def _mk_values(n_groups=7, n_rows=400, seed=11):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, n_groups, n_rows)
    ts = np.arange(n_rows) * 13 + rng.integers(0, 5, n_rows)
    # 2dp granularity like events.value
    v = np.round(rng.uniform(0.01, 500.0, n_rows), 2)
    return pd.DataFrame(
        {
            "user_id": g.astype("int64"),
            "ts_sec": ts.astype("int64"),
            "event_id": np.arange(n_rows, dtype="int64"),
            "value": v,
        }
    )


def _cusum_replay(grp, h=2.0):
    """Sequential textbook replay: S_i = P_i - min(0, min_j P_j)."""
    v = grp["value"].to_numpy()
    mu = v.mean()
    sig = v.std(ddof=1) if len(v) > 1 else 0.0
    p = np.cumsum(v - mu)
    m = np.minimum(np.minimum.accumulate(p), 0.0)
    s = p - m
    shift = (s.round(6) > h * sig) if sig > 0 else np.zeros(len(v), bool)
    return s, shift


def test_cusum_exact_matches_double_path(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        cusum_changepoint,
    )

    pdf = _mk_values()
    df = spark.createDataFrame(pdf)
    args = (df, "user_id", ("ts_sec", "event_id"), "value")
    dbl = (
        cusum_changepoint(*args, h=2.0)
        .toPandas()
        .sort_values(["user_id", "ts_sec", "event_id"])
    )
    ext = (
        cusum_changepoint(*args, h=2.0, quantize_dp=4)
        .toPandas()
        .sort_values(["user_id", "ts_sec", "event_id"])
    )
    # same statistic to fp tolerance, same flags
    assert np.allclose(dbl["cusum"], ext["cusum"], atol=1e-4)
    assert (dbl["is_shift"] == ext["is_shift"]).all()


def test_cusum_exact_vs_sequential_replay(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        cusum_changepoint,
    )

    pdf = _mk_values(seed=23)
    df = spark.createDataFrame(pdf)
    got = (
        cusum_changepoint(
            df, "user_id", ("ts_sec", "event_id"), "value",
            h=2.0, quantize_dp=4,
        )
        .toPandas()
        .sort_values(["user_id", "ts_sec", "event_id"])
    )
    for uid, grp in pdf.sort_values(["ts_sec", "event_id"]).groupby(
        "user_id"
    ):
        want_s, want_shift = _cusum_replay(grp)
        sub = got[got["user_id"] == uid]
        assert np.allclose(sub["cusum"], want_s, atol=1e-4), uid
        assert (sub["is_shift"].to_numpy() == want_shift).all(), uid


def test_cusum_exact_single_row_group(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        cusum_changepoint,
    )

    df = spark.createDataFrame(
        [(1, 10, 0, 5.0)],
        "user_id long, ts_sec long, event_id long, value double",
    )
    r = cusum_changepoint(
        df, "user_id", ("ts_sec", "event_id"), "value", quantize_dp=4
    ).collect()[0]
    assert r.cusum == 0.0 and r.is_shift is False


def test_ewma_quantized_close_to_double(spark):
    from sqlfeatureextraction_spark.operators.pit_window import (
        ewma_time_decay,
    )
    import pyspark.sql.functions as F

    pdf = _mk_values(seed=5)
    df = spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts_sec").cast("timestamp")
    )
    kw = dict(
        half_life_s=3600.0,
        entity_col="user_id",
        ts_col="ts",
        value_col="value",
        order_cols=("event_id",),
    )
    dbl = (
        ewma_time_decay(df, **kw)
        .toPandas()
        .sort_values(["user_id", "ts_sec", "event_id"])
    )
    ext = (
        ewma_time_decay(df, round_dp=4, quantize_dp=4, **kw)
        .toPandas()
        .sort_values(["user_id", "ts_sec", "event_id"])
    )
    # term quantization at 1e-4 over <=400 terms: worst-case drift
    # well under 0.05 absolute at these magnitudes
    assert np.allclose(dbl["ewma"], ext["ewma"], atol=5e-2)


def test_conversation_features_exact_companions(spark, transcripts_pdf):
    from sqlfeatureextraction_spark.operators.sessionize import (
        conversation_features,
    )

    pdf = transcripts_pdf[["conv_id", "turn_idx", "role", "text", "ts"]]
    df = spark.createDataFrame(pdf)
    for r in conversation_features(df, ts_col="ts").collect():
        # the rounded ratio/mean must be exactly derivable from the
        # integer companions — that is the whole point of emitting
        # them for cross-engine comparison
        want_alt = round(r.n_alternations / max(r.n_turns - 1, 1), 6)
        assert abs(r.alternation_ratio - want_alt) < 1e-12
        if r.n_gaps > 0:
            assert abs(
                r.mean_gap_s - round(r.sum_gap_s / r.n_gaps, 4)
            ) < 1e-12
        else:
            assert r.mean_gap_s is None and r.sum_gap_s is None
