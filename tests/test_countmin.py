"""Count-min sketch: upper-bound property + exact wide regime."""

from collections import Counter

import numpy as np


def _data(spark, n=3000, zipf=1.5, seed=9):
    rng = np.random.default_rng(seed)
    keys = [f"k{int(v)}" for v in np.clip(rng.zipf(zipf, n), 1, 500)]
    df = spark.createDataFrame([(k,) for k in keys], "tok string")
    return df, Counter(keys)


def test_countmin_exact_in_wide_regime(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        countmin_build,
        countmin_estimate,
    )

    df, truth = _data(spark)
    sk = countmin_build(df, "tok", depth=4, width=1 << 16)
    keys = df.distinct()
    got = {
        r.tok: r.est
        for r in countmin_estimate(
            sk, keys, "tok", depth=4, width=1 << 16
        ).collect()
    }
    assert got == dict(truth)
    # sketch is bounded by depth*width and far under it here
    assert sk.count() <= 4 * len(truth)


def test_countmin_never_undercounts_when_narrow(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        countmin_build,
        countmin_estimate,
    )

    df, truth = _data(spark)
    sk = countmin_build(df, "tok", depth=3, width=8)
    got = {
        r.tok: r.est
        for r in countmin_estimate(
            sk, df.distinct(), "tok", depth=3, width=8
        ).collect()
    }
    assert set(got) == set(truth)
    assert all(got[k] >= v for k, v in truth.items())
    # width 8 with hundreds of keys MUST collide somewhere
    assert any(got[k] > v for k, v in truth.items())
    assert sk.count() <= 3 * 8


def test_countmin_merge_is_cellwise_sum(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        countmin_build,
        countmin_estimate,
    )
    from pyspark.sql import functions as F

    a = spark.createDataFrame([("x",), ("x",), ("y",)], "tok string")
    b = spark.createDataFrame([("x",), ("z",)], "tok string")
    merged = (
        countmin_build(a, "tok")
        .unionByName(countmin_build(b, "tok"))
        .groupBy("fn_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_build(a.unionByName(b), "tok")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
