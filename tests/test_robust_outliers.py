"""Median/MAD robust outlier flags."""

import math

import numpy as np


def _qdisc(vals, q=0.5):
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


def test_robust_outliers_match_brute(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        robust_outlier_flags,
    )

    rng = np.random.default_rng(17)
    rows = []
    for g in ("a", "b"):
        base = 50 if g == "a" else 500
        for i in range(200):
            rows.append((g, float(np.round(rng.normal(base, 5), 2))))
        rows.append((g, base + 1000.0))  # a gross outlier
    rows.append(("a", None))
    df = spark.createDataFrame(rows, "grp string, v double")
    got = robust_outlier_flags(df, "grp", "v", k=3.5).collect()

    by = {}
    for g, v in rows:
        if v is not None:
            by.setdefault(g, []).append(v)
    med = {g: _qdisc(v) for g, v in by.items()}
    mad = {g: _qdisc([abs(x - med[g]) for x in v]) for g, v in by.items()}
    assert len(got) == sum(len(v) for v in by.values())
    n_out = 0
    for r in got:
        assert r.med == med[r.grp] and r.mad == mad[r.grp]
        z = round(0.6745 * (r.v - r.med) / r.mad, 6)
        assert abs(r.robust_z - z) < 1e-9
        assert r.is_outlier == (abs(z) > 3.5)
        n_out += int(r.is_outlier)
        if r.v in (1050.0, 1500.0):
            assert r.is_outlier  # the planted gross outliers flag
    # the planted two, plus at most a few natural 3.5-sigma samples
    assert 2 <= n_out <= 6


def test_robust_outliers_zero_mad_group(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        robust_outlier_flags,
    )

    df = spark.createDataFrame(
        [("c", 5.0)] * 9 + [("c", 7.0)], "grp string, v double"
    )
    got = {(r.v, r.is_outlier, r.robust_z) for r in
           robust_outlier_flags(df, "grp", "v").collect()}
    # MAD = 0: z is NULL, only the value away from the median flags
    assert (5.0, False, None) in got
    assert (7.0, True, None) in got
