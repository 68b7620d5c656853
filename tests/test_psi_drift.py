"""Population Stability Index drift monitor."""

import math

import numpy as np


def _psi_brute(ref, cur, n_bins=10, smooth=0.5):
    ref, cur = sorted(ref), list(cur)
    brks = [
        ref[max(1, math.ceil((i / n_bins) * len(ref))) - 1]
        for i in range(1, n_bins)
    ]

    def bin_of(v):
        return sum(1 for b in brks if v > b)

    rn = [0] * n_bins
    cn = [0] * n_bins
    for v in ref:
        rn[bin_of(v)] += 1
    for v in cur:
        cn[bin_of(v)] += 1
    tr, tc = sum(rn), sum(cn)
    rows = []
    psi = 0.0
    for i in range(n_bins):
        p = (rn[i] + smooth) / (tr + smooth * n_bins)
        q = (cn[i] + smooth) / (tc + smooth * n_bins)
        t = (q - p) * math.log(q / p)
        psi += t
        rows.append((i, rn[i], cn[i], p, q, t))
    return rows, psi


def test_psi_matches_brute(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        distribution_drift_psi,
    )

    rng = np.random.default_rng(5)
    ref_vals = np.round(rng.normal(50, 10, 2000), 2)
    cur_vals = np.round(rng.normal(58, 14, 1500), 2)  # shifted
    ref = spark.createDataFrame(
        [(float(v),) for v in ref_vals] + [(None,)], "v double"
    )
    cur = spark.createDataFrame(
        [(float(v),) for v in cur_vals] + [(None,)], "v double"
    )
    got = {
        r.bin_idx: r
        for r in distribution_drift_psi(ref, cur, "v").collect()
    }
    rows, psi = _psi_brute(ref_vals.tolist(), cur_vals.tolist())
    assert len(got) == 10
    for i, rn, cn, p, q, t in rows:
        assert got[i].ref_n == rn and got[i].cur_n == cn
        assert abs(got[i].ref_share - p) < 2e-6
        assert abs(got[i].cur_share - q) < 2e-6
        assert abs(got[i].psi_term - t) < 2e-6
    assert abs(got[0].psi - psi) < 1e-5
    assert got[0].psi > 0.1  # the shift is detected


def test_psi_identical_distributions_near_zero(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        distribution_drift_psi,
    )

    vals = [(float(i % 100),) for i in range(1000)]
    ref = spark.createDataFrame(vals, "v double")
    got = distribution_drift_psi(ref, ref, "v").collect()
    assert abs(got[0].psi) < 1e-9
    assert all(r.ref_n == r.cur_n for r in got)
