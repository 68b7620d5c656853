"""Per-group quantile threshold calibration."""

import numpy as np


def _quantile_disc(vals, q):
    """DuckDB quantile_disc: the element at rank ceil(q*n) (1-based)."""
    s = sorted(vals)
    import math

    idx = max(1, math.ceil(q * len(s)))
    return s[idx - 1]


def test_calibrate_matches_quantile_disc(spark):
    from sqlfeatureextraction_spark.operators.selection import (
        calibrate_group_threshold,
    )

    rng = np.random.default_rng(11)
    rows = [
        (i, f"g{int(i % 5)}", float(np.round(rng.uniform(0, 100), 2)))
        for i in range(400)
    ]
    # group with NULL scores mixed in
    rows += [(1000 + i, "g0", None) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = calibrate_group_threshold(
        df, group_col="grp", score_col="score", q=0.75
    ).collect()

    by_grp = {}
    for _, g, s in rows:
        if s is not None:
            by_grp.setdefault(g, []).append(s)
    thr = {g: _quantile_disc(v, 0.75) for g, v in by_grp.items()}

    kept = {(r.id, r.grp) for r in out}
    want = {
        (i, g) for i, g, s in rows if s is not None and s >= thr[g]
    }
    assert kept == want
    for r in out:
        assert r.threshold == thr[r.grp]
        assert r.n_group == len(by_grp[r.grp])


def test_calibrate_audit_mode_keeps_all_scored(spark):
    from sqlfeatureextraction_spark.operators.selection import (
        calibrate_group_threshold,
    )

    df = spark.createDataFrame(
        [(0, "a", 1.0), (1, "a", 2.0), (2, "a", 3.0), (3, "a", 4.0)],
        "id int, grp string, score double",
    )
    out = calibrate_group_threshold(
        df, "grp", "score", q=0.5, keep=False
    ).collect()
    assert len(out) == 4
    assert {r.threshold for r in out} == {2.0}
