"""Rolling quantile, CUSUM changepoint, Zipf slope (stats.py)."""

import math


def test_rolling_quantile_median_hand_computed(spark):
    from sqlfeatureextraction_spark.operators.stats import rolling_quantile

    rows = [("a", i + 1, v) for i, v in enumerate([3.0, 1.0, 2.0, 5.0, 4.0])]
    df = spark.createDataFrame(rows, "grp string, i int, v double")
    got = {
        r.i: (r.roll_n, r.roll_q)
        for r in rolling_quantile(
            df, "grp", ("i",), "v", q=0.5, n_rows=3
        ).collect()
    }
    # frames: [3] [3,1] [3,1,2] [1,2,5] [2,5,4]; idx = ceil(n*0.5)
    assert got == {
        1: (1, 3.0),
        2: (2, 1.0),
        3: (3, 2.0),
        4: (3, 2.0),
        5: (3, 4.0),
    }


def test_rolling_quantile_upper_q_and_nulls(spark):
    from sqlfeatureextraction_spark.operators.stats import rolling_quantile

    rows = [
        ("a", 1, 10.0),
        ("a", 2, None),  # dropped before the window
        ("a", 3, 30.0),
        ("a", 4, 20.0),
    ]
    df = spark.createDataFrame(rows, "grp string, i int, v double")
    got = {
        r.i: (r.roll_n, r.roll_q)
        for r in rolling_quantile(
            df, "grp", ("i",), "v", q=0.75, n_rows=2
        ).collect()
    }
    # frames after null-drop: [10] [10,30] [30,20]; idx = ceil(n*0.75)
    # n=2,q=0.75 -> 2nd element (the DuckDB quantile_disc pin)
    assert got == {1: (1, 10.0), 3: (2, 30.0), 4: (2, 30.0)}


def test_cusum_closed_form_equals_recursion(spark):
    """S_i = P_i - min(P_j) must equal the textbook
    max(0, S_{i-1} + x_i - mu) recursion."""
    import random

    from sqlfeatureextraction_spark.operators.stats import (
        cusum_changepoint,
    )

    rng = random.Random(7)
    vals = [rng.uniform(-5, 5) for _ in range(40)] + [
        rng.uniform(5, 15) for _ in range(10)
    ]
    # adversarial group: STARTS above its mean, so the prefix sum is
    # positive from row 1 — the empty prefix (P_0 = 0) must
    # participate in the min or the statistic underreports
    above = [10.0, 8.0, 9.0, -10.0, -8.0, -9.0]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    rows += [("above", i, v) for i, v in enumerate(above)]
    df = spark.createDataFrame(rows, "grp string, i int, v double")
    got = {
        (r.grp, r.i): r.cusum
        for r in cusum_changepoint(df, "grp", ("i",), "v").collect()
    }
    for grp, series in (("g", vals), ("above", above)):
        mu = sum(series) / len(series)
        s = 0.0
        for i, v in enumerate(series):
            s = max(0.0, s + v - mu)
            assert abs(got[(grp, i)] - s) < 1e-6, (grp, i, got[(grp, i)], s)


def test_cusum_flags_level_shift_not_before(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        cusum_changepoint,
    )

    vals = [0.0, 0.0, 0.0, 10.0, 10.0, 10.0]
    rows = [("g", i, v) for i, v in enumerate(vals)] + [("solo", 0, 1.0)]
    df = spark.createDataFrame(rows, "grp string, i int, v double")
    got = {
        (r.grp, r.i): (r.cusum, r.is_shift)
        for r in cusum_changepoint(
            df, "grp", ("i",), "v", h=1.0
        ).collect()
    }
    # mu=5, P=-5,-10,-15,-10,-5,0; S=0,0,0,5,10,15; sigma=sqrt(30)≈5.477
    assert [got[("g", i)][0] for i in range(6)] == [
        0.0, 0.0, 0.0, 5.0, 10.0, 15.0,
    ]
    assert [got[("g", i)][1] for i in range(6)] == [
        False, False, False, False, True, True,
    ]
    # degenerate single-row group: sigma NULL -> never flags
    assert got[("solo", 0)] == (0.0, False)


def test_zipf_slope_matches_ols(spark):
    from sqlfeatureextraction_spark.operators.stats import zipf_slope

    # token counts: a=8, b=4, c=2, d=1 (hapax, trimmed by min_count=2)
    rows = [
        ("a a a a b b c",),
        ("a a a a b b c d",),
    ]
    df = spark.createDataFrame(rows, "text string")
    r = zipf_slope(df, "text", min_count=2).collect()[0]
    xs = [math.log(k) for k in (1, 2, 3)]
    ys = [math.log(k) for k in (8, 4, 2)]
    n = 3
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert r.n_tokens == 3
    assert abs(r.slope - slope) < 1e-6
    assert abs(r.intercept - intercept) < 1e-6
    assert 0.9 < r.r2 <= 1.0


def test_gini_known_values(spark):
    import pytest as _pytest

    from sqlfeatureextraction_spark.operators.stats import (
        gini_coefficient,
    )

    rows = (
        [("eq", float(v)) for v in (5, 5, 5, 5)]          # equality -> 0
        + [("conc", 0.0), ("conc", 0.0), ("conc", 0.0), ("conc", 12.0)]
        + [("mid", 1.0), ("mid", 2.0), ("mid", 3.0), ("mid", 4.0)]
        + [("solo", 7.0)]
    )
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {
        r.grp: (r.n, r.gini)
        for r in gini_coefficient(df, "grp", "v").collect()
    }
    assert got["eq"] == (4, 0.0)
    # all mass on one of 4 -> G = (n-1)/n = 0.75
    assert got["conc"] == (4, 0.75)

    def brute(vals):
        vs = sorted(vals)
        n = len(vs)
        return 2 * sum((i + 1) * x for i, x in enumerate(vs)) / (
            n * sum(vs)
        ) - (n + 1) / n

    assert abs(got["mid"][1] - brute([1, 2, 3, 4])) < 1e-6
    assert got["solo"] == (1, None)

    with _pytest.raises(ValueError, match="negative"):
        gini_coefficient(
            spark.createDataFrame([("a", -1.0)], "grp string, v double"),
            "grp",
            "v",
        ).collect()


def test_binseg_finds_injected_shift(spark):
    from sqlfeatureextraction_spark.operators.stats import binseg_split

    import random

    rng = random.Random(5)
    rows = []
    # group 'shift': level changes after index 30 (1-based k=30)
    for i in range(50):
        v = rng.gauss(0, 1) + (6.0 if i >= 30 else 0.0)
        rows.append(("shift", i, v))
    # group 'flat': no shift
    for i in range(50):
        rows.append(("flat", i, rng.gauss(0, 1)))
    df = spark.createDataFrame(rows, "grp string, i int, v double")
    got = {
        r.grp: (r.n, r.split_idx, r.stat)
        for r in binseg_split(df, "grp", ("i",), "v").collect()
    }
    assert got["shift"][0] == 50
    assert got["shift"][1] == 30  # exact split recovered
    assert got["shift"][2] > got["flat"][2] * 3

    # brute-force the argmax for the shift group
    vals = [v for g, _, v in rows if g == "shift"]
    n = len(vals)
    p = 0.0
    pn = sum(vals)
    best = None
    for k in range(1, n):
        p += vals[k - 1]
        t = abs(p - k / n * pn) * (n / (k * (n - k))) ** 0.5
        cand = (round(t, 6), -k)
        if best is None or cand > best:
            best = cand
    assert got["shift"][1] == -best[1]
    assert abs(got["shift"][2] - best[0]) < 1e-9


def test_acf_brute_force(spark):
    import math
    import random

    from sqlfeatureextraction_spark.operators.stats import acf_features

    rng = random.Random(9)
    # AR(1)-ish sticky series + an alternating series
    sticky = [0.0]
    for _ in range(39):
        sticky.append(0.8 * sticky[-1] + rng.gauss(0, 1))
    alt = [float((-1) ** i) for i in range(40)]
    rows = [("sticky", i, v) for i, v in enumerate(sticky)]
    rows += [("alt", i, v) for i, v in enumerate(alt)]
    df = spark.createDataFrame(rows, "grp string, i int, v double")
    got = {
        r.grp: (r.n, r.acf_1, r.acf_2)
        for r in acf_features(df, "grp", ("i",), "v", max_lag=2).collect()
    }

    def pearson(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        vx = sum((a - mx) ** 2 for a in xs)
        vy = sum((b - my) ** 2 for b in ys)
        return cov / math.sqrt(vx * vy)

    for name, series in (("sticky", sticky), ("alt", alt)):
        for k in (1, 2):
            exp = pearson(series[k:], series[:-k])
            assert abs(got[name][k] - exp) < 1e-6, (name, k)
    assert got["sticky"][1] > 0.5          # AR(1) persistence
    assert got["alt"][1] == -1.0 and got["alt"][2] == 1.0


def test_trend_slope_tstat(spark):
    import math
    import random

    from sqlfeatureextraction_spark.operators.stats import trend_slope

    rng = random.Random(4)
    rows = [("up", float(i), 2.0 + 0.5 * i + rng.gauss(0, 0.2))
            for i in range(30)]
    rows += [("flat", float(i), 5.0 + rng.gauss(0, 0.2))
             for i in range(30)]
    rows += [("tiny", 1.0, 2.0), ("tiny", 2.0, 3.0)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    got = {
        r.grp: (r.n, r.slope, r.t_stat)
        for r in trend_slope(df, "grp", "x", "y").collect()
    }

    def brute(pts):
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        sxx = sum((x - mx) ** 2 for x, _ in pts)
        sxy = sum((x - mx) * (y - my) for x, y in pts)
        syy = sum((y - my) ** 2 for _, y in pts)
        sl = sxy / sxx
        sse = syy - sl * sl * sxx
        return sl, sl / math.sqrt((sse / (n - 2)) / sxx)

    for name in ("up", "flat"):
        pts = [(x, y) for g, x, y in rows if g == name]
        sl, t = brute(pts)
        assert abs(got[name][1] - sl) < 1e-6
        assert abs(got[name][2] - t) < 1e-4
    assert abs(got["up"][2]) > 20 > abs(got["flat"][2])
    assert got["tiny"][2] is None  # n < 3 -> NULL t
