"""Welch t-test and Spearman rank correlation (stats.py)."""

import math


def test_welch_ttest_hand_formula(spark):
    from sqlfeatureextraction_spark.operators.stats import welch_ttest

    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [2.0, 2.5, 3.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b] + [("C", 9.9)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = welch_ttest(df, "grp", "v", "A", "B").collect()[0]

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, v

    na, ma, va = stats(a)
    nb, mb, vb = stats(b)
    sa, sb = va / na, vb / nb
    t = (ma - mb) / math.sqrt(sa + sb)
    dof = (sa + sb) ** 2 / (sa**2 / (na - 1) + sb**2 / (nb - 1))
    assert (r.n_a, r.n_b) == (5, 3)
    assert abs(r.mean_a - round(ma, 6)) < 1e-9
    assert abs(r.t_stat - t) < 1e-6
    assert abs(r.df - dof) < 1e-6


def test_welch_ttest_degenerate_slice_null(spark):
    from sqlfeatureextraction_spark.operators.stats import welch_ttest

    rows = [("A", 1.0), ("A", 2.0), ("B", 5.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = welch_ttest(df, "grp", "v", "A", "B").collect()[0]
    assert (r.n_a, r.n_b) == (2, 1)
    assert r.t_stat is None and r.df is None


def _spearman(xs, ys):
    def frac_ranks(vs):
        order = sorted(range(len(vs)), key=lambda i: vs[i])
        ranks = [0.0] * len(vs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vs[order[j]] == vs[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    rx, ry = frac_ranks(xs), frac_ranks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry)) / (n - 1)
    vx = sum((a - mx) ** 2 for a in rx) / (n - 1)
    vy = sum((b - my) ** 2 for b in ry) / (n - 1)
    return cov / math.sqrt(vx * vy)


def test_spearman_ties_and_monotone(spark):
    from sqlfeatureextraction_spark.operators.stats import spearman_corr

    # g1: y = exp(x) -> rho exactly 1 despite nonlinearity
    g1 = [(float(x), math.exp(x)) for x in range(6)]
    # g2: ties on both axes
    g2 = [(1.0, 2.0), (1.0, 5.0), (2.0, 2.0), (3.0, 1.0), (3.0, 4.0)]
    rows = [("m", x, y) for x, y in g1] + [("t", x, y) for x, y in g2]
    rows += [("solo", 1.0, 2.0)]  # n=1 -> NULL rho
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    got = {
        r.grp: (r.n, r.rho)
        for r in spearman_corr(df, "grp", "x", "y").collect()
    }
    assert got["m"] == (6, 1.0)
    exp = _spearman([x for x, _ in g2], [y for _, y in g2])
    assert got["t"][0] == 5
    assert abs(got["t"][1] - exp) < 1e-6
    assert got["solo"] == (1, None)


def test_mann_whitney_u_brute_force(spark):
    from sqlfeatureextraction_spark.operators.stats import mann_whitney_u

    a = [1.2, 3.4, 3.4, 5.0, 7.7, 2.0]
    b = [2.0, 2.0, 4.1, 6.3]
    rows = [("A", v) for v in a] + [("B", v) for v in b] + [("C", 0.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = mann_whitney_u(df, "grp", "v", "A", "B").collect()[0]

    vals = sorted(a + b)
    # fractional ranks with ties
    ranks = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        for _ in range(i, j):
            ranks.setdefault(vals[i], (i + 1 + j) / 2.0)
        i = j
    ra = sum(ranks[v] for v in a)
    na, nb = len(a), len(b)
    n = na + nb
    u = ra - na * (na + 1) / 2.0
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(vals).values())
    sig2 = (na * nb / 12.0) * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2.0) / math.sqrt(sig2)
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.u_stat - u) < 1e-9
    assert abs(r.z - z) < 1e-6


def test_mann_whitney_all_tied_null_z(spark):
    from sqlfeatureextraction_spark.operators.stats import mann_whitney_u

    rows = [("A", 2.0), ("A", 2.0), ("B", 2.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = mann_whitney_u(df, "grp", "v", "A", "B").collect()[0]
    assert r.z is None
    # every row shares rank 2 -> R_a = 4 -> U = 1
    assert r.u_stat == 1.0


def test_ols_fit_matches_numpy_and_oracle(spark):
    import duckdb
    import numpy as np

    from sqlfeatureextraction_spark.operators.fit import (
        ols_fit,
        ols_sql_oracle,
    )

    rng = __import__("random").Random(5)
    rows = [
        (
            2.0 + 1.5 * x1 - 0.7 * x2 + rng.gauss(0, 0.3),
            x1,
            x2,
        )
        for x1, x2 in (
            (rng.uniform(-3, 3), rng.uniform(-3, 3)) for _ in range(200)
        )
    ]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    got = ols_fit(df, "x1", "x2", "y").collect()[0]

    y = np.array([r[0] for r in rows])
    x = np.column_stack(
        [np.ones(len(rows)), [r[1] for r in rows], [r[2] for r in rows]]
    )
    beta = np.linalg.lstsq(x, y, rcond=None)[0]
    pred = x @ beta
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    for b_got, b_exp in zip((got.b0, got.b1, got.b2), beta):
        assert abs(b_got - b_exp) < 1e-4
    assert abs(got.r2 - r2) < 1e-4

    con = duckdb.connect()
    con.execute("CREATE TABLE t (y DOUBLE, x1 DOUBLE, x2 DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    o = con.execute(
        ols_sql_oracle("SELECT y, x1, x2 FROM t")
    ).fetchone()
    assert o == (got.n, got.b0, got.b1, got.b2, got.r2)


def test_ks_test_brute_force(spark):
    from sqlfeatureextraction_spark.operators.stats import ks_test

    a = [1.0, 2.0, 2.0, 3.5, 6.0, 8.0]
    b = [2.0, 4.0, 4.0, 5.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b] + [("C", 1.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = ks_test(df, "grp", "v", "A", "B").collect()[0]

    vals = sorted(set(a + b))
    d = max(
        abs(
            sum(x <= v for x in a) / len(a)
            - sum(x <= v for x in b) / len(b)
        )
        for v in vals
    )
    k = math.sqrt(len(a) * len(b) / (len(a) + len(b))) * d
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert abs(r.d_stat - d) < 1e-6
    assert abs(r.k_stat - k) < 1e-6


def test_ks_identical_distributions_zero(spark):
    from sqlfeatureextraction_spark.operators.stats import ks_test

    rows = [("A", float(v)) for v in (1, 2, 3)] + [
        ("B", float(v)) for v in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = ks_test(df, "grp", "v", "A", "B").collect()[0]
    assert r.d_stat == 0.0 and r.k_stat == 0.0


def test_weighted_quantiles_brute_force(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        weighted_quantiles,
    )

    rows = [
        (1.0, 1.0), (2.0, 5.0), (2.0, 1.0), (3.0, 2.0), (10.0, 2.0),
        (4.0, 0.0),   # zero weight drops
        (5.0, None),  # null weight drops
    ]
    df = spark.createDataFrame(rows, "v double, w double")
    got = {
        r.p: (r.value, r.total_weight)
        for r in weighted_quantiles(df, "v", "w", (0.1, 0.5, 0.9, 1.0)).collect()
    }
    # cumW: 1->1, 2->7, 3->9, 10->11 ; W=11
    # p=0.1 -> 1.1: first v with cum>=1.1 is 2; p=0.5 -> 5.5 -> 2
    # p=0.9 -> 9.9 -> 10; p=1.0 -> 11 -> 10
    assert got == {
        0.1: (2.0, 11.0),
        0.5: (2.0, 11.0),
        0.9: (10.0, 11.0),
        1.0: (10.0, 11.0),
    }


def test_benford_brute_force(spark):
    import math

    from sqlfeatureextraction_spark.operators.stats import (
        benford_deviation,
    )

    vals = [1.0, 12.0, 0.13, 145.0, 19.9, 2.5, 29.0, 3.14, 0.0, None,
            -456.0, 9.99]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r.digit: (r.n, r.share, r.expected) for r in
           benford_deviation(df, "v").collect()}
    from collections import Counter

    digs = Counter()
    for v in vals:
        if v is None or v == 0:
            continue
        a = abs(v)
        digs[int(a / 10 ** math.floor(math.log10(a)))] += 1
    n_tot = sum(digs.values())
    for dgt, c in digs.items():
        n, share, expected = got[dgt]
        assert n == c
        assert abs(share - c / n_tot) < 1e-6
        assert abs(expected - math.log10(1 + 1 / dgt)) < 1e-6
    # spine: ALL 9 digits present; absent ones carry n=0 and the
    # full expected-mass chi2 term
    assert set(got) == set(range(1, 10))
    n_tot2 = sum(c for c in digs.values())
    for dgt in set(range(1, 10)) - set(digs):
        n, share, expected = got[dgt]
        assert n == 0 and share == 0.0

    # fully-concentrated corpus: chi2 must include absent-digit mass
    from sqlfeatureextraction_spark.operators.stats import (
        benford_deviation as _bd,
    )

    ones = spark.createDataFrame([(1.0,)] * 50, "v double")
    rows9 = _bd(ones, "v").collect()
    assert len(rows9) == 9
    exp_chi2 = 50 * (
        (1 - math.log10(2)) ** 2 / math.log10(2)
        + sum(
            math.log10(1 + 1 / d) for d in range(2, 10)
        )
    )
    assert abs(rows9[0].chi2 - round(exp_chi2, 6)) < 1e-4


def test_welch_ttest_empty_slice_one_row(spark):
    from sqlfeatureextraction_spark.operators.stats import welch_ttest

    rows = [("A", 1.0), ("A", 2.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = welch_ttest(df, "grp", "v", "A", "NOPE").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b) == (2, 0)
    assert r.mean_b is None and r.t_stat is None and r.df is None
