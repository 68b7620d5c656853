"""IRLS logistic regression (fit.py): Spark aggregates + driver Cramer
solve vs the generated DuckDB CTE-chain oracle, plus a from-scratch
numpy IRLS replay."""

import math
import random

import duckdb
import pytest


def _make_data(n=400, seed=11):
    rng = random.Random(seed)
    rows = []
    b0, b1, b2 = -1.0, 2.0, -1.5
    for _ in range(n):
        x1 = rng.uniform(-2, 2)
        x2 = rng.uniform(-2, 2)
        p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x1 + b2 * x2)))
        y = 1.0 if rng.random() < p else 0.0
        rows.append((y, x1, x2))
    return rows


def _numpy_irls(rows, n_iter=4):
    import numpy as np

    y = np.array([r[0] for r in rows])
    x = np.column_stack(
        [np.ones(len(rows)), [r[1] for r in rows], [r[2] for r in rows]]
    )
    beta = np.zeros(3)
    for _ in range(n_iter):
        mu = 1.0 / (1.0 + np.exp(-x @ beta))
        w = mu * (1 - mu)
        h = x.T @ (x * w[:, None])
        g = x.T @ (y - mu)
        beta = beta + np.linalg.solve(h, g)
    mu = 1.0 / (1.0 + np.exp(-x @ beta))
    loss = float(np.mean(-(y * np.log(mu) + (1 - y) * np.log(1 - mu))))
    return beta, loss


def test_logreg_matches_numpy_irls(spark):
    from sqlfeatureextraction_spark.operators.fit import logreg_irls

    rows = _make_data()
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    got = logreg_irls(df, "x1", "x2", "y", n_iter=4, round_dp=4).collect()[0]
    beta, loss = _numpy_irls(rows)
    assert got.n == len(rows)
    for b_got, b_exp in zip((got.b0, got.b1, got.b2), beta):
        assert abs(b_got - b_exp) < 1e-3, (b_got, b_exp)
    assert abs(got.log_loss - loss) < 1e-3
    # recovered signs match the generating model (-1, 2, -1.5)
    assert got.b0 < 0 < got.b1 and got.b2 < 0


def test_logreg_oracle_sql_replays_identically(spark):
    from sqlfeatureextraction_spark.operators.fit import (
        logreg_irls,
        logreg_sql_oracle,
    )

    rows = _make_data(n=300, seed=3)
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    got = logreg_irls(df, "x1", "x2", "y", n_iter=4, round_dp=4).collect()[0]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (y DOUBLE, x1 DOUBLE, x2 DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql = logreg_sql_oracle("SELECT y, x1, x2 FROM t", n_iter=4)
    n, b0, b1, b2, loss = con.execute(sql).fetchone()
    assert (n, b0, b1, b2, loss) == (
        got.n,
        got.b0,
        got.b1,
        got.b2,
        got.log_loss,
    )


def test_logreg_singular_hessian_raises(spark):
    from sqlfeatureextraction_spark.operators.fit import logreg_irls

    # x2 = x1 -> collinear -> singular Hessian
    rows = [(float(i % 2), float(i), float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    with pytest.raises(ValueError, match="singular"):
        logreg_irls(df, "x1", "x2", "y").collect()


def test_pca_power_matches_numpy_top_component(spark):
    import numpy as np

    from sqlfeatureextraction_spark.operators.fit import pca_power

    rng = np.random.default_rng(21)
    # anisotropic cloud: dominant axis along (3, 1, 0.5, ...)
    d = 6
    axis = np.array([3.0, 1.0, 0.5, 0.2, 0.1, 0.05])
    x = rng.normal(size=(300, d)) * axis + 5.0
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(x)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rows_out = sorted(pca_power(df, n_iter=12).collect(),
                      key=lambda r: r.dim_idx)
    got = rows_out[0]

    c = np.cov(x, rowvar=False)
    w, v = np.linalg.eigh(c)
    top_val, top_vec = w[-1], v[:, -1]
    if top_vec[int(np.argmax(np.abs(top_vec)))] < 0:
        top_vec = -top_vec
    assert len(rows_out) == d
    assert got.n == 300 and got.dim == d
    assert abs(got.eigenvalue - top_val) < 1e-2 * top_val
    assert abs(got.explained_var - top_val / w.sum()) < 1e-3
    comp = np.array([r.loading for r in rows_out])
    if comp[int(np.argmax(np.abs(comp)))] < 0:
        comp = -comp
    assert np.allclose(comp, top_vec, atol=5e-3)


def test_pca_oracle_sql_replays_identically(spark):
    import duckdb
    import numpy as np

    from sqlfeatureextraction_spark.operators.fit import (
        pca_power,
        pca_sql_oracle,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(120, 5)) * np.array([2.0, 1.0, 0.7, 0.3, 0.1])
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(x)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(tuple(r) for r in pca_power(df, n_iter=8).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    exp = sorted(con.execute(pca_sql_oracle(n_iter=8)).fetchall())
    assert got == exp


def test_calibration_curve_matches_oracle_and_brute(spark):
    import duckdb

    from sqlfeatureextraction_spark.operators.fit import (
        calibration_curve,
        calibration_sql_oracle,
        logreg_irls,
    )

    rows = _make_data(n=400, seed=11)
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    got = sorted(
        tuple(r)
        for r in calibration_curve(df, "x1", "x2", "y", n_bins=5).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t (y DOUBLE, x1 DOUBLE, x2 DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    exp = sorted(
        con.execute(
            calibration_sql_oracle("SELECT y, x1, x2 FROM t", n_bins=5)
        ).fetchall()
    )
    assert got == exp

    # brute-force replay with the published (rounded) coefficients
    import math as m

    fit = logreg_irls(df, "x1", "x2", "y").collect()[0]
    bins = {}
    for y, x1, x2 in rows:
        mu = 1.0 / (1.0 + m.exp(-(fit.b0 + fit.b1 * x1 + fit.b2 * x2)))
        b = min(int(mu * 5), 4)
        n, sm, sy = bins.get(b, (0, 0.0, 0.0))
        bins[b] = (n + 1, sm + mu, sy + y)
    total = sum(n for n, _, _ in bins.values())
    ece = sum(
        n * abs(sy / n - sm / n) for n, sm, sy in bins.values()
    ) / total
    for b, n, conf, acc, e in got:
        bn, bsm, bsy = bins[b]
        assert n == bn
        assert abs(conf - bsm / bn) < 1e-6
        assert abs(acc - bsy / bn) < 1e-6
        assert abs(e - ece) < 1e-6
    # well-specified model on its own training data: ECE is small
    assert got[0][4] < 0.15


def test_auc_matches_pair_counting(spark):
    from sqlfeatureextraction_spark.operators.fit import auc_score

    rows = [
        (0.9, 1.0), (0.8, 1.0), (0.8, 0.0), (0.6, 1.0),
        (0.5, 0.0), (0.5, 0.0), (0.5, 1.0), (0.2, 0.0),
    ]
    df = spark.createDataFrame(rows, "s double, y double")
    r = auc_score(df, "s", "y").collect()[0]
    pos = [s for s, y in rows if y == 1.0]
    neg = [s for s, y in rows if y == 0.0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    exp = wins / (len(pos) * len(neg))
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    assert abs(r.auc - exp) < 1e-9

    # single-class degenerate -> NULL
    df1 = spark.createDataFrame([(0.5, 1.0)], "s double, y double")
    assert auc_score(df1, "s", "y").collect()[0].auc is None
