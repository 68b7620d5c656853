"""Group centroid pooling over embedding vectors."""

import numpy as np


def test_pool_embeddings_matches_numpy(spark):
    from sqlfeatureextraction_spark.operators.similarity import (
        pool_embeddings,
    )

    rng = np.random.default_rng(3)
    dim, n = 16, 200
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    labels = (rng.integers(0, 7, n)).tolist()
    rows = [
        (int(l), [float(x) for x in v]) for l, v in zip(labels, vecs)
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {
        r.label: (r.n_vecs, np.array(r.centroid))
        for r in pool_embeddings(df, dim=dim).collect()
    }
    for l in set(labels):
        mask = np.array(labels) == l
        want = np.round(vecs[mask].astype(np.float64).mean(axis=0), 6)
        assert got[l][0] == int(mask.sum())
        np.testing.assert_allclose(got[l][1], want, atol=1e-6)


def test_pool_embeddings_plan_single_exchange(spark):
    from sqlfeatureextraction_spark.operators.similarity import (
        pool_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [5.0, 6.0])],
        "label int, embedding array<float>",
    )
    out = pool_embeddings(df, dim=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one shuffle, partial-agg before it
    assert "HashAggregate" in plan
    rows = {r.label: r for r in out.collect()}
    assert rows[1].centroid == [2.0, 3.0] and rows[1].n_vecs == 2
    assert rows[2].centroid == [5.0, 6.0]
