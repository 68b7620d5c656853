"""SemDeDup (clustered semantic dedup) — differential vs a sequential
numpy reference, plus boundary properties and plan hygiene."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _load(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _ref_semdedup(ids, vecs, k, iters, tau):
    """Independent sequential formulation of the same contract."""
    order = np.argsort(ids, kind="stable")
    ids = np.asarray(ids)[order]
    vecs = np.asarray(vecs, dtype=np.float64)[order]
    vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    cent = vecs[:k].copy()
    for _ in range(iters):
        cn = cent / np.maximum(
            np.linalg.norm(cent, axis=1, keepdims=True), 1e-12
        )
        cells = np.argmax(vn @ cn.T, axis=1)
        for j in range(k):
            m = cells == j
            if m.any():
                cent[j] = np.round(vecs[m].mean(axis=0), 6)
    cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    cells = np.argmax(vn @ cn.T, axis=1)
    kept = np.ones(len(ids), dtype=bool)
    for j in range(k):
        idx = np.nonzero(cells == j)[0]  # ascending id order already
        sub = vn[idx]
        g = sub @ sub.T
        for p in range(1, len(idx)):
            if (g[p, :p] >= tau).any():
                kept[idx[p]] = False
    return {int(i): (int(c), bool(kk)) for i, c, kk in zip(ids, cells, kept)}


@pytest.mark.parametrize("k,iters,tau", [(8, 1, 0.4), (5, 2, 0.3)])
def test_semantic_dedup_matches_numpy_reference(spark, k, iters, tau):
    from sqlfeatureextraction_spark.operators.semdedup import semantic_dedup

    emb = _load(spark)
    got = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semantic_dedup(
            emb, k=k, iters=iters, threshold=tau
        ).collect()
    }
    pdf = emb.orderBy("vec_id").toPandas()
    want = _ref_semdedup(
        pdf["vec_id"].to_numpy(),
        np.vstack(pdf["embedding"].to_numpy()),
        k,
        iters,
        tau,
    )
    assert got == want
    # the synthetic corpus must actually exercise the prune
    assert sum(1 for _, (__, kk) in got.items() if not kk) > 0


def test_semantic_dedup_threshold_boundaries(spark):
    """tau > 1 keeps everything; tau = -1 keeps exactly the lowest id
    per cell (every pair has cos >= -1)."""
    from sqlfeatureextraction_spark.operators.semdedup import semantic_dedup

    emb = _load(spark)
    rows_hi = semantic_dedup(emb, k=8, iters=1, threshold=1.5).collect()
    assert all(r["kept"] for r in rows_hi)

    rows_lo = semantic_dedup(emb, k=8, iters=1, threshold=-1.0).collect()
    by_cell: dict[int, list] = {}
    for r in rows_lo:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rs in by_cell.items():
        keepers = sorted(r["vec_id"] for r in rs if r["kept"])
        assert keepers == [min(r["vec_id"] for r in rs)], cell
    # same cells under both thresholds (prune never moves assignment)
    assert {r["vec_id"]: r["cell"] for r in rows_hi} == {
        r["vec_id"]: r["cell"] for r in rows_lo
    }


def test_semantic_dedup_precomputed_centroids_skip_fit(spark):
    from sqlfeatureextraction_spark.operators.semdedup import (
        fit_kmeans_quantized,
        semantic_dedup,
    )

    emb = _load(spark)
    cent = fit_kmeans_quantized(emb, k=8, iters=1)
    assert cent.shape == (8, 64)
    a = semantic_dedup(emb, k=8, iters=1, threshold=0.4).collect()
    b = semantic_dedup(emb, threshold=0.4, centroids=cent).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_semantic_dedup_blocked_scan_block_invariant(spark):
    """The blocked lower-triangle scan is exact for any block size:
    tiny blocks (prefix + diagonal paths both exercised) == one
    all-in-one block."""
    from sqlfeatureextraction_spark.operators.semdedup import (
        fit_kmeans_quantized,
        semantic_dedup,
    )

    emb = _load(spark)
    cent = fit_kmeans_quantized(emb, k=4, iters=1)
    big = semantic_dedup(
        emb, threshold=0.3, centroids=cent, block=10**9
    ).collect()
    small = semantic_dedup(
        emb, threshold=0.3, centroids=cent, block=7
    ).collect()
    assert sorted(map(tuple, big)) == sorted(map(tuple, small))
    # k=4 over 500 rows -> cells far larger than block=7, so multi-
    # block prefixes were really exercised, and the prune is nontrivial
    assert sum(1 for r in big if not r["kept"]) > 0


def test_semantic_dedup_plan_single_shuffle(spark):
    """The prune stage is ONE exchange (hash by cell) — no cartesian,
    no corpus-vector broadcast."""
    from sqlfeatureextraction_spark.operators.semdedup import (
        fit_kmeans_quantized,
        semantic_dedup,
    )

    emb = _load(spark)
    cent = fit_kmeans_quantized(emb, k=8, iters=1)
    plan = (
        semantic_dedup(emb, threshold=0.4, centroids=cent)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Cartesian" not in plan and "NestedLoop" not in plan


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_semantic_dedup_random_differential(spark, seed):
    """Seeded random-corpus sweep vs the sequential numpy reference:
    random dimensionality / k / iters / tau per seed, planted exact
    duplicates and near-duplicates (scaled + noisy copies) so the
    prune decisions exercise both sides of the threshold."""
    from sqlfeatureextraction_spark.operators.semdedup import semantic_dedup

    rng = np.random.RandomState(seed)
    n, dim = 150, int(rng.randint(4, 17))
    k = int(rng.randint(2, 7))
    iters = int(rng.randint(1, 4))
    tau = float(rng.uniform(0.3, 0.95))
    vecs = rng.randn(n, dim)
    for _ in range(25):  # planted near/exact dups
        a, b = rng.randint(0, n, size=2)
        scale = float(rng.uniform(0.5, 2.0))
        noise = rng.randn(dim) * (0.0 if rng.rand() < 0.5 else 0.05)
        vecs[b] = vecs[a] * scale + noise
    ids = rng.permutation(1000)[:n]
    df = spark.createDataFrame(
        [
            (int(i), [float(x) for x in v])
            for i, v in zip(ids, vecs)
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semantic_dedup(
            df, k=k, iters=iters, threshold=tau, block=16
        ).collect()
    }
    # float32 storage: the reference must see the same float32-rounded
    # values the engine reads back from the array<float> column
    want = _ref_semdedup(
        ids, vecs.astype(np.float32).astype(np.float64), k, iters, tau
    )
    assert got == want
    dropped = sum(1 for _, (__, kk) in got.items() if not kk)
    assert 0 < dropped < n


def test_semantic_dedup_block_validation(spark):
    from sqlfeatureextraction_spark.operators.semdedup import semantic_dedup

    with pytest.raises(ValueError, match="block"):
        semantic_dedup(_load(spark), threshold=0.4, block=0)
