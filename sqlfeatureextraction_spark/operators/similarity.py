"""Approximate nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the full corpus, ranked with a window function; the dot
product is computed in an Arrow pandas UDF as one numpy matmul per
batch (the pure built-in ``F.aggregate``/``zip_with`` formulation is
also provided for oracle parity — it stays JVM-side but evaluates
per-element expression trees, slower than BLAS for wide vectors).

Scale paths:
- LSH-bucketed search (random hyperplane signatures, probe = query
  bucket) — candidates come from an equi-join on the bucket id, so the
  corpus is never crossed with the query set.
- IVF (inverted-file) search — spherical k-means coarse quantizer fit
  distributed (per-partition Arrow partial sums, nlist·P tiny rows
  reduced JVM-side), each vector assigned to its nearest-centroid
  cell, queries probe their n_probe nearest cells; candidates again
  come from an equi-join on the cell id.  With n_probe == nlist the
  probe set covers every cell and the result is exactly brute force —
  the identity the driver-row oracle pins; recall at n_probe < nlist
  is pinned in pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_col(a, b):
    """Pure built-in cosine between two array<float> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    den = na * nb
    return F.when(den > 0, dot / den).otherwise(F.lit(0.0))


def _cosine_matrix_udf(query_vecs: np.ndarray):
    """cosine(corpus_vec, Q) for all queries at once: one BLAS matmul
    per Arrow batch; returns array<double> of per-query cosines."""
    qn = query_vecs / np.maximum(
        np.linalg.norm(query_vecs, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def cos_all(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ qn.T  # (batch, n_queries)
        return pd.Series(list(sims))

    return cos_all


def brute_force_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine for a driver-provided query list.

    One corpus scan, one matmul per batch, then per-query top-k via
    window row_number on (sim desc, id asc).  Shuffle = k·|Q| rows.
    """
    qids = [q[0] for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    cos_all = _cosine_matrix_udf(qmat)

    sims = corpus.select(
        F.col(id_col), cos_all(F.col(vec_col)).alias("sims")
    ).select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qids]).alias("query_id"),
                F.col("sims").alias("cos"),
            )
        ).alias("z"),
    ).select(
        F.col("z.query_id").alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(F.col("z.cos"), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id", "cos")
    )


def lloyd_partial_round(
    corpus: DataFrame,
    vec_col: str,
    cent_norm: np.ndarray,
    accumulate_raw: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """One distributed Lloyd round, shared by the IVF quantizer and
    semdedup's quantized k-means: assign each vector to its
    argmax-cosine cell of ``cent_norm`` (pre-normalized (k, dim)), and
    return per-cell member sums + counts.  ONE job: an Arrow
    ``mapInPandas`` emits per-partition partial sums (≤ k rows per
    partition, k·dim doubles), reduced JVM-side via posexplode +
    groupBy(cell, pos) — only k·dim tiny rows ever reach the driver,
    never corpus vectors.  ``accumulate_raw`` sums raw member vectors
    (semdedup's mean-of-raw contract); the default sums L2-normalized
    members (the spherical-k-means update)."""
    k_eff, dim = cent_norm.shape

    def partials(batches, _c=cent_norm):
        sums = np.zeros((k_eff, dim))
        cnts = np.zeros(k_eff, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            raw = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = raw / np.maximum(
                np.linalg.norm(raw, axis=1, keepdims=True), 1e-12
            )
            cells = np.argmax(vn @ _c.T, axis=1)
            np.add.at(sums, cells, raw if accumulate_raw else vn)
            cnts += np.bincount(cells, minlength=k_eff)
        nz = np.nonzero(cnts)[0]
        yield pd.DataFrame(
            {
                "cell": nz.astype("int32"),
                "cnt": cnts[nz],
                "vsum": [sums[i].tolist() for i in nz],
            }
        )

    red = (
        corpus.select(vec_col)
        .mapInPandas(partials, "cell int, cnt long, vsum array<double>")
        .select("cell", "cnt", F.posexplode("vsum").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.sum("v").alias("s"), F.sum("cnt").alias("c"))
        .collect()
    )
    sums = np.zeros((k_eff, dim))
    cnts = np.zeros(k_eff, dtype=np.int64)
    for r in red:
        sums[r["cell"], r["pos"]] = r["s"]
        if r["pos"] == 0:
            cnts[r["cell"]] = r["c"]
    return sums, cnts


def fit_ivf_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Spherical k-means coarse quantizer, fit distributed.

    Deterministic seeding (the ``nlist`` rows with the smallest
    ``xxhash64(id)``), then ``iters`` Lloyd rounds via
    ``lloyd_partial_round``.  Empty cells keep their previous
    centroid.  Returns L2-normalized (nlist, dim)."""
    seeds = (
        corpus.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h", id_col)
        .limit(nlist)
        .collect()
    )
    cent = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in seeds])
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)

    for _ in range(iters):
        sums, cnts = lloyd_partial_round(corpus, vec_col, cent)
        new = cent.copy()
        live = cnts > 0
        new[live] = sums[live] / cnts[live, None]
        new /= np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cent = new
    return cent


def _cell_udf(cent: np.ndarray):
    """nearest-centroid cell id per vector (argmax cosine, one matmul
    per Arrow batch; ties break to the lowest cell id via argmax)."""

    @F.pandas_udf(T.IntegerType())
    def cell_of(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mat @ cent.T, axis=1).astype(np.int32))

    return cell_of


def ivf_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """ANN top-k via an IVF coarse quantizer.

    The corpus is assigned to ``nlist`` cells once (write-time at
    scale — pass precomputed ``centroids`` to skip the fit); each query
    probes its ``n_probe`` nearest cells, candidates come from an
    equi-join on the cell id (broadcast of the tiny (query, cell) probe
    table — the corpus is never crossed with the query set), exact
    cosine rank inside the probed cells.  ``n_probe == nlist`` probes
    everything and is exactly brute force."""
    cent = (
        fit_ivf_centroids(corpus, nlist, iters, vec_col, id_col)
        if centroids is None
        else centroids
    )
    qids = [q[0] for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(qn @ cent.T), axis=1, kind="stable")
    probe_rows = [
        (qid, int(c))
        for qid, row in zip(qids, order)
        for c in row[: min(n_probe, cent.shape[0])]
    ]
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id int, cell int")

    assigned = corpus.select(
        F.col(id_col), F.col(vec_col), _cell_udf(cent)(F.col(vec_col)).alias("cell")
    )
    cand = assigned.join(F.broadcast(probes), "cell").select(
        "query_id", F.col(id_col).alias("neighbor_id"), vec_col
    )
    cos_all = _cosine_matrix_udf(qmat)
    sims = cand.withColumn("sims", cos_all(F.col(vec_col))).select(
        "query_id",
        "neighbor_id",
        F.round(
            F.element_at(
                "sims",
                F.array_position(
                    F.array(*[F.lit(q) for q in qids]), F.col("query_id")
                ).cast("int"),
            ),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id", "cos")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: random-hyperplane bucket + exact rank inside bucket.

    Recall < 1 by construction; multi-probe = flipping one signature
    bit per probe.  The corpus is bucketed once (write-time at scale);
    queries broadcast as a tiny bucket list."""
    first = corpus.select(F.size(vec_col).alias("d")).first()
    dim = first["d"]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    @F.pandas_udf(T.LongType())
    def bucket(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        bits = (mat @ planes.T) > 0
        return pd.Series(
            (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64))
            .sum(axis=1)
            .astype(np.int64)
        )

    qids = [q[0] for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    qbits = (qmat @ planes.T) > 0
    qbuckets = (
        (qbits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64))
        .sum(axis=1)
        .astype(np.int64)
    )
    # query dim table incl. 1-bit-flip probes
    probe_rows = []
    for qid, b in zip(qids, qbuckets.tolist()):
        probe_rows.append((qid, b))
        for bit in range(n_planes):
            probe_rows.append((qid, b ^ (1 << bit)))
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id int, bkt long").distinct()

    cos_all = _cosine_matrix_udf(qmat)
    bucketed = corpus.select(
        F.col(id_col), F.col(vec_col), bucket(F.col(vec_col)).alias("bkt")
    )
    cand = bucketed.join(F.broadcast(probes), "bkt").select(
        "query_id", F.col(id_col).alias("neighbor_id"), vec_col
    )
    sims = cand.withColumn("sims", cos_all(F.col(vec_col))).select(
        "query_id",
        "neighbor_id",
        F.round(
            F.element_at(
                "sims",
                # position of this row's query in the query matrix (1-based)
                F.array_position(
                    F.array(*[F.lit(q) for q in qids]), F.col("query_id")
                ).cast("int"),
            ),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id", "cos")
    )
