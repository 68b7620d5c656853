"""Approximate nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the full corpus, ranked with a window function; the dot
product is computed in an Arrow pandas UDF as one numpy matmul per
batch (the pure built-in ``F.aggregate``/``zip_with`` formulation is
also provided for oracle parity — it stays JVM-side but evaluates
per-element expression trees, slower than BLAS for wide vectors).

Scale path: LSH-bucketed search (random hyperplane signatures, probe =
query bucket) — candidates come from an equi-join on the bucket id, so
the corpus is never crossed with the query set.
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
