"""Semantic deduplication: k-means clustering over an embedding
column, then near-duplicate pruning INSIDE each cluster (the SemDeDup
recipe, Abbas et al. 2023, arXiv:2303.09540).

Extends the engine's dedup family (dedup.py: exact / MinHash / SimHash
/ embedding-LSH) with the clustered-semantic variant a training-data
pipeline uses to prune *meaning-level* duplicates: cluster the corpus
with a coarse k-means, and within each cluster drop every item whose
cosine to an earlier-kept candidate exceeds a threshold.  Clustering
bounds the quadratic pairwise term to cluster size — the whole point
of the recipe at 10^12-row scale.

Determinism contract (what makes the DuckDB driver-row oracle possible
— same device as curation.py's quantized thresholds):

* seeds = the ``k`` embeddings with the SMALLEST ids, cell = rank in
  ascending id order (no RNG);
* each Lloyd round assigns by argmax cosine (ties -> lowest cell id)
  and recomputes centroids as the elementwise mean of the RAW member
  embeddings, ROUNDED to 6 decimals — quantized centroids make the
  Spark (numpy) and oracle (SQL AVG) rounds bit-agree instead of
  drifting on float association order;
* dominance is non-recursive: b is dropped iff SOME same-cell a with
  ``id_a < id_b`` has ``cos(a, b) >= threshold`` — dropped items still
  dominate later ones, so the rule is a pure pairwise predicate (plain
  SQL), not a sequential greedy scan.  (The paper keeps one arbitrary
  member per duplicate group; lowest-id is this engine's deterministic
  choice throughout, cf. dedup.py.)

Scale posture: the fit shuffles only ``k * dim * n_partitions`` tiny
partial-sum rows per round (never corpus vectors — same shape as
similarity.fit_ivf_centroids); assignment is one Arrow matmul per
batch with the ``k x dim`` centroid matrix broadcast by closure; the
prune is ONE shuffle on the cell id and a per-cell Gram matrix.  Cell
sizes are controlled by ``k`` (choose ``k ~ n / target_cell_size``);
a cell that is still too hot can be pre-bucketed with the LSH
signature from dedup.embedding_neardup_pairs before the Gram step.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_kmeans_quantized(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic quantized k-means; returns a (k, dim) float64
    centroid matrix (UNnormalized — cosine assignment is invariant to
    centroid scale, so normalization would only add a float surface).

    Seeds are the ``k`` lowest-id embeddings; every mean is rounded to
    6 decimals (see module docstring).  Each round is one job emitting
    per-partition partial sums, reduced JVM-side via posexplode +
    groupBy — only ``k * dim`` doubles reach the driver."""
    from .similarity import lloyd_partial_round

    seeds = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    cent = np.vstack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in seeds]
    )

    for _ in range(iters):
        sums, cnts = lloyd_partial_round(
            corpus, vec_col, _normed(cent), accumulate_raw=True
        )
        new = cent.copy()  # empty cells keep their previous centroid
        live = cnts > 0
        new[live] = np.round(sums[live] / cnts[live, None], 6)
        cent = new
    return cent


def _normed(cent: np.ndarray) -> np.ndarray:
    return cent / np.maximum(
        np.linalg.norm(cent, axis=1, keepdims=True), 1e-12
    )


def semantic_dedup(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 1,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
    block: int = 1024,
) -> DataFrame:
    """SemDeDup over ``corpus``: returns ``(id, cell, kept)`` for every
    row — ``kept = false`` iff some same-cell row with a lower id has
    cosine >= ``threshold`` (survivors = ``WHERE kept``).

    Pass precomputed ``centroids`` to skip the fit (write-time at
    scale, exactly like similarity.ivf_topk).  ``block`` bounds the
    per-task Gram working set (block x cell_size doubles)."""
    from .similarity import _cell_udf

    if block < 1:
        # block <= 0 would either skip the scan entirely (everything
        # silently kept) or crash inside the Arrow UDF
        raise ValueError(f"block must be >= 1, got {block}")
    cent = (
        fit_kmeans_quantized(corpus, k, iters, vec_col, id_col)
        if centroids is None
        else centroids
    )
    # _cell_udf assigns by argmax dot(v̂, c); pre-normalizing the
    # centroids makes that argmax COSINE, ties to the lowest cell
    assigned = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _cell_udf(_normed(cent))(F.col(vec_col)).alias("cell"),
    )

    tau = float(threshold)

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        # Blocked lower-triangle scan: row i is dominated iff
        # max_{j<i} cos(i, j) >= tau (ALL earlier rows count, kept or
        # not — the non-recursive contract).  A full m x m Gram would
        # allocate O(m^2) doubles per task (gigabytes for a 15k-row
        # cell) and bottleneck on memory bandwidth, not flops; the
        # blocked form peaks at block x m, computes only the lower
        # triangle (half the flops), and keeps a running row-max.
        pdf = pdf.sort_values("id", kind="stable")
        mat = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        n = mat.shape[0]
        dominated = np.zeros(n, dtype=bool)
        # prefix panels are additionally chunked along the column
        # (earlier-row) axis so each sims panel stays cache-resident
        # (block x chunk doubles, ~8 MB) instead of streaming a
        # block x m panel (~100s of MB at 15k-row cells) through DRAM
        # — the Gram scan is bandwidth-bound, not flops-bound
        chunk = 2048
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            dom = np.zeros(hi - lo, dtype=bool)
            blk = mat[lo:hi]
            for c0 in range(0, lo, chunk):  # strictly-earlier: no mask
                c1 = min(c0 + chunk, lo)
                dom |= ((blk @ mat[c0:c1].T) >= tau).any(axis=1)
            # vs earlier rows INSIDE this block: strict lower
            # triangle as a boolean mask, NOT np.tril value padding
            # (its zeros would count as pairs for tau <= 0)
            diag = blk @ blk.T
            mask = np.tril(np.ones(diag.shape, dtype=bool), -1)
            dom |= ((diag >= tau) & mask).any(axis=1)
            dominated[lo:hi] = dom
        return pd.DataFrame(
            {
                "id": pdf["id"].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "kept": ~dominated,
            }
        )

    out_schema = "id long, cell int, kept boolean"
    return (
        assigned.groupBy("cell")
        .applyInPandas(dedup_cell, out_schema)
        .withColumnRenamed("id", id_col)
    )
