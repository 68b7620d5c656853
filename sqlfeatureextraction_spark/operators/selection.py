"""Data-selection operators: DSIR-style importance resampling.

DSIR (Xie et al., NeurIPS 2023, "Data Selection for Language Models
via Importance Resampling") selects pretraining documents whose
hashed-n-gram distribution looks like a small TARGET corpus: fit
bag-of-hashed-ngram unigram models p_target and p_raw, weight every
raw document by its log importance ratio

    logw(d) = sum_b n_b(d) * ( ln p_target(b) - ln p_raw(b) )

over hash buckets b, then take the top-k (deterministic variant) or
Gumbel-top-k (sampling-without-replacement variant).  This is the
label-free "make the crawl look like Wikipedia" selection step that
sits next to the quality/NLL signals (operators/stats.py) in a
training-data pipeline; it extends the reference's query-gating
hygiene surface (rdr/StringCleaner.java:11-23) the same way the rest
of operators/curation.py does.

Engine design rules (shared with curation.py / stats.py):

* the bucket key is a HEX STRING ``substr(md5(salt || shingle), 1,
  hex_digits)`` — identical in Spark and DuckDB, so the oracle
  replays the exact same featurization with zero integer-conversion
  dialect issues (the domain_mix_sample trick); B = 16**hex_digits.
* everything hot is built-in column functions; the only driver-side
  state is the two B-bounded bucket-count tables (collected once each
  — the fit_range_bins bucket-count-sized-collect pattern), so each
  corpus is scanned exactly once for the fit and once for scoring.
* determinism: no RNG state anywhere.  The Gumbel variant derives its
  uniforms from md5(doc_id), so the "sample" is reproducible across
  runs, engines, and cluster sizes.

Scale posture (100 TB): one explode per corpus feeding a map-side
combined groupBy — the shuffle carries distinct (doc, bucket) rows,
never corpus token rows, and the bucket-model tables are bounded by B
(16^4 = 65,536 at the default), so the ratio join back onto per-doc
bucket counts is a broadcast.  The final selection is orderBy+limit
(TakeOrderedAndProject — per-partition top-k then a k-row merge, no
global sort materialization).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import shingles_col, tokens_col

__all__ = [
    "dsir_logweights",
    "dsir_topk",
    "dsir_gumbel_sample",
]


def _bucket_counts(
    docs: DataFrame,
    text_col: str,
    n: int,
    hex_digits: int,
    salt: str,
) -> DataFrame:
    """corpus → (bucket hex-string, c) counts over word n-gram hash
    buckets.  Shuffle carries distinct buckets only (map-side
    combine); output is bounded by B = 16**hex_digits rows."""
    sh = docs.select(
        F.explode(shingles_col(tokens_col(F.col(text_col)), n)).alias("sh")
    )
    return sh.select(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col("sh"))), 1, hex_digits
        ).alias("bucket")
    ).groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame,
    raw: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    hex_digits: int = 4,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document DSIR log importance weight.

    ``docs`` are the documents to score; ``target`` is the (small)
    corpus whose distribution we want; ``raw`` is the corpus the
    denominator model is fitted on (defaults to ``docs`` itself — the
    paper's setting, where the raw model is fitted on the pool being
    selected from).  Both models are add-``alpha`` smoothed over the
    full B-bucket space, so buckets unseen in either corpus still get
    mass and the ratio is defined everywhere.

    Output: (id_col, n_shingles, logw) with logw rounded to 6dp —
    rounding the value (and therefore the dsir_topk ORDER KEY) is
    what lets a float score hash-match DuckDB exactly despite ln()
    last-ulp and summation-order differences (the tfidf_topk rule).
    Documents with fewer than ``n`` tokens have no shingles and score
    logw = 0.0 (neutral), kept so the output covers every input row.
    """
    if raw is None:
        raw = docs
    B = 16**hex_digits
    if B > 1_048_576:
        raise ValueError("hex_digits > 5 makes the model collect unbounded")
    # the two bucket-count model tables are bounded by B rows, so they
    # are collected ONCE each and the smoothed log-ratio table is
    # built driver-side (the fit_range_bins bucket-count-sized-collect
    # pattern) — each corpus is scanned exactly once for the fit, and
    # no count lineage is ever re-executed across jobs
    tb = {
        r["bucket"]: r["c"]
        for r in _bucket_counts(target, text_col, n, hex_digits, salt).collect()
    }
    rb = {
        r["bucket"]: r["c"]
        for r in _bucket_counts(raw, text_col, n, hex_digits, salt).collect()
    }
    n_t, n_r = sum(tb.values()), sum(rb.values())
    lt, lr_den = math.log(n_t + alpha * B), math.log(n_r + alpha * B)
    ratio_rows = [
        (
            b,
            (math.log(tb.get(b, 0) + alpha) - lt)
            - (math.log(rb.get(b, 0) + alpha) - lr_den),
        )
        for b in set(tb) | set(rb)
    ]
    spark = docs.sparkSession
    ratio = spark.createDataFrame(ratio_rows, "bucket string, lr double")
    # a scored doc's bucket can miss BOTH model tables only when docs
    # is not the raw corpus; the smoothed ratio there is a constant
    default_lr = math.log(alpha / (n_t + alpha * B)) - math.log(
        alpha / (n_r + alpha * B)
    )
    per_doc_bucket = (
        docs.select(
            F.col(id_col),
            F.explode(
                shingles_col(tokens_col(F.col(text_col)), n)
            ).alias("sh"),
        )
        .select(
            id_col,
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col("sh"))),
                1,
                hex_digits,
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    scored = (
        per_doc_bucket.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("nb").cast("bigint").alias("n_shingles"),
            F.sum(
                F.col("nb") * F.coalesce(F.col("lr"), F.lit(default_lr))
            ).alias("_logw"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shingles"), F.lit(0).cast("bigint")).alias(
                "n_shingles"
            ),
            F.round(F.coalesce(F.col("_logw"), F.lit(0.0)), 6).alias("logw"),
        )
    )


def dsir_topk(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    **kw,
) -> DataFrame:
    """Deterministic DSIR selection: the k documents with the highest
    rounded log importance weight, ties broken by id ascending — the
    6dp-rounded ORDER KEY is shared with the DuckDB oracle so the
    ranking is cross-engine exact.  orderBy+limit compiles to
    TakeOrderedAndProject (per-partition heap + k-row merge)."""
    id_col = kw.get("id_col", "doc_id")
    w = dsir_logweights(docs, target, **kw)
    return w.orderBy(F.desc("logw"), F.asc(id_col)).limit(k)


def dsir_gumbel_sample(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    temperature: float = 1.0,
    gumbel_salt: str = "dsir-gumbel",
    **kw,
) -> DataFrame:
    """Gumbel-top-k importance RESAMPLING (the paper's sampling
    without replacement): key = logw/temperature + Gumbel(0,1), take
    the k largest keys.  The Gumbel noise is derived from
    md5(doc_id) — u = first 8 md5 hex digits / 2^32, g = -ln(-ln u) —
    so the draw is deterministic and reproducible (no RNG state),
    while still being a faithful Gumbel sample over the hash's
    uniform output.  u is clamped away from {0,1} by the +0.5 offset
    on the 32-bit integer.  Pinned against a numpy/hashlib replay in
    pytest rather than DuckDB (the driver row uses dsir_topk)."""
    id_col = kw.get("id_col", "doc_id")
    w = dsir_logweights(docs, target, **kw)
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(gumbel_salt + ":"), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (u32 + F.lit(0.5)) / F.lit(float(2**32))
    key = F.col("logw") / F.lit(float(temperature)) - F.log(-F.log(u))
    return (
        w.withColumn("gumbel_key", F.round(key, 6))
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )


def calibrate_group_threshold(
    df: DataFrame,
    group_col: str,
    score_col: str,
    q: float = 0.75,
    accuracy: int = 1_000_000,
    keep: bool = True,
) -> DataFrame:
    """Per-group quantile threshold calibration — the curation step
    that turns a raw quality score into a per-domain/per-source KEEP
    decision: each group's cut is its own ``q``-quantile, so a noisy
    domain is filtered as aggressively as a clean one (absolute
    global cuts over-prune whole domains; per-group calibration is
    the standard fix).

    Spark-first: the thresholds are ONE GK-sketch aggregation
    (``percentile_approx`` — mergeable, map-side partial, one narrow
    shuffle carrying sketch states; at ``accuracy`` ≥ group size the
    sketch is EXACT and equals DuckDB's ``quantile_disc``, the same
    exactness identity the doc_len_quantiles row pins), then a
    BROADCAST join back (groups ≪ rows) and a codegen filter.  Rows
    with a NULL score drop (no rank).  With ``keep=False`` the
    filter is skipped and every row carries its group threshold —
    the audit view.

    Output: df's columns + (threshold, n_group).
    """
    thr = df.groupBy(group_col).agg(
        F.percentile_approx(score_col, float(q), int(accuracy)).alias(
            "threshold"
        ),
        F.count(score_col).alias("n_group"),
    )
    out = df.join(F.broadcast(thr), group_col)
    if keep:
        out = out.where(F.col(score_col) >= F.col("threshold"))
    return out
