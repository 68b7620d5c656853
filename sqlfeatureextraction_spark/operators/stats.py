"""Per-group distribution sketches: quantiles, distinct counts,
moments — the corpus-profiling pass a training-data pipeline runs
before choosing curation thresholds (length cutoffs, mixture rates,
dedup budgets).

Everything is a built-in JVM aggregate, so each sketch is a MERGEABLE
partial state with map-side combine — the profile of a 100-TB corpus
shuffles only ``n_groups x sketch_size``, never rows:

* quantiles: ``percentile_approx`` (Greenwald-Khanna) with rank error
  <= n/accuracy at O(accuracy * log n) memory.  With
  ``accuracy >= group size`` the sketch is EXACT and agrees
  element-for-element with a discrete quantile over the sorted group
  (DuckDB ``quantile_disc``) — the identity the driver row pins; the
  bounded-error regime at small accuracy is pinned in pytest.
* distinct values: ``approx_count_distinct`` (HyperLogLog++),
  relative error ~``rsd``; deterministic for a given value set (no
  RNG), error vs the exact count pinned in pytest.
* moments: count / mean / stddev / min / max (exact, constant state).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .curation import tokens_col

DEFAULT_PROBS: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)


def group_distribution_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float] = DEFAULT_PROBS,
    accuracy: int = 10_000,
    distinct_col: str | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """One pass over ``df`` → one row per group with
    ``n`` (exact count), ``q`` (array of ``probs`` quantiles of
    ``value_col``), ``mean``/``stddev``/``vmin``/``vmax``, and — when
    ``distinct_col`` is given — ``approx_distinct`` of that column.

    Exactly one shuffle, carrying only partial sketch states."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(
            value_col, list(probs), int(accuracy)
        ).alias("q"),
        F.round(F.avg(value_col), 4).alias("mean"),
        F.round(F.coalesce(F.stddev(value_col), F.lit(0.0)), 4).alias(
            "stddev"
        ),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    ]
    if distinct_col is not None:
        aggs.append(
            F.approx_count_distinct(distinct_col, rsd).alias(
                "approx_distinct"
            )
        )
    return df.groupBy(*group_cols).agg(*aggs)


def unigram_nll(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's
    own unigram model — the statistical quality signal (CCNet-style
    perplexity filtering uses a KenLM n-gram model; the unigram case
    is its exactly-SQL-expressible core): documents full of rare
    tokens score high, boilerplate scores low, and the score needs no
    labels.  ``nll = -mean_t ln(count(t) / total_tokens)``, fit and
    scored on the same corpus (so every token has mass — no OOV
    smoothing needed; for scoring against a FOREIGN model, join the
    model's count table instead of the self-fit).

    Output: (id, n_tok, nll rounded to 4dp); empty docs yield no row.

    Plan: one explode feeding (a) the token-count aggregate (map-side
    combine; distinct-token rows only) and (b) the scoring join on
    the token key, then a per-doc aggregate — the token_topk /
    substr_dup_frac shuffle family, all JVM."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("_cnt"))
    total = counts.agg(F.sum("_cnt")).collect()[0][0] or 1
    return (
        toks.join(counts, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tok"),
            F.round(
                -F.avg(F.log(F.col("_cnt") / F.lit(float(total)))), 4
            ).alias("nll"),
        )
    )


def bigram_nll(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log-likelihood of each bigram under
    the corpus's own conditional bigram model:
    ``nll = -mean_i ln( cnt(t_i, t_{i+1}) / cnt_prefix(t_i) )`` where
    ``cnt_prefix`` counts t_i occurrences AS a bigram prefix (so the
    conditionals sum to 1 and a doc's last token never skews the
    denominator).  The order-sensitive upgrade of unigram_nll —
    scrambled or templated text scores differently even at identical
    token frequencies.  Self-fit ⇒ every observed bigram has mass.

    Output: (id, n_bigrams, nll rounded to 4dp); docs with < 2 tokens
    yield no row.

    Plan: one explode of word 2-shingles feeding the bigram-count
    aggregate, a prefix-count aggregate derived FROM the bigram
    counts (distinct-bigram rows, never corpus rows), and the scoring
    join — the same distinct-key shuffle family as token_topk."""
    from .curation import shingles_col

    toks = tokens_col(F.col(text_col))
    grams = docs.select(
        F.col(id_col),
        F.explode(shingles_col(toks, 2)).alias("bigram"),
    )
    counts = grams.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    prefix = counts.withColumn(
        "_prefix", F.split("bigram", " ").getItem(0)
    ).groupBy("_prefix").agg(F.sum("_cnt").alias("_pcnt"))
    model = counts.withColumn(
        "_prefix", F.split("bigram", " ").getItem(0)
    ).join(prefix, "_prefix")
    return (
        grams.join(model.select("bigram", "_cnt", "_pcnt"), "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(
                -F.avg(F.log(F.col("_cnt") / F.col("_pcnt"))), 4
            ).alias("nll"),
        )
    )


def trigram_nll_interpolated(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
) -> DataFrame:
    """Per-document mean NLL under a Jelinek-Mercer-interpolated
    trigram model fit on the corpus itself — the order-3 completion of
    the unigram/bigram quality ladder (CCNet filters on a KenLM 5-gram
    perplexity; JM interpolation is its exactly-SQL-expressible
    smoothing):

      P(t3 | t1 t2) = l3 * cnt(t1 t2 t3)/cnt_prefix(t1 t2)
                    + l2 * cnt(t2 t3)/cnt_prefix(t2)
                    + l1 * cnt(t3)/total_tokens

    where each ``cnt_prefix`` counts occurrences AS that n-gram's
    prefix (conditionals sum to 1), and the backoff terms give unseen
    contexts mass — self-fit means every scored trigram was observed,
    but interpolation still reshapes scores toward robustness exactly
    as in the real filter.  ``nll = -mean ln P`` over the doc's
    trigrams, rounded to 4dp; docs with < 3 tokens yield no row.

    Plan: one explode of word 3-shingles; ALL model tables (trigram,
    bigram, bigram-prefix, unigram counts) are aggregates over
    distinct-n-gram rows derived from the trigram counts or one token
    explode — never corpus-row joins; scoring is three key-partitioned
    joins on n-gram suffix keys then a per-doc aggregate.  total is
    the one driver-side scalar (as unigram_nll).
    """
    from .curation import shingles_col

    l3, l2, l1 = (float(x) for x in lambdas)
    if abs(l3 + l2 + l1 - 1.0) > 1e-9:
        raise ValueError(f"lambdas must sum to 1, got {lambdas}")
    toks = tokens_col(F.col(text_col))
    tri = docs.select(
        F.col(id_col), F.explode(shingles_col(toks, 3)).alias("tri")
    )
    # model tables, all over distinct n-gram rows
    tri_cnt = tri.groupBy("tri").agg(F.count(F.lit(1)).alias("_c3"))
    parts = tri_cnt.select(
        "tri",
        "_c3",
        F.split("tri", " ").alias("_w"),
    ).select(
        "tri",
        "_c3",
        F.concat_ws(" ", F.col("_w")[0], F.col("_w")[1]).alias("_p12"),
        F.concat_ws(" ", F.col("_w")[1], F.col("_w")[2]).alias("_s23"),
        F.col("_w")[1].alias("_w2"),
        F.col("_w")[2].alias("_w3"),
    )
    # prefix(t1 t2): occurrences of (t1,t2) as a trigram prefix
    p12 = parts.groupBy("_p12").agg(F.sum("_c3").alias("_cp12"))
    # bigram (t2 t3) count and its prefix t2 — derived from trigram
    # counts they cover every scored position exactly (each trigram
    # occurrence contributes one (t2,t3) bigram occurrence)
    b23 = parts.groupBy("_s23").agg(F.sum("_c3").alias("_c23"))
    p2 = parts.groupBy("_w2").agg(F.sum("_c3").alias("_cp2"))
    # unigram t3 over the whole corpus token stream
    uni = docs.select(F.explode(toks).alias("_w3")).groupBy("_w3").agg(
        F.count(F.lit(1)).alias("_c1")
    )
    total = uni.agg(F.sum("_c1")).collect()[0][0] or 1
    model = (
        parts.join(p12, "_p12")
        .join(b23, "_s23")
        .join(p2, "_w2")
        .join(uni, "_w3")
        .select(
            "tri",
            (
                F.lit(l3) * F.col("_c3") / F.col("_cp12")
                + F.lit(l2) * F.col("_c23") / F.col("_cp2")
                + F.lit(l1) * F.col("_c1") / F.lit(float(total))
            ).alias("_p"),
        )
    )
    return (
        tri.join(model, "tri")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_trigrams"),
            F.round(-F.avg(F.log("_p")), 4).alias("nll"),
        )
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` terms by tf-idf — the classic
    keyword-extraction / document-signature pass:
    ``score = (cnt_dt / n_tok_d) * ln(N / df_t)`` with N = total input
    documents and df_t = number of documents containing the term.

    Determinism contract (shared verbatim with the DuckDB oracle):
    ranking is by ``round(score, 6)`` desc then token asc — the
    rounding makes the order key identical across engines whose
    ``ln`` differs in the last ulp, and the token tie-break uniquifies
    everything closer than 1e-6.  Emitted ``score`` is the same
    6dp-rounded value.

    Output: (id, rk, token, cnt, df, score); documents with no tokens
    yield no rows.

    Plan shape: one explode → per-(doc, token) count (map-side
    combine) feeding BOTH the per-doc length aggregate and the
    document-frequency aggregate (each over distinct (doc, token)
    rows, never corpus rows), then two key-partitioned joins back and
    a per-doc top-k window over distinct tokens only.  N is the one
    driver-side scalar (a count, like unigram_nll's total)."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    n_docs = docs.count()
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("cnt"))
    n_tok = tf.groupBy(id_col).agg(F.sum("cnt").alias("_n_tok"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(n_tok, id_col)
        .join(dfreq, "token")
        .withColumn(
            "score",
            F.round(
                F.col("cnt")
                / F.col("_n_tok")
                * F.log(F.lit(float(n_docs)) / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            F.col(id_col),
            "rk",
            "token",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("df").cast("long").alias("df"),
            "score",
        )
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 lexical retrieval: the ``k`` documents scoring highest
    against a bag-of-words ``query`` under Okapi BM25 with the
    Robertson/Lucene idf::

        idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        s(d, t) = idf(t) * cnt * (k1+1) / (cnt + k1*(1 - b + b*dl/avgdl))

    where ``cnt`` is t's count in d, ``dl`` the document token length,
    ``avgdl`` the corpus mean length, ``N`` the corpus size.  This is
    the retrieval complement to the embedding-ANN family
    (operators/similarity.py): the sparse/lexical leg of the standard
    hybrid retrieval stack, and the text-side dual of
    :func:`tfidf_topk` (which extracts keywords per document; this
    ranks documents per query).

    Determinism contract (the tfidf_topk rule, shared verbatim with
    the DuckDB oracle): the query is tokenized with the same
    lowercase/space tokenizer as the corpus, duplicate query terms
    collapse (set semantics), and ranking is by ``round(score, 6)``
    desc then id asc, so the order key is identical across engines
    whose ``ln`` differs in the last ulp.

    Plan shape (one corpus scan, shuffles carry only query-matched
    rows): ``dl`` rides the explode as ``size(tokens)`` — computed
    narrow, never joined; rows are filtered to the query's term set
    BEFORE the first shuffle, so the per-(doc, term) count aggregation
    (map-side combine) touches only documents containing a query term;
    ``df_t`` is a |Q|-row aggregate broadcast back; the final top-k is
    orderBy+limit = TakeOrderedAndProject (per-partition heap + k-row
    merge, no global sort).  N and total token count are the two
    driver-side scalars (one agg — the unigram_nll total pattern).
    Documents matching no query term never reach any shuffle and are
    absent from the output (score would be 0).

    Output: (id_col, n_terms_matched, score).
    """
    terms = sorted({t for t in query.lower().split(" ") if t})
    if not terms:
        raise ValueError("query has no terms")
    stats = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens_col(F.col(text_col)))).alias("tot"),
    ).collect()[0]
    n_docs = int(stats["n"])
    avgdl = float(stats["tot"] or 0) / max(n_docs, 1)
    toks = docs.select(
        F.col(id_col),
        F.size(tokens_col(F.col(text_col))).alias("dl"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    ).where(F.col("token").isin(*terms))
    tf = toks.groupBy(id_col, "dl", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    part = idf * (
        F.col("cnt")
        * F.lit(k1 + 1.0)
        / (
            F.col("cnt")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl") / F.lit(avgdl)
            )
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.round(F.sum(part), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def token_topk(
    docs: DataFrame,
    k: int = 20,
    group_cols: Sequence[str] = ("lang",),
    text_col: str = "text",
) -> DataFrame:
    """Per-group heavy hitters: the ``k`` most frequent tokens with
    deterministic tie-break (count desc, then token asc).  Output:
    group cols + (rk, token, cnt).

    Plan shape: explode → partial-aggregated count per (group, token)
    (map-side combine absorbs each partition's repeats before the
    shuffle) → top-k via row_number over the group.  The first shuffle
    carries one row per DISTINCT (group, token) per partition — the
    exact heavy-hitter path that stays cheap at corpus scale because
    natural-language token frequencies are Zipfian (the distinct set
    grows sublinearly).  The window's per-group sort is over distinct
    tokens only, never corpus rows."""
    counts = (
        docs.select(
            *group_cols,
            F.explode(tokens_col(F.col(text_col))).alias("token"),
        )
        .groupBy(*group_cols, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("cnt"), F.asc("token")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(*group_cols, "rk", "token", "cnt")
    )


def distribution_drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    accuracy: int = 1_000_000,
    smooth: float = 0.5,
    round_dp: int = 6,
) -> DataFrame:
    """Population Stability Index between a REFERENCE window and a
    CURRENT window of the same feature — the standard training-data /
    feature drift monitor (PSI < 0.1 stable, > 0.25 shifted).  Bins
    are the reference's own ``n_bins`` quantile breaks (equal-mass on
    ref), membership is ``count(breaks < value)`` with strict ``>``,
    shares are Laplace-smoothed by ``smooth`` so empty bins stay
    finite, and each bin's term is ``(q−p)·ln(q/p)``.

    Spark-first: breaks come from ONE exact-regime GK sketch
    aggregation (the quantile_disc identity) and are collected —
    a bounded, bin-count-sized driver read, the same class as the
    engine's bucket-count collects; binning is then a codegen
    ``sum(value > lit(b))`` chain (no join, no UDF), and each side
    reduces with one map-side-combinable groupBy.  The final
    ref×cur alignment joins two ≤ n_bins-row frames.  NULL values
    drop (no rank).

    Output: one row per bin — (bin_idx, ref_n, cur_n, ref_share,
    cur_share, psi_term) — plus the same total in ``psi`` on every
    row (sum over bins), everything rounded to ``round_dp``.
    """
    probs = [i / n_bins for i in range(1, n_bins)]
    brks = ref.where(F.col(value_col).isNotNull()).agg(
        F.percentile_approx(value_col, probs, int(accuracy)).alias("b")
    ).collect()[0]["b"]

    def binned(df, name):
        b = F.lit(0)
        for x in brks:
            b = b + (F.col(value_col) > F.lit(float(x))).cast("int")
        return (
            df.where(F.col(value_col).isNotNull())
            .groupBy(b.alias("bin_idx"))
            .agg(F.count(F.lit(1)).alias(f"{name}_n"))
        )

    bins = ref.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin_idx")
    )
    r = binned(ref, "ref")
    c = binned(cur, "cur")
    j = (
        bins.join(r, "bin_idx", "left")
        .join(c, "bin_idx", "left")
        .select(
            "bin_idx",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    tot_r = F.sum("ref_n").over(Window.partitionBy())
    tot_c = F.sum("cur_n").over(Window.partitionBy())
    p = (F.col("ref_n") + F.lit(smooth)) / (
        tot_r + F.lit(smooth * n_bins)
    )
    q = (F.col("cur_n") + F.lit(smooth)) / (
        tot_c + F.lit(smooth * n_bins)
    )
    term = (q - p) * F.log(q / p)
    out = j.select(
        "bin_idx",
        "ref_n",
        "cur_n",
        F.round(p, round_dp).alias("ref_share"),
        F.round(q, round_dp).alias("cur_share"),
        F.round(term, round_dp).alias("psi_term"),
        F.round(
            F.sum(term).over(Window.partitionBy()), round_dp
        ).alias("psi"),
    )
    return out


def _cms_buckets(key_col: str, depth: int, width: int):
    return F.array(
        *[
            F.pmod(
                F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width)
            ).cast("int")
            for i in range(depth)
        ]
    )


def countmin_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1 << 16
) -> DataFrame:
    """Build a count-min sketch over ``key_col`` occurrences: the
    sublinear-memory frequency summary (Cormode & Muthukrishnan 2005)
    — ``depth × width`` counters regardless of input size, mergeable
    by cell-wise addition, estimates never UNDER-count.

    Spark-first: each row scatters to ``depth`` (fn, bucket) cells
    via seeded ``xxhash64`` (JVM, deterministic) + posexplode; ONE
    map-side-combinable groupBy reduces to at most depth·width rows —
    at 100 TB the shuffle carries the sketch, not the data.  The
    sketch is itself a DataFrame (fn_idx, bucket, cnt), so merging
    two corpora's sketches is a unionByName + re-aggregate.
    """
    return (
        df.select(
            F.posexplode(_cms_buckets(key_col, depth, width)).alias(
                "fn_idx", "bucket"
            )
        )
        .groupBy("fn_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1 << 16,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: est(k) =
    min over the depth cells k hashes to — ≥ the true count always,
    = it when any one of k's cells is collision-free (at width ≫
    distinct keys the identity is exact, which is how the driver row
    oracles this against plain exact counts; the narrow-width
    over-count regime is pinned in pytest).

    The probe explodes each key to its depth cells and joins the
    (≤ depth·width-row) sketch — broadcast-sized by construction.
    Output: (key_col, est).
    """
    probes = keys.select(
        key_col,
        F.posexplode(_cms_buckets(key_col, depth, width)).alias(
            "fn_idx", "bucket"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["fn_idx", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def robust_outlier_flags(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.5,
    accuracy: int = 1_000_000,
    round_dp: int = 6,
) -> DataFrame:
    """Median/MAD robust outlier detection per group — the curation
    anomaly gate that, unlike mean/stddev z-scores, is not dragged by
    the outliers it is looking for: robust_z = 0.6745·(x − median) /
    MAD (the 0.6745 consistency constant makes it σ-comparable for
    normal data), flagged when |robust_z| > ``k``.

    Spark-first: TWO exact-regime GK medians (per-group median, then
    median of absolute deviations — each a mergeable one-shuffle
    sketch aggregation equal to DuckDB quantile_disc at accuracy ≥
    group size) with broadcast join-backs; the fact table is never
    re-shuffled.  Degenerate groups (MAD = 0, over half the mass at
    the median) get a NULL z and are flagged iff the value differs
    from the median at all — documented, deterministic, replayed in
    the oracle.  NULL values drop.

    Output: df's columns + (med, mad, robust_z, is_outlier).
    """
    med = df.groupBy(group_col).agg(
        F.percentile_approx(value_col, 0.5, int(accuracy)).alias("med")
    )
    j = df.where(F.col(value_col).isNotNull()).join(
        F.broadcast(med), group_col
    )
    dev = F.abs(F.col(value_col) - F.col("med"))
    mad = j.groupBy(group_col).agg(
        F.percentile_approx(dev, 0.5, int(accuracy)).alias("mad")
    )
    out = j.join(F.broadcast(mad), group_col)
    z = F.round(
        F.lit(0.6745) * (F.col(value_col) - F.col("med")) / F.col("mad"),
        round_dp,
    )
    return out.select(
        "*",
        F.when(F.col("mad") > 0, z).alias("robust_z"),
        F.when(F.col("mad") > 0, F.abs(z) > F.lit(float(k)))
        .otherwise(F.col(value_col) != F.col("med"))
        .alias("is_outlier"),
    )


def with_group_percent_rank(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Rank-based feature normalization per group — the
    distribution-free transform (quantile-uniform / rank scaling)
    model features use when raw magnitudes are incomparable across
    domains: SQL-standard ``percent_rank`` ((rank−1)/(n−1), ties
    share the rank, single-row groups get 0) plus ``cume_dist``
    (P(X ≤ x), the empirical CDF value).

    One window over the group key ordered by value — a single
    shuffle, codegen; both functions are SQL-standard so the oracle
    is definitionally identical.  NULL values sort first per Spark
    default and are dropped here instead (no rank), keeping both
    engines' NULL conventions out of the contract.

    Output: df's non-NULL-value rows + (pct_rank, cdf).
    """
    w = Window.partitionBy(group_col).orderBy(value_col)
    return (
        df.where(F.col(value_col).isNotNull())
        .withColumn(
            "pct_rank", F.round(F.percent_rank().over(w), round_dp)
        )
        .withColumn("cdf", F.round(F.cume_dist().over(w), round_dp))
    )


def vocab_coverage_curve(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
    round_dp: int = 6,
) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-budget diagnostic:
    for the ``top_k`` most frequent tokens (count desc, token asc on
    ties), each one's corpus share and the cumulative share a
    vocabulary truncated at that rank would cover.

    Spark-first: token counts are one explode + map-side-combinable
    groupBy; the top-k cut is ``orderBy(...).limit(k)`` — Spark
    plans TakeOrderedAndProject (per-partition heaps + driver-side
    k-merge, never a global sort); the cumulative sum then runs on
    the K-row result, where a single-partition window is bounded by
    construction (K is a parameter, not the data) — the same
    bounded-smallness argument as the engine's bucket-count
    collects.  The corpus total joins in as a broadcast scalar.

    Output: (rank 1-based, token, cnt, share, cum_share).
    """
    toks = df.select(
        F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(int(top_k))
    total = counts.agg(
        F.sum("cnt").cast("double").alias("_total")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "tok",
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), round_dp).alias(
                "share"
            ),
            F.round(
                F.sum("cnt").over(run) / F.col("_total"), round_dp
            ).alias("cum_share"),
        )
    )


def rolling_quantile(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    value_col: str,
    q: float = 0.5,
    n_rows: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """EXACT rolling discrete quantile over the trailing ``n_rows``
    observations per group — the windowed robust level estimate
    (rolling median and friends) feature pipelines prefer over
    rolling means when spikes are data, not noise.

    Spark has no exact quantile window aggregate, so this builds it
    from codegen HOFs on a bounded ROWS frame: ``collect_list`` over
    ``ROWS BETWEEN n_rows-1 PRECEDING AND CURRENT ROW`` →
    ``sort_array`` → ``element_at`` at the 1-based index
    ``max(1, ceil(n*q))`` — the discrete-quantile convention DuckDB's
    ``quantile_disc`` uses (pinned empirically: n=2,q=0.75→2nd
    element; n=4,q=0.6→3rd), so the oracle is the straight window
    aggregate.  Per-row state is bounded by the PARAMETER ``n_rows``
    (never the group size), the frame sort is O(n_rows log n_rows)
    inside whole-stage codegen, and the only exchange is the one
    window shuffle on ``group_col`` — at 100 TB this scales exactly
    like any lag feature.  NULL values are dropped before the window
    (both engines' aggregates skip NULLs anyway, but dropping keeps
    the frame's row count = observation count).

    Output: df's non-NULL-value rows + (roll_n, roll_q).
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(-(int(n_rows) - 1), 0)
    )
    vals = F.sort_array(F.collect_list(value_col).over(w))
    n = F.size(vals)
    idx = F.greatest(
        F.lit(1), F.ceil(n * F.lit(float(q))).cast("int")
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .withColumn("_vals", vals)
        .select(
            *df.columns,
            F.size("_vals").alias("roll_n"),
            F.round(
                F.element_at("_vals", idx).cast("double"), round_dp
            ).alias("roll_q"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    value_col: str,
    h: float = 4.0,
    round_dp: int = 6,
    quantize_dp: int | None = None,
) -> DataFrame:
    """One-sided CUSUM level-shift statistic per group — the
    sequential changepoint detector (Page 1954) a pipeline runs over
    per-entity metric streams to flag upward drifts (cost blowups,
    latency regressions, prompt-injection bursts) that pointwise
    z-scores miss because each individual value stays in range.

    The textbook recursion S_i = max(0, S_{i-1} + x_i - mu) looks
    inherently sequential, but with zero slack it has a closed
    prefix-sum form: S_i = P_i - min_{0<=j<=i} P_j (P_0 = 0 — the
    empty prefix MUST participate in the min, via least(0, ...),
    or a series starting above mu underreports) where
    P_i = sum_{t<=i} (x_t - mu).  That turns the detector into TWO
    window functions on ONE partitioning (running sum, then running
    min of that sum) — no recursion, no UDF, one exchange, all
    whole-stage codegen; the same trick the engine's context_budget
    and ewma_decay operators use to de-sequentialize recurrences.
    mu and sigma are the group's sample mean/stddev (one aggregate,
    broadcast join-back); rows are flagged when S_i > h*sigma.
    Degenerate groups (sigma = 0 or a single row) never flag.
    NULL values drop.

    ``quantize_dp`` selects the integer-exact path: values are
    quantized to that many decimal places and every intermediate —
    prefix sums, the running min, and the variance moments — is
    carried in scaled integers (DECIMAL(38,0), overflow-safe far
    past 10^12 rows x 10^4-scaled values).  mu never materializes as
    a double: the prefix P_k = sum_{t<=k}(x_t) - k*mu is computed as
    the exact integer n*S_k - k*S_n over a common denominator
    n*10^dp, and sigma comes from the exact moment pair (S, Q).
    Only ONE float division + sqrt happen per row, on identical
    exact integers — so the statistic is bit-identical across
    engines and partition-merge orders, where the double path's
    avg() is run-order dependent and its prefix sum amplifies ulp
    noise linearly until a ROUND boundary flips.  Use it whenever
    the output feeds a cross-engine equality gate and the data has
    fixed decimal granularity.

    Output: df's non-NULL-value rows + (cusum, is_shift).
    """
    if quantize_dp is not None:
        return _cusum_changepoint_exact(
            df, group_col, order_cols, value_col, h, round_dp,
            quantize_dp,
        )
    gstats = df.where(F.col(value_col).isNotNull()).groupBy(
        group_col
    ).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_samp(value_col).alias("_sigma"),
    )
    j = (
        df.where(F.col(value_col).isNotNull())
        .join(F.broadcast(gstats), group_col)
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prefix = F.sum(F.col(value_col) - F.col("_mu")).over(w)
    out = j.withColumn("_p", prefix).withColumn(
        # min over prefixes INCLUDING the empty prefix P_0 = 0 (least
        # with 0) — without it a series that starts above mu
        # underreports until the prefix first dips negative
        "cusum",
        F.round(
            F.col("_p")
            - F.least(F.lit(0.0), F.min("_p").over(w)),
            round_dp,
        ),
    )
    return out.select(
        *df.columns,
        "cusum",
        F.when(
            F.coalesce(F.col("_sigma"), F.lit(0.0)) > 0,
            F.col("cusum") > F.lit(float(h)) * F.col("_sigma"),
        )
        .otherwise(F.lit(False))
        .alias("is_shift"),
    )


def _cusum_changepoint_exact(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    value_col: str,
    h: float,
    round_dp: int,
    quantize_dp: int,
) -> DataFrame:
    """Integer-exact CUSUM (see cusum_changepoint's quantize_dp).

    Same plan shape as the double path — one group-key exchange, two
    running-frame window passes, whole-stage codegen throughout —
    but all accumulation is DECIMAL(38,0) integer arithmetic:

      v_i   = round(x_i * 10^dp)             (scaled long)
      num_k = n*S_k - k*S_n                  (P_k over denom n*10^dp)
      cusum = (num_k - least(0, min num))/(n*10^dp)   one fp divide
      var   = (n*Q - S^2) / (n*(n-1)*10^2dp)          exact moments

    Integer addition is associative, so partition-merge order and
    window-frame association cannot change a single bit; both the
    int->double conversion and the final divide/sqrt are IEEE
    correctly-rounded, hence deterministic across engines.
    """
    dec = "decimal(38,0)"
    scale = float(10 ** quantize_dp)
    nn = df.where(F.col(value_col).isNotNull())
    base = nn.withColumn(
        "_v", F.round(F.col(value_col) * (10 ** quantize_dp)).cast("long")
    )
    wg = Window.partitionBy(group_col)
    word = Window.partitionBy(group_col).orderBy(*order_cols)
    wrun = word.rowsBetween(Window.unboundedPreceding, 0)
    vd = F.col("_v").cast(dec)
    base = (
        base.withColumn("_n", F.count(F.lit(1)).over(wg))
        .withColumn("_s_all", F.sum(vd).over(wg))
        .withColumn("_q_all", F.sum(vd * F.col("_v")).over(wg))
        .withColumn("_k", F.row_number().over(word))
        .withColumn("_s_k", F.sum(vd).over(wrun))
    )
    num = (
        F.col("_n").cast(dec) * F.col("_s_k")
        - F.col("_k").cast(dec) * F.col("_s_all")
    )
    base = base.withColumn("_num", num)
    adj = F.col("_num") - F.least(
        F.lit(0).cast(dec), F.min("_num").over(wrun)
    )
    denom = F.col("_n").cast("double") * F.lit(scale)
    cusum = F.round(adj.cast("double") / denom, round_dp)
    var_num = (
        F.col("_n").cast(dec) * F.col("_q_all")
        - F.col("_s_all") * F.col("_s_all")
    )
    sigma = (
        F.sqrt(
            var_num.cast("double")
            / (
                F.col("_n").cast("double")
                * (F.col("_n") - F.lit(1)).cast("double")
            )
        )
        / F.lit(scale)
    )
    out = base.withColumn("cusum", cusum)
    return out.select(
        *df.columns,
        "cusum",
        F.when(
            (F.col("_n") > 1) & (var_num > 0),
            F.col("cusum") > F.lit(float(h)) * sigma,
        )
        .otherwise(F.lit(False))
        .alias("is_shift"),
    )


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus token distribution —
    the one-number naturalness diagnostic (natural language sits near
    slope -1; templated/synthetic corpora flatten, boilerplate-heavy
    ones steepen): OLS slope/intercept/r^2 of ln(count) on ln(rank),
    tokens ranked count-desc (token asc on ties).

    Spark-first: token counts are one explode + map-side-combinable
    groupBy; the count-desc global ranking runs through
    curation.exact_rank_prefix (range-repartition on the order key +
    per-partition local rank + closed-form offsets, driver traffic =
    one row per partition) — NOT a single-task unpartitioned Window,
    which would funnel the whole distinct vocabulary (10^8+ rows at
    100 TB) through one task; the fit itself is Spark's builtin
    ``regr_slope/regr_intercept/regr_r2`` aggregates — mergeable
    moment sums, so the regression never materializes anything.
    ``min_count`` trims the hapax tail where Zipf fits are known to
    break.  Both engines compute identical ln/moment arithmetic;
    6dp rounding absorbs summation-order ulps.

    Output: ONE row (n_tokens, slope, intercept, r2).
    """
    from .curation import exact_rank_prefix

    toks = df.select(
        F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    counts = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= int(min_count))
    )
    # count-desc, token-asc total order expressed ascending for the
    # range partitioner: (-cnt, tok)
    ranked = exact_rank_prefix(
        counts.withColumn("_negcnt", -F.col("cnt")),
        order_cols=["_negcnt", "tok"],
        rank_col="_rank",
    ).select(
        F.ln(F.col("_rank").cast("double")).alias("_lr"),
        F.ln(F.col("cnt").cast("double")).alias("_lc"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.regr_slope("_lc", "_lr"), round_dp).alias("slope"),
        F.round(F.regr_intercept("_lc", "_lr"), round_dp).alias(
            "intercept"
        ),
        F.round(F.regr_r2("_lc", "_lr"), round_dp).alias("r2"),
    )


def heaps_law(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 6,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(N) ~ K * N^beta over the
    corpus consumed in ``id_col`` order — the companion diagnostic to
    zipf_slope (natural text sits near beta 0.4-0.6; templated corpora
    flatten because new documents stop contributing new types, heavy
    boilerplate inflates K).  Both are one-number "is this corpus
    shaped like language" monitors a curation pipeline tracks across
    snapshots.

    The curve needs two global-order quantities per document — its
    ordinal ``rank`` and the running token total N(rank) — plus the
    running distinct-type total V(rank).  A naive plan buys all three
    with single-task unpartitioned Windows; here both passes use
    curation.exact_rank_prefix (range-repartition rank + prefix sum,
    driver traffic = one row per partition), and V comes from the
    classic distributed rewrite of "cumulative distinct": each type's
    FIRST-occurrence rank (one groupBy over the exploded corpus,
    vocabulary-sized output), counts per rank, left-join back onto the
    docs-sized rank spine, prefix-sum.  The corpus-sized explode feeds
    a map-side-combinable min() aggregate; everything that crosses a
    global order is docs-sized, never token-sized.  The fit itself is
    the builtin regr_* moment aggregates over (ln N, ln V).

    Output: ONE row (n_docs, beta, ln_k, r2).
    """
    from .curation import exact_rank_prefix, tokens_col

    per_doc = df.select(
        F.col(id_col).alias("_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    ).withColumn("_n_tok", F.size("_toks"))
    spine = exact_rank_prefix(
        per_doc, ["_id"], ["_n_tok"], rank_col="_rank", prefix="_N_"
    )
    firsts = (
        spine.select("_rank", F.explode("_toks").alias("_tok"))
        .groupBy("_tok")
        .agg(F.min("_rank").alias("_fr"))
        .groupBy("_fr")
        .agg(F.count(F.lit(1)).cast("double").alias("_nv"))
    )
    joined = (
        spine.select("_rank", F.col("_N__n_tok").alias("_N"))
        .join(firsts, spine["_rank"] == firsts["_fr"], "left")
        .select(
            "_rank", "_N", F.coalesce("_nv", F.lit(0.0)).alias("_nv")
        )
    )
    curve = exact_rank_prefix(
        joined, ["_rank"], ["_nv"], rank_col="_rank2", prefix="_V_"
    ).select(
        F.col("_N"), F.col("_V__nv").alias("_V")
    ).where((F.col("_N") > 0) & (F.col("_V") > 0))
    pts = curve.select(
        F.ln("_N").alias("_ln_n"), F.ln("_V").alias("_ln_v")
    )
    return pts.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.regr_slope("_ln_v", "_ln_n"), round_dp).alias("beta"),
        F.round(F.regr_intercept("_ln_v", "_ln_n"), round_dp).alias(
            "ln_k"
        ),
        F.round(F.regr_r2("_ln_v", "_ln_n"), round_dp).alias("r2"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information — the classic multiword-expression miner (Church &
    Hanks 1990): PMI(x,y) = ln( p(x,y) / (p(x) p(y)) ) with p(x,y)
    over adjacent token pairs and p(x), p(y) over unigrams.  A
    curation pipeline uses the top list to spot boilerplate phrases
    and tokenizer-merge candidates; ``min_count`` prunes the
    low-count tail where PMI is a noise amplifier.

    Spark-first plan: bigrams come from zipping the token array with
    itself shifted by one (slice + arrays_zip, pure per-row codegen —
    no self-join, no positional explode-join); pair and unigram
    counts are map-side-combinable groupBys whose outputs are
    TYPE-counts (bigram-type / vocabulary-sized, never corpus-sized);
    the ``min_count`` filter lands BEFORE the two token-keyed joins so
    the long tail never shuffles twice; corpus totals ride in as one
    broadcast 1-row aggregate.  Final top-k is orderBy+limit =
    TakeOrderedAndProject (per-partition heaps, no global sort).  The
    ORDER KEY is the 6dp-ROUNDED pmi (+ lexicographic tie-break) so
    cross-engine ln ulps can never reorder the cut — the same
    convention as bm25_topk/tfidf_topk.

    Output: top_k rows (w1, w2, pair_count, pmi), pmi-desc.
    """
    from .curation import tokens_col

    toks = df.select(tokens_col(F.col(text_col)).alias("_l"))
    totals = toks.agg(
        F.sum(F.size("_l")).cast("double").alias("_t1"),
        F.sum(F.greatest(F.size("_l") - 1, F.lit(0)))
        .cast("double")
        .alias("_t2"),
    )
    uni = (
        toks.select(F.explode("_l").alias("_tok"))
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
    )
    from .curation import adjacent_pairs_col

    pairs = (
        toks.select(
            F.explode(adjacent_pairs_col(F.col("_l"))).alias("_pr")
        )
        .select(
            F.col("_pr.a").alias("w1"), F.col("_pr.b").alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("pair_count"))
        .where(F.col("pair_count") >= float(min_count))
    )
    scored = (
        pairs.join(
            uni.select(
                F.col("_tok").alias("w1"), F.col("_c").alias("_cx")
            ),
            "w1",
        )
        .join(
            uni.select(
                F.col("_tok").alias("w2"), F.col("_c").alias("_cy")
            ),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.round(
                F.ln(
                    (F.col("pair_count") / F.col("_t2"))
                    / (
                        (F.col("_cx") / F.col("_t1"))
                        * (F.col("_cy") / F.col("_t1"))
                    )
                ),
                round_dp,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    ).limit(int(top_k))


def kl_drift(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    alpha: float = 0.5,
    round_dp: int = 6,
) -> DataFrame:
    """Per-slice unigram KL divergence from the corpus — the
    domain-shift monitor KL(p_g || q) with additive (Laplace-alpha)
    smoothing over the CORPUS vocabulary V: p_g(t) = (c_gt + a) /
    (n_g + a|V|), q(t) = (c_t + a) / (T + a|V|).  Complements
    psi_drift (which bins a numeric column) by measuring drift in the
    token distribution itself — the signal that flags a source whose
    LANGUAGE changed even when its metadata didn't.

    The textbook sum runs over every (group, vocab-type) pair —
    groups x |V| terms, almost all of them the "token absent from the
    slice" case.  Those absent terms collapse in closed form: with
    p0_g = a / (n_g + a|V|) constant per group,

      sum_absent = p0_g * [ (|V| - V_g) * ln p0_g - (Sq - Sq_g) ]

    where Sq = sum over V of ln q(t) (ONE corpus scalar) and V_g /
    Sq_g are per-group aggregates over the group's OBSERVED types.
    So the only join is group-counts x corpus-counts on the observed
    (group, token) pairs — type-counts, never corpus rows, never the
    groups x vocab cross product.  Everything else is
    map-side-combinable aggregates plus one broadcast 1-row scalar
    frame.  DuckDB replays the identical decomposition.

    Output: one row per group (group_col, n_tokens, vocab_seen, kl).
    """
    from .curation import tokens_col

    a = float(alpha)
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(tokens_col(F.col(text_col))).alias("_tok"),
    )
    # ONE corpus-sized shuffle: (group, token) counts; corpus counts
    # derive from it (type-count-sized re-aggregation, never a second
    # explode of the corpus)
    gcounts = toks.groupBy("_g", "_tok").agg(
        F.count(F.lit(1)).cast("double").alias("_cgt")
    )
    corpus = gcounts.groupBy("_tok").agg(
        F.sum("_cgt").alias("_ct")
    )
    scal = corpus.agg(
        F.sum("_ct").alias("_T"),
        F.count(F.lit(1)).cast("double").alias("_V"),
    )
    # ln q(t) needs the corpus scalars; Sq is then one more aggregate
    cq = corpus.crossJoin(F.broadcast(scal)).select(
        "_tok",
        (F.ln(F.col("_ct") + F.lit(a)) - F.ln(F.col("_T") + a * F.col("_V"))).alias(
            "_lnq"
        ),
    )
    sq = cq.agg(F.sum("_lnq").alias("_Sq"))
    obs = (
        gcounts.join(cq, "_tok")
        .groupBy("_g")
        .agg(
            F.sum("_cgt").alias("_ng"),
            F.count(F.lit(1)).cast("double").alias("_Vg"),
            F.sum("_lnq").alias("_Sqg"),
            # observed part needs p_g which needs n_g -> two-phase:
            # carry sufficient sums, finish after n_g is known
            F.sum((F.col("_cgt") + F.lit(a)) * F.ln(F.col("_cgt") + F.lit(a))).alias(
                "_s_plnp_num"
            ),
            F.sum((F.col("_cgt") + F.lit(a)) * F.col("_lnq")).alias(
                "_s_plnq_num"
            ),
        )
    )
    out = (
        obs.crossJoin(F.broadcast(scal))
        .crossJoin(F.broadcast(sq))
        .withColumn("_den", F.col("_ng") + a * F.col("_V"))
        .withColumn("_lnp0", F.ln(F.lit(a)) - F.ln("_den"))
        .withColumn(
            "_kl_obs",
            (
                F.col("_s_plnp_num")
                - (F.col("_ng") + a * F.col("_Vg")) * F.ln("_den")
                - F.col("_s_plnq_num")
            )
            / F.col("_den"),
        )
        .withColumn(
            "_kl_abs",
            (F.lit(a) / F.col("_den"))
            * (
                (F.col("_V") - F.col("_Vg")) * F.col("_lnp0")
                - (F.col("_Sq") - F.col("_Sqg"))
            ),
        )
    )
    return out.select(
        F.col("_g").alias(group_col),
        F.col("_ng").cast("long").alias("n_tokens"),
        F.col("_Vg").cast("long").alias("vocab_seen"),
        F.round(F.col("_kl_obs") + F.col("_kl_abs"), round_dp).alias("kl"),
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_dp: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between two named
    slices — the A/B gate a data pipeline runs before accepting a new
    source/filter ("did the quality metric move, beyond noise?").
    Welch (1947) rather than pooled-variance Student: corpus slices
    never have equal variances.

    Everything is two mergeable moment aggregates (count/mean/
    var_samp per slice, one map-side-combinable groupBy over exactly
    the two slices after a pushed-down filter) followed by closed-form
    scalar arithmetic — t statistic and Welch-Satterthwaite degrees of
    freedom — on a 2-row frame.  Nothing but the filtered slice rows
    ever shuffles, and only as partial moment states.

    Output: ONE row ALWAYS (n_a, n_b, mean_a, mean_b, t_stat, df) —
    an empty or degenerate (n < 2) slice yields n=0 / NULL moments and
    NULL t/df rather than zero rows, matching the mann_whitney_u /
    ks_test family convention.  NULL values drop; the oracle replays
    the same conditional-aggregate NULL algebra.
    """
    d = df.where(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    )
    # conditional aggregates (aggregate functions skip the NULLs the
    # when() produces), so an EMPTY slice still yields the documented
    # ONE row with n=0 and NULL t/df instead of zero rows
    va = F.when(F.col(group_col) == group_a, F.col(value_col))
    vb = F.when(F.col(group_col) == group_b, F.col(value_col))
    j = d.agg(
        F.count(va).alias("n_a"),
        F.avg(va).alias("_ma"),
        F.var_samp(va).alias("_va"),
        F.count(vb).alias("n_b"),
        F.avg(vb).alias("_mb"),
        F.var_samp(vb).alias("_vb"),
    )
    sa = F.col("_va") / F.col("n_a")
    sb = F.col("_vb") / F.col("n_b")
    t = (F.col("_ma") - F.col("_mb")) / F.sqrt(sa + sb)
    dof = ((sa + sb) * (sa + sb)) / (
        (sa * sa) / (F.col("n_a") - 1) + (sb * sb) / (F.col("n_b") - 1)
    )
    return j.select(
        "n_a",
        "n_b",
        F.round("_ma", round_dp).alias("mean_a"),
        F.round("_mb", round_dp).alias("mean_b"),
        F.round(t, round_dp).alias("t_stat"),
        F.round(dof, round_dp).alias("df"),
    )


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group Spearman rank correlation of two numeric columns —
    the monotonic-trend detector (robust to outliers and any monotone
    transform) a pipeline runs per entity, e.g. "is this user's
    metric drifting with time?".  Standard tie handling: fractional
    (average) ranks, then Pearson on the ranks.

    Spark-first: the average rank for ties is ``rank() + (tie_count -
    1)/2`` — one ordering window plus one tie-count window per axis,
    ALL FOUR on the same ``group_col`` partitioning (one exchange
    total, no corpus-wide ordering anywhere); the correlation is the
    builtin ``corr`` aggregate over the ranks.  Groups with < 2 rows
    or a constant axis yield NULL (both engines' sample-corr
    semantics).

    Output: one row per group (group_col, n, rho).
    """
    d = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(group_col, x_col, y_col)

    def frac_rank(c: str) -> F.Column:
        wo = Window.partitionBy(group_col).orderBy(F.col(c))
        wt = Window.partitionBy(group_col, c)
        return F.rank().over(wo) + (F.count(F.lit(1)).over(wt) - 1) / 2.0

    ranked = d.select(
        F.col(group_col),
        frac_rank(x_col).alias("_rx"),
        frac_rank(y_col).alias("_ry"),
    )
    return ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("_rx", "_ry"), round_dp).alias("rho"),
    )


def llr_keywords(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_k: int = 10,
    min_count: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Per-slice characteristic keywords by Dunning's log-likelihood
    ratio (Dunning 1993) — the slice-vs-rest token-association G^2
    statistic over the 2x2 contingency (token in slice, token in rest,
    other tokens in slice, other tokens in rest).  The corpus-level
    complement of per-document tfidf_topk: "which tokens DEFINE source
    X" — the domain-signature / contamination-forensics pass.  Only
    OVERREPRESENTED tokens are kept (a/n_g > b/(N-n_g)); G^2 is robust
    at low counts where chi-square breaks, and ``min_count`` prunes
    the singleton tail.

    Scale shape: per-(slice, token) and per-token counts are map-side
    combinable groupBys whose outputs are TYPE-counts; the one join is
    type-keyed; slice totals (#groups rows) and the corpus scalar ride
    in broadcast; final per-slice top-k is a row_number window over
    the type-count table partitioned by slice.  ``0 * ln 0 = 0`` via
    CASE, identical in the oracle; the order key is the 6dp-ROUNDED
    llr + token tie-break so cross-engine ln ulps cannot reorder the
    cut.

    Output: top_k rows per group (group_col, token, cnt, llr).
    """
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(tokens_col(F.col(text_col))).alias("_tok"),
    )
    # ONE corpus-sized shuffle: (group, token) counts; corpus and
    # per-group totals both derive from it (type-count-sized)
    gcounts = toks.groupBy("_g", "_tok").agg(
        F.count(F.lit(1)).cast("double").alias("_a")
    )
    corpus = gcounts.groupBy("_tok").agg(F.sum("_a").alias("_ct"))
    gtot = gcounts.groupBy("_g").agg(F.sum("_a").alias("_ng"))
    scal = corpus.agg(F.sum("_ct").alias("_N"))

    def xlx(c):
        return F.when(c > 0, c * F.ln(c)).otherwise(F.lit(0.0))

    j = (
        gcounts.join(corpus, "_tok")
        .join(F.broadcast(gtot), "_g")
        .crossJoin(F.broadcast(scal))
        .withColumn("_b", F.col("_ct") - F.col("_a"))
        .withColumn("_c", F.col("_ng") - F.col("_a"))
        .withColumn(
            "_d", F.col("_N") - F.col("_ng") - F.col("_b")
        )
    )
    a, b, c, d, n = (F.col(x) for x in ("_a", "_b", "_c", "_d", "_N"))
    llr = 2.0 * (
        xlx(a)
        + xlx(b)
        + xlx(c)
        + xlx(d)
        - xlx(a + b)
        - xlx(c + d)
        - xlx(a + c)
        - xlx(b + d)
        + xlx(n)
    )
    scored = (
        j.where(
            (a >= float(min_count))
            & (a / F.col("_ng") > b / (n - F.col("_ng")))
        )
        .select(
            F.col("_g").alias(group_col),
            F.col("_tok").alias("token"),
            a.cast("long").alias("cnt"),
            F.round(llr, round_dp).alias("llr"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("llr"), F.asc("token")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(top_k))
        .drop("_rn")
    )


def fractional_rank_sums(vc: DataFrame) -> DataFrame:
    """Shared core of mann_whitney_u and fit.auc_score: given a
    DISTINCT-VALUE table (_v, _t = total count, _m = marked count),
    return the 1-row frame (_nm, _no, _rm, _ties) — marked/other
    totals, the marked rank sum under fractional (average) tie ranks,
    and the tie-correction sum(t^3 - t).  Ranks come from ONE
    range-repartition prefix pass (curation.exact_rank_prefix), never
    a row-level global ordering.  One definition so a tie-handling
    change can never make U and AUC disagree."""
    from .curation import exact_rank_prefix

    ranked = exact_rank_prefix(
        vc, ["_v"], ["_t"], rank_col="_fr_r", prefix="_fr_cum_"
    ).withColumn(
        "_avg_rank",
        F.col("_fr_cum__t") - F.col("_t") + (F.col("_t") + 1) / 2.0,
    )
    return ranked.agg(
        F.sum("_m").alias("_nm"),
        F.sum(F.col("_t") - F.col("_m")).alias("_no"),
        F.sum(F.col("_m") * F.col("_avg_rank")).alias("_rm"),
        F.sum(
            F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")
        ).alias("_ties"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_dp: int = 6,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two named slices — the
    nonparametric partner of welch_ttest (no normality assumption;
    the right A/B gate for heavy-tailed metrics like latency or
    document length), with the standard tie correction and normal
    approximation: U_a = R_a - n_a(n_a+1)/2,
    z = (U_a - n_a n_b / 2) / sigma,
    sigma^2 = (n_a n_b / 12) * ((n+1) - sum(t^3 - t) / (n (n-1))).

    Rank sums never rank ROWS: ties make every row of a value share
    the average rank, so R_a = sum_v count_a(v) * avg_rank(v) needs
    only the DISTINCT-VALUE table — per-value (total, slice-a) counts
    from one map-side-combinable groupBy, then avg_rank(v) =
    cum_before(v) + (t_v + 1)/2 from ONE range-repartition prefix sum
    over that distinct table (curation.exact_rank_prefix — no
    single-task Window even when the value domain is large).  The tie
    term sum(t^3 - t) rides the same table; everything after is a
    1-row closed form.

    Output: ONE row (n_a, n_b, u_stat, z).  NULL values drop;
    degenerate inputs (a slice empty, or all values tied so sigma = 0)
    yield NULL z.
    """
    d = df.where(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).cast("double").alias("_v"),
        (F.col(group_col) == group_a).cast("double").alias("_ia"),
    )
    vc = d.groupBy("_v").agg(
        F.count(F.lit(1)).cast("double").alias("_t"),
        F.sum("_ia").alias("_m"),
    )
    s = fractional_rank_sums(vc)
    na, nb = F.col("_nm"), F.col("_no")
    n = na + nb
    u = F.col("_rm") - na * (na + 1) / 2.0
    sig2 = (na * nb / 12.0) * (
        (n + 1) - F.col("_ties") / (n * (n - 1))
    )
    z = F.when(
        (na > 0) & (nb > 0) & (sig2 > 0),
        (u - na * nb / 2.0) / F.sqrt(sig2),
    )
    return s.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(u, round_dp).alias("u_stat"),
        F.round(z, round_dp).alias("z"),
    )


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_dp: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between two named
    slices — the distribution-equality gate that catches SHAPE changes
    (bimodality, tail thickening) the mean-based welch_ttest and the
    rank-location mann_whitney_u both miss; the third leg of the A/B
    inference family.  D = sup_v |F_a(v) - F_b(v)| evaluated at the
    observed distinct values (where a right-continuous step ECDF
    attains its sup), plus the scaled statistic
    K = sqrt(n_a n_b / (n_a + n_b)) * D that the asymptotic
    Kolmogorov distribution consumes.

    The ECDFs need cumulative per-slice counts over the value order —
    the same DISTINCT-VALUE prefix-sum shape as mann_whitney_u: one
    map-side-combinable groupBy to per-value (slice-a, slice-b)
    counts, ONE range-repartition prefix pass over that distinct
    table (curation.exact_rank_prefix), then a scalar max aggregate.
    Nothing row-global anywhere.

    Output: ONE row (n_a, n_b, d_stat, k_stat); NULL values drop;
    an empty slice yields NULL d_stat/k_stat.
    """
    from .curation import exact_rank_prefix

    d = df.where(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).cast("double").alias("_v"),
        (F.col(group_col) == group_a).cast("double").alias("_ia"),
    )
    vc = d.groupBy("_v").agg(
        F.sum("_ia").alias("_ca"),
        F.sum(1 - F.col("_ia")).alias("_cb"),
    )
    ranked = exact_rank_prefix(
        vc, ["_v"], ["_ca", "_cb"], rank_col="_vr", prefix="_cum_"
    )
    tot = vc.agg(
        F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb")
    )
    s = (
        ranked.crossJoin(F.broadcast(tot))
        .agg(
            F.max("_na").alias("_na"),
            F.max("_nb").alias("_nb"),
            F.max(
                F.abs(
                    F.col("_cum__ca") / F.col("_na")
                    - F.col("_cum__cb") / F.col("_nb")
                )
            ).alias("_d"),
        )
    )
    na, nb = F.col("_na"), F.col("_nb")
    dstat = F.when((na > 0) & (nb > 0), F.col("_d"))
    return s.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(dstat, round_dp).alias("d_stat"),
        F.round(
            F.sqrt(na * nb / (na + nb)) * dstat, round_dp
        ).alias("k_stat"),
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    round_dp: int = 6,
) -> DataFrame:
    """EXACT weighted discrete quantiles: q_p = min{ v : cumW(v) >=
    p * W } over the weight-cumulative value distribution — the
    quantile a pipeline actually wants when rows carry unequal mass
    (token counts, costs, sampling weights), which the unweighted GK
    sketch cannot express.

    Same scale shape as mann_whitney_u/ks_test: per-distinct-value
    weight sums from one map-side-combinable groupBy, ONE
    range-repartition prefix pass over the distinct table
    (curation.exact_rank_prefix), then for each requested p the
    minimal value whose cumulative weight clears p*W (a tiny
    aggregate per prob over the distinct table — probs is a
    parameter-sized list).  Zero/negative/NULL weights drop.

    Output: one row per prob (p, value, total_weight), p-ascending.
    """
    from .curation import exact_rank_prefix

    if not probs:
        raise ValueError(
            "weighted_quantiles: probs must be non-empty (an empty "
            "list would produce no output frame)"
        )
    d = df.where(
        F.col(value_col).isNotNull()
        & (F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0)) > 0)
    ).select(
        F.col(value_col).cast("double").alias("_v"),
        F.col(weight_col).cast("double").alias("_w"),
    )
    vc = d.groupBy("_v").agg(F.sum("_w").alias("_tw"))
    ranked = exact_rank_prefix(
        vc, ["_v"], ["_tw"], rank_col="_vr", prefix="_cum_"
    )
    tot = vc.agg(F.sum("_tw").alias("_W"))
    j = ranked.crossJoin(F.broadcast(tot))
    out = None
    for p in probs:
        q = j.where(
            F.col("_cum__tw") >= F.lit(float(p)) * F.col("_W")
        ).agg(
            F.lit(float(p)).alias("p"),
            F.round(F.min("_v"), round_dp).alias("value"),
            F.round(F.max("_W"), round_dp).alias("total_weight"),
        )
        out = q if out is None else out.unionAll(q)
    return out


def benford_deviation(
    df: DataFrame,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated/synthetic-data smell test for naturally-
    spanning positive quantities (costs, latencies, counts): real
    multi-scale data follows P(d) = log10(1 + 1/d); generated or
    truncated data usually does not.  Reported per digit with the
    expected share and the chi-square contribution, plus the total
    chi-square statistic on every row (8 dof).

    The first significant digit of |x| is
    floor(|x| / 10^floor(log10 |x|)) — pure codegen arithmetic
    (identical in DuckDB), one digit-keyed groupBy (9 output rows),
    scalars broadcast.  Zero/NULL values drop.

    Output: ALWAYS 9 rows, digits 1..9 (digit, n, share, expected,
    chi2_term, chi2) — absent digits carry n = 0 and their full
    expected-mass chi-square term.  (A first digit outside 1..9 can
    only arise from floating-point log10 edge cases; both engines
    compute the identical arithmetic, and such a row would be dropped
    by the spine join identically on both sides.)
    """
    d = df.where(
        F.col(value_col).isNotNull() & (F.abs(F.col(value_col)) > 0)
    ).select(
        F.floor(
            F.abs(F.col(value_col).cast("double"))
            / F.pow(
                F.lit(10.0),
                F.floor(F.log10(F.abs(F.col(value_col).cast("double")))),
            )
        )
        .cast("int")
        .alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    # left-join a 1..9 digit spine so ABSENT digits still contribute
    # their (0 - E)^2/E * N chi-square mass — a corpus concentrated on
    # one digit (the most anomalous case) must not under-report
    spine = d.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    counts = spine.join(counts, "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("_N"))
    j = counts.crossJoin(F.broadcast(tot))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    share = F.col("n") / F.col("_N")
    chi_term = (
        F.pow(share - expected, F.lit(2.0)) / expected * F.col("_N")
    )
    w = Window.partitionBy()
    return j.select(
        "digit",
        "n",
        F.round(share, round_dp).alias("share"),
        F.round(expected, round_dp).alias("expected"),
        F.round(chi_term, round_dp).alias("chi2_term"),
        F.round(F.sum(chi_term).over(w), round_dp).alias("chi2"),
    )


def gini_coefficient(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group Gini coefficient of a nonnegative quantity — the
    concentration/inequality monitor (is one user/tool/source eating
    all the cost? how concentrated is the mixture?), by the exact
    rank formula G = 2*sum(i*x_(i)) / (n*sum(x)) - (n+1)/n over the
    group-sorted values.

    Ranks come from one row_number window PARTITIONED BY the group
    (never global); ties order arbitrarily within equal values, which
    leaves sum(i*x_(i)) invariant, so the statistic is deterministic
    under shuffle order.  One window pass + one aggregate.  Negative
    values are rejected (the formula is undefined); NULLs drop;
    all-zero or single-row groups yield NULL.

    Output: (group_col, n, gini).
    """
    d = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    )
    w = Window.partitionBy("_g").orderBy("_v")
    ranked = d.withColumn("_r", F.row_number().over(w))
    agg = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_r") * F.col("_v")).alias("_rs"),
        F.min("_v").alias("_mn"),
    ).localCheckpoint(eager=True)
    # the checkpoint materializes the (small, group-count-sized)
    # aggregate ONCE, so the sign-validation collect below and the
    # returned frame share it instead of re-running the window job
    neg = agg.where(F.col("_mn") < 0).limit(1).collect()
    if neg:
        raise ValueError(
            f"gini_coefficient: negative values in group {neg[0]['_g']!r}"
        )
    n = F.col("n")
    gini = F.when(
        (n > 1) & (F.col("_s") > 0),
        2.0 * F.col("_rs") / (n * F.col("_s")) - (n + 1) / n,
    )
    return agg.select(
        F.col("_g").alias(group_col),
        n.cast("long").alias("n"),
        F.round(gini, round_dp).alias("gini"),
    )


def binseg_split(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Offline single-changepoint detection per group by binary
    segmentation's first step: the split k maximizing the
    standardized mean-shift statistic

        t_k = |P_k - (k/n) P_n| * sqrt(n / (k (n-k)))

    (P = prefix sums in event order) — the retrospective partner of
    the online cusum_changepoint: WHERE did the level shift, not just
    that it did.

    One prefix-sum window on the group partitioning, the per-position
    statistic as a codegen expression, and the argmax as ONE
    ``max_by`` aggregate over a lexicographic (statistic desc,
    earlier-k-wins) struct key — the same deterministic-reduction
    pattern as preference_pairs, no sort, no self-join.  The order
    key is the 6dp-ROUNDED statistic so cross-engine sqrt ulps cannot
    flip the argmax.  Groups with < 2 rows yield no row.

    Output: (group_col, n, split_idx, stat) — split_idx = k means the
    shift is between the k-th and (k+1)-th rows (1-based).
    """
    d = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        *[F.col(c) for c in order_cols],
        F.col(value_col).cast("double").alias("_v"),
    )
    w = Window.partitionBy("_g").orderBy(*order_cols)
    ws = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = d.withColumn("_k", F.row_number().over(w)).withColumn(
        "_p", F.sum("_v").over(ws)
    )
    tot = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_v").alias("_pn")
    )
    j = ranked.join(F.broadcast(tot), "_g").where(
        F.col("_k") < F.col("_n")
    )
    k, n = F.col("_k").cast("double"), F.col("_n").cast("double")
    stat = F.abs(
        F.col("_p") - (k / n) * F.col("_pn")
    ) * F.sqrt(n / (k * (n - k)))
    scored = j.select(
        "_g",
        F.col("_n"),
        F.col("_k"),
        F.round(stat, round_dp).alias("_t"),
    )
    best = scored.groupBy("_g").agg(
        F.max("_n").alias("n"),
        F.max_by(
            F.struct(F.col("_k").alias("k"), F.col("_t").alias("t")),
            F.struct(F.col("_t"), -F.col("_k")),
        ).alias("_best"),
    )
    return best.select(
        F.col("_g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("_best.k").cast("long").alias("split_idx"),
        F.col("_best.t").alias("stat"),
    )


def acf_features(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    value_col: str,
    max_lag: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group autocorrelation at lags 1..max_lag — the tsfresh-style
    temporal signature (is the metric sticky, oscillating, or
    memoryless?) that a feature pipeline attaches to every entity's
    series.  Convention: Pearson correlation between the series and
    its lag-k shift over the n-k overlapping pairs (the sample-ACF
    variant DuckDB's corr replays exactly; NULLs drop first).

    All lags ride ONE group-partitioned window pass (max_lag lag()
    columns), then one aggregate with max_lag corr() states — no
    self-joins, one exchange.  Groups where a lag has < 2 pairs or a
    constant side yield NULL for that lag.

    Output: (group_col, n, acf_1..acf_{max_lag}).
    """
    d = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        *[F.col(c) for c in order_cols],
        F.col(value_col).cast("double").alias("_v"),
    )
    w = Window.partitionBy("_g").orderBy(*order_cols)
    for k in range(1, int(max_lag) + 1):
        d = d.withColumn(f"_l{k}", F.lag("_v", k).over(w))
    return d.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.corr("_v", f"_l{k}"), round_dp).alias(f"acf_{k}")
            for k in range(1, int(max_lag) + 1)
        ],
    ).select(
        F.col("_g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        *[f"acf_{k}" for k in range(1, int(max_lag) + 1)],
    )


def trend_slope(
    df: DataFrame,
    group_col: str,
    x_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group OLS trend of value on x (usually epoch seconds) with
    the slope's t-statistic — "is this entity's metric drifting, and
    is the drift significant" in one pass: slope/intercept from the
    builtin regr_* moment aggregates, t = slope / se(slope) with
    se^2 = (SSE/(n-2)) / Sxx derived from the same moments
    (SSE = Syy - slope^2 * Sxx).  Everything is one
    map-side-combinable aggregate per group; groups with n < 3 or a
    constant x yield NULL t (and NULL slope for constant x).

    Output: (group_col, n, slope, intercept, t_stat).
    """
    d = df.where(
        F.col(value_col).isNotNull() & F.col(x_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(value_col).cast("double").alias("_y"),
    )
    g = d.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.regr_slope("_y", "_x").alias("_sl"),
        F.regr_intercept("_y", "_x").alias("_ic"),
        F.regr_sxx("_y", "_x").alias("_sxx"),
        F.regr_syy("_y", "_x").alias("_syy"),
    )
    n = F.col("n")
    sse = F.col("_syy") - F.col("_sl") * F.col("_sl") * F.col("_sxx")
    se2 = (sse / (n - 2)) / F.col("_sxx")
    t = F.when(
        (n > 2) & (F.col("_sxx") > 0) & (se2 > 0),
        F.col("_sl") / F.sqrt(se2),
    )
    # + 0.0 canonicalizes IEEE negative zero (a tiny negative slope
    # rounds to -0.0, which hashes differently from 0.0 cross-engine)
    return g.select(
        F.col("_g").alias(group_col),
        n.cast("long").alias("n"),
        (F.round("_sl", round_dp) + F.lit(0.0)).alias("slope"),
        (F.round("_ic", round_dp) + F.lit(0.0)).alias("intercept"),
        (F.round(t, round_dp) + F.lit(0.0)).alias("t_stat"),
    )
