"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All hot-path logic is built-in column functions (JVM, whole-stage
codegen); nothing here shuffles — these are per-row projections that
compose with any scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlfeatureextraction_spark.functions.text import tokenize_col

# tiny per-language stopword lists for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "une"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
}


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count (whitespace/alnum tokenizer), BPE-ish subword count
    estimate (common-prefix regex pieces), char/word length stats."""
    toks = tokenize_col(F.col(text_col))
    # BPE-ish: count regex pieces of ≤4 chars after splitting long tokens
    bpe_pieces = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("int"),
    )
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_bpe_est", bpe_pieces)
        .withColumn("n_chars", F.length(F.coalesce(F.col(text_col), F.lit(""))))
        .withColumn(
            "avg_token_len",
            F.when(
                F.size(toks) > 0,
                F.aggregate(
                    toks, F.lit(0), lambda acc, t: acc + F.length(t)
                )
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score in [0, 1]:
    length band, punctuation ratio, stopword ratio, uppercase ratio,
    digit ratio — the usual cheap pre-filters before expensive model
    scoring."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(txt)
    n_sf = F.greatest(n, F.lit(1)).cast("double")
    punct = F.length(F.regexp_replace(txt, r"[^.,;:!?]", ""))
    upper = F.length(F.regexp_replace(txt, r"[^A-Z]", ""))
    digit = F.length(F.regexp_replace(txt, r"[^0-9]", ""))
    toks = tokenize_col(txt)
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*_LANG_MARKERS["en"]))
    )
    n_toks = F.greatest(F.size(toks), F.lit(1)).cast("double")
    out = (
        df.withColumn("punct_ratio", F.round(punct / n_sf, 6))
        .withColumn("upper_ratio", F.round(upper / n_sf, 6))
        .withColumn("digit_ratio", F.round(digit / n_sf, 6))
        .withColumn("stopword_ratio", F.round(stop / n_toks, 6))
    )
    len_band = (
        F.when(n < 10, 0.0).when(n < 50, 0.5).when(n < 5000, 1.0).otherwise(0.5)
    )
    score = (
        len_band * 0.4
        + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.2
        + (1 - F.least(F.col("digit_ratio") * 4, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 3, F.lit(1.0)) * 0.2
    )
    return out.withColumn("quality_score", F.round(score, 6))


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hit
    counts; 'und' (undetermined) when no marker hits.  Pure built-ins:
    one filter+size per language, greatest() to pick the winner."""
    toks = tokenize_col(F.col(text_col))

    def marker_count(markers):
        # closure factory: a default-arg lambda would have 2 parameters
        # and F.filter would pass the element index as the second one
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: marker_count(m) for lang, m in _LANG_MARKERS.items()}
    # argmax with deterministic tie-break on language code order
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(_LANG_MARKERS, reverse=True):
        pred = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn("lang_pred", pred)


def with_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 8
) -> DataFrame:
    """Document fingerprint: xxhash64 of the full text plus a rolling
    winnowed sketch — min hash over each k-token window, giving a
    shift-tolerant signature (array<long>)."""
    toks = tokenize_col(F.col(text_col))
    count = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - 1)
    win_hash = lambda i: F.xxhash64(  # noqa: E731
        F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    sketch = F.when(count > 0, F.transform(idx, win_hash)).otherwise(
        F.array().cast("array<bigint>")
    )
    return df.withColumn("fingerprint", F.xxhash64(F.col(text_col))).withColumn(
        "winnow_min", F.array_min(sketch)
    )
