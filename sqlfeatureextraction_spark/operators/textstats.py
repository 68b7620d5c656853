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
    shift-tolerant signature (array<long>).

    The token array is materialized as a projected column before the
    per-window lambda references it — an un-materialized reference
    would re-run the regex tokenizer once per window (see
    winnow_fingerprints for the measured cost of that pattern)."""
    toks_col = "__fp_toks"
    staged = df.withColumn(toks_col, tokenize_col(F.col(text_col)))
    toks = F.col(toks_col)
    count = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - 1)
    win_hash = lambda i: F.xxhash64(  # noqa: E731
        F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    sketch = F.when(count > 0, F.transform(idx, win_hash)).otherwise(
        F.array().cast("array<bigint>")
    )
    return (
        staged.withColumn("fingerprint", F.xxhash64(F.col(text_col)))
        .withColumn("winnow_min", F.array_min(sketch))
        .drop(toks_col)
    )


# Gopher rule constants (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1) —
# one shared source of truth for the Spark path, the oracle generator,
# and the tests.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BOUNDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_frac": 0.9,
    "max_ellipsis_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stopword_hits": 2,
    "max_dup_line_frac": 0.3,
    "max_dup_line_char_frac": 0.2,
}


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher quality-filter heuristics (Rae et al. 2021 A1.1) as
    pure column expressions — the standard rule-based pre-training
    gate: word-count bounds, mean-word-length bounds, symbol-to-word
    ratio (# or ...), bullet/ellipsis line fractions, alphabetic-word
    fraction, stop-word presence, and duplicate-line fractions (by
    line count and by character mass).

    Word convention shared verbatim with the DuckDB oracle: lowercase,
    split on single spaces, empties dropped (curation.tokens_col);
    lines split on '\\n'.  Output keeps every input row and appends
    the measured signals plus per-rule booleans and the conjunction
    ``passes_gopher`` — filtering is the caller's ``where`` so the
    rejected stream can be audited.  No shuffle: per-row projections
    that compose with any scan (the one aggregate-free exception in
    the family: duplicate-line detection stays WITHIN the document,
    via array self-counts, never a corpus join).
    """
    from .curation import tokens_col

    b = GOPHER_BOUNDS
    toks = tokens_col(F.col(text_col))
    n_words = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_wl = sum_len / F.greatest(n_words, F.lit(1))
    raw = F.coalesce(F.col(text_col), F.lit(""))
    n_hash = F.length(raw) - F.length(F.replace(raw, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(raw) - F.length(F.replace(raw, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis) / F.greatest(n_words, F.lit(1))
    lines = F.filter(
        F.split(raw, "\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    n_lines = F.size(lines)
    bullet_frac = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).startswith("-")
            | F.trim(ln).startswith("*")
            | F.trim(ln).startswith("•"),
        )
    ) / F.greatest(n_lines, F.lit(1))
    ellipsis_frac = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).endswith("..."))
    ) / F.greatest(n_lines, F.lit(1))
    alpha_word_frac = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ) / F.greatest(n_words, F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stopword_hits = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    # duplicate-line fractions: a line is duplicated iff its trimmed
    # text occurs more than once IN THIS DOCUMENT
    dup_lines = F.filter(
        lines,
        lambda ln: F.size(
            F.filter(lines, lambda o: F.trim(o) == F.trim(ln))
        )
        > 1,
    )
    dup_line_frac = F.size(dup_lines) / F.greatest(n_lines, F.lit(1))
    line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, ln: acc + F.length(ln)
    )
    dup_line_chars = F.aggregate(
        dup_lines, F.lit(0), lambda acc, ln: acc + F.length(ln)
    )
    dup_char_frac = dup_line_chars / F.greatest(line_chars, F.lit(1))

    out = (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", F.round(mean_wl, 4))
        .withColumn("symbol_ratio", F.round(symbol_ratio, 4))
        .withColumn("bullet_frac", F.round(bullet_frac, 4))
        .withColumn("ellipsis_frac", F.round(ellipsis_frac, 4))
        .withColumn("alpha_word_frac", F.round(alpha_word_frac, 4))
        .withColumn("stopword_hits", stopword_hits.cast("int"))
        .withColumn("dup_line_frac", F.round(dup_line_frac, 4))
        .withColumn("dup_line_char_frac", F.round(dup_char_frac, 4))
    )
    rules = {
        "r_word_count": (F.col("n_words") >= b["min_words"])
        & (F.col("n_words") <= b["max_words"]),
        "r_mean_word_len": (F.col("mean_word_len") >= b["min_mean_word_len"])
        & (F.col("mean_word_len") <= b["max_mean_word_len"]),
        "r_symbol_ratio": F.col("symbol_ratio") <= b["max_symbol_ratio"],
        "r_bullet": F.col("bullet_frac") <= b["max_bullet_frac"],
        "r_ellipsis": F.col("ellipsis_frac") <= b["max_ellipsis_frac"],
        "r_alpha": F.col("alpha_word_frac") >= b["min_alpha_word_frac"],
        "r_stopwords": F.col("stopword_hits") >= b["min_stopword_hits"],
        "r_dup_lines": F.col("dup_line_frac") <= b["max_dup_line_frac"],
        "r_dup_chars": F.col("dup_line_char_frac")
        <= b["max_dup_line_char_frac"],
    }
    passes = F.lit(True)
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
        passes = passes & F.col(name)
    return out.withColumn("passes_gopher", passes)


CODE_FENCE_RE = r"(?s)```([a-zA-Z0-9_+\-]*)\r?\n(.*?)```"


def extract_code_blocks(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple = ("doc_id",),
) -> DataFrame:
    """Fenced code-block extraction from markdown-ish text — the step
    that mines code training data out of transcripts/documents.  Each
    ````` ```lang\\n body ``` ````` fence yields one output row with
    its 0-based ``block_idx`` within the document, the (possibly
    empty) info-string language tag, and the body with exactly one
    trailing newline stripped (CommonMark: the closing fence's line
    break belongs to the fence, not the code).

    Spark-first: two ``regexp_extract_all`` calls (group 1 = lang,
    group 2 = body) + ``arrays_zip`` + ``posexplode`` — all JVM
    codegen, zero Python, zero shuffle (a pure per-row flatMap; the
    explode preserves the upstream partitioning).  Non-greedy
    ``(.*?)`` with ``(?s)`` keeps adjacent fences separate while
    letting bodies span lines; an unclosed trailing fence matches
    nothing, by construction.

    Output: (*id_cols, block_idx, lang, code, code_chars, code_lines).
    """
    langs = F.regexp_extract_all(F.col(text_col), F.lit(CODE_FENCE_RE), 1)
    bodies = F.regexp_extract_all(F.col(text_col), F.lit(CODE_FENCE_RE), 2)
    code = F.regexp_replace(F.col("z.bodies"), r"\n$", "")
    return (
        df.select(
            *id_cols,
            F.posexplode(
                F.arrays_zip(langs.alias("langs"), bodies.alias("bodies"))
            ).alias("block_idx", "z"),
        )
        .select(
            *id_cols,
            "block_idx",
            F.col("z.langs").alias("lang"),
            code.alias("code"),
            F.length(code).alias("code_chars"),
            F.size(F.split(code, r"\n", -1)).alias("code_lines"),
        )
    )


def with_char_entropy(
    df: DataFrame, text_col: str = "text", round_dp: int = 6
) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    cheap gibberish/boilerplate detector (near-zero for repeated
    characters, ~4.1 bits for ordinary English prose): H = −Σ p_c
    log2 p_c over the document's character histogram.

    Spark-first, per-row only: the histogram is built with
    higher-order functions (``array_distinct`` + ``filter`` counts
    over the char array — O(distinct × len) JVM work per row, no
    explode, no shuffle, no Python), and the entropy reduction is one
    ``F.aggregate``.  Empty/NULL text scores 0.  Rounded to
    ``round_dp`` so the value is reproducible across engines and
    summation orders.

    Adds: char_entropy (double).

    The char array, its size and the distinct-char array are
    materialized as projected columns, and each character's
    probability is computed ONCE (a transform into a p-array feeding
    the fold) — the fused form re-ran the string split at every
    lambda reference and counted every distinct character twice
    (measured 9.2 s → sub-second on the sf0.1 documents).  The fold
    accumulates − p·log2(p) over the same distinct-char order with
    the same IEEE operations, so the rounded value is bit-identical.
    """
    c_chars, c_n, c_dc = "__ce_chars", "__ce_n", "__ce_dc"
    staged = (
        df.withColumn(
            c_chars, F.split(F.coalesce(F.col(text_col), F.lit("")), "")
        )
        .withColumn(c_n, F.size(c_chars).cast("double"))
        .withColumn(c_dc, F.array_distinct(c_chars))
    )
    chars, n = F.col(c_chars), F.col(c_n)
    probs = F.transform(
        F.col(c_dc),
        lambda c: F.size(F.filter(chars, lambda x: x == c)).cast("double")
        / n,
    )
    ent = F.aggregate(
        probs, F.lit(0.0), lambda acc, p: acc - p * F.log2(p)
    )
    return staged.withColumn(
        "char_entropy",
        F.when(n > 0, F.round(ent, round_dp)).otherwise(F.lit(0.0)),
    ).drop(c_chars, c_n, c_dc)


def with_normalized_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Pre-dedup text canonicalization — the normalization applied
    before exact/near-dup fingerprints so trivially different copies
    (case, spacing, control chars, quote styles) collapse: strip
    control characters, map curly quotes/dashes to ASCII, lowercase,
    collapse all whitespace runs to single spaces, trim.  Order
    matters and is fixed (strip → map → lower → collapse → trim).

    Entirely per-row regexp_replace/translate chain — JVM codegen,
    no UDF, no shuffle; rides the scan at any scale.  The same five
    steps are replayed verbatim in the driver oracle, so the
    canonical form is cross-engine pinned, not just "similar".
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    c = F.translate(c, "‘’“”–—", "''\"\"--")
    c = F.lower(c)
    c = F.regexp_replace(c, r"\s+", " ")
    return df.withColumn(out_col, F.trim(c))


WINNOW_MOD = 2_147_483_647  # 2^31-1; 31*acc + 127 stays in int64


def _poly_hash(col):
    """Deterministic polynomial string hash both engines can compute
    arithmetically: fold (acc*31 + ascii(char)) mod 2^31-1 over the
    characters — NOT a crypto hash, but engine-portable (Spark
    F.aggregate here == DuckDB list_reduce in the oracle), which a
    builtin like xxhash64 is not across engines."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(WINNOW_MOD),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple = ("doc_id",),
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-token shingle, then
    in every sliding window of ``w`` consecutive shingle hashes
    select the minimum (RIGHTMOST position on ties); the distinct
    selected (pos, hash) pairs are the document's fingerprint set.
    Guarantee: any shared run of ≥ w+k−1 tokens between two documents
    shares at least one fingerprint — the local selection the global
    min (with_fingerprint's winnow_min) cannot give.  Documents with
    fewer than w shingles winnow their single short window; documents
    under k tokens emit nothing.

    Entirely per-row higher-order functions (shingle hashes, window
    minima, rightmost-argmin via max(filter(positions))) and one
    posexplode — no shuffle, no UDF; the polynomial shingle hash is
    engine-portable so the oracle replays it bit-for-bit.

    Each stage (token array, shingle-hash array, window-min array) is
    materialized as its own projected column before the next stage
    references it: HOF lambdas referencing an un-materialized
    `transform` expression re-expand it at EVERY `element_at`/`slice`
    reference (Catalyst does no common-subexpression elimination
    inside lambdas, and CollapseProject keeps the stages apart only
    because the aliases are multiply referenced), turning the O(n·w)
    selection into O(n²·w·k·chars) re-hashing.  Measured: the fused
    form ran 400+ s on 5k ~300-char docs; the staged form runs the
    identical arithmetic in under a second.

    Output: (*id_cols, pos = shingle index of the selected hash,
    gram_hash), one row per distinct selected pair.
    """
    toks = tokenize_col(F.col(text_col))
    n_gram = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    staged = df.select(*id_cols, toks.alias("_toks"), n_gram.alias("_ng"))
    # the staged _gh column is evaluated for EVERY row (unlike the
    # fused form, where laziness of the n_gram>0 CASE branch skipped
    # it), so it must itself be gated: for _ng = 0 the index
    # sequence(0, -1) is DESCENDING and would drive slice() with
    # start 0 — an error, not an empty array
    gh_expr = F.when(
        F.col("_ng") > 0,
        F.transform(
            F.sequence(F.lit(0), F.col("_ng") - 1),
            lambda i: _poly_hash(
                F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, k))
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    staged = staged.select(*id_cols, "_ng", gh_expr.alias("_gh"))
    win = F.least(F.lit(w), F.col("_ng"))
    n_win = F.col("_ng") - win + 1
    wmin_expr = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.array_min(F.slice(F.col("_gh"), i + 1, win)),
    )
    staged = staged.select(
        *id_cols, "_ng", "_gh", win.alias("_win"), wmin_expr.alias("_wmin")
    )
    gh = F.col("_gh")
    sel = F.transform(
        F.sequence(F.lit(0), F.size(F.col("_wmin")) - 1),
        lambda i: F.struct(
            F.array_max(
                F.filter(
                    F.sequence(i, i + F.col("_win") - 1),
                    lambda j: F.element_at(gh, j + 1)
                    == F.element_at(F.col("_wmin"), i + 1),
                )
            ).alias("pos"),
            F.element_at(F.col("_wmin"), i + 1).alias("gram_hash"),
        ),
    )
    picked = F.when(F.col("_ng") > 0, F.array_distinct(sel)).otherwise(
        F.array().cast("array<struct<pos:int,gram_hash:bigint>>")
    )
    return staged.select(
        *id_cols, F.explode(picked).alias("_s")
    ).select(*id_cols, F.col("_s.pos").alias("pos"),
             F.col("_s.gram_hash").alias("gram_hash"))
