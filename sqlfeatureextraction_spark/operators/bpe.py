"""Byte-pair-encoding merge learning (Sennrich et al., ACL 2016) as
iterative vocabulary-table transforms — learning a tokenizer ON the
cluster, over the corpus the engine is already profiling.

The insight that makes BPE cheap on Spark is the one the original
algorithm exploits: merges are learned from the WORD-TYPE frequency
table, not the corpus.  The only corpus-sized work is the initial
word-count aggregate (map-side combine); every one of the K merge
iterations then runs on the vocabulary-sized (word-symbols, count)
frame — a pair-count aggregate (weighted by word count, overlapping
pairs counted per occurrence, exactly as the reference
implementation's zip), a deterministic argmax (count desc, pair
lexicographic — ONE collected row per iteration), and a left-to-right
non-overlapping merge applied via literal string ``replace`` on the
space-joined symbol string (string replace scans left-to-right
non-overlapping in both engines — verified semantics).

MERGE-SEMANTICS CAVEAT (deliberate, documented, pinned in pytest):
``replace(' a b ', ' ab ')`` CONSUMES the shared separator space, so
on an immediate repetition of the pair ("abab", "aaaa") only
alternate occurrences merge per application — Sennrich's reference
re.sub uses non-consuming lookarounds (negative lookbehind/lookahead on non-space) and
merges every left-to-right occurrence.  RE2 (DuckDB) has no
lookarounds and no bounded way to iterate-to-fixpoint, so exact
Sennrich semantics are not expressible in a cross-engine-replayable
form; this operator's semantics are instead defined AS the
replace-scan semantics, identical in both engines and
deterministic.  On natural-language corpora immediate pair
repetitions are rare enough that learned merge tables typically
coincide; tests/test_bpe.py pins both the agreement on normal words
and the divergence on 'abab'.

Word symbols are ``c h a r s </w>`` with the standard end-of-word
marker; tokens are assumed not to contain ``<`` / ``>`` / spaces (true
of tokens_col output on this corpus — documented contract, asserted
nowhere hot).

The DuckDB oracle replays every iteration as a CTE chain (pair-count
CTE -> argmax CTE -> replace CTE), so the learned merge table is
cross-engine EXACT — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bpe_learn",
    "bpe_sql_oracle",
    "bpe_encode_fertility",
    "bpe_encode_sql_oracle",
]


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.  Output: one row
    per merge (merge_idx, left, right, merged, pair_count), in learn
    order; stops early if no pair remains."""
    from .curation import tokens_col

    words = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            F.concat(
                F.lit(" "),
                F.regexp_replace(F.col("_w"), "(.)", "$1 "),
                F.lit("</w> "),
            ).alias("_sym"),
            "_cnt",
        )
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
    merges = []
    for k in range(int(n_merges)):
        arr = F.split(F.trim(F.col("_sym")), " ")
        pairs = (
            words.select(
                F.col("_cnt"),
                F.explode(
                    F.arrays_zip(
                        F.slice(arr, 1, F.size(arr) - 1).alias("a"),
                        F.slice(arr, 2, F.size(arr) - 1).alias("b"),
                    )
                ).alias("_pr"),
            )
            .groupBy(
                F.col("_pr.a").alias("a"), F.col("_pr.b").alias("b")
            )
            .agg(F.sum("_cnt").alias("c"))
        )
        best = (
            pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((k + 1, a, b, a + b, c))
        words = words.select(
            F.replace(
                F.col("_sym"),
                F.lit(f" {a} {b} "),
                F.lit(f" {a}{b} "),
            ).alias("_sym"),
            "_cnt",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "merge_idx int, left string, right string, merged string,"
        " pair_count bigint",
    )


def _bpe_chain(tok_expr: str, table: str, n_merges: int):
    """The shared merge-learning CTE chain (MATERIALIZED — a plain CTE
    chain re-inlines w{k-1} once per reference and the parquet scan
    count goes exponential in n_merges) + the per-merge final selects."""
    parts = [
        f"""w0 AS MATERIALIZED (
          SELECT ' ' || regexp_replace(tok, '(.)', '\\1 ', 'g')
                 || '</w> ' AS sym,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM (SELECT unnest({tok_expr}) AS tok FROM {table})
          GROUP BY 1
        )"""
    ]
    finals = []
    for k in range(1, int(n_merges) + 1):
        parts.append(
            f"""p{k} AS MATERIALIZED (
              SELECT pr[1] AS a, pr[2] AS b, SUM(cnt) AS c
              FROM (
                SELECT cnt, unnest(list_zip(arr, arr[2:])) AS pr
                FROM (SELECT cnt, string_split(trim(sym), ' ') AS arr
                      FROM w{k - 1})
                WHERE len(arr) >= 2
              )
              WHERE pr[2] IS NOT NULL
              GROUP BY 1, 2
            )"""
        )
        parts.append(
            f"""b{k} AS MATERIALIZED (
              SELECT a, b, c FROM p{k}
              ORDER BY c DESC, a ASC, b ASC LIMIT 1
            )"""
        )
        parts.append(
            f"""w{k} AS MATERIALIZED (
              SELECT replace(sym, ' ' || a || ' ' || b || ' ',
                             ' ' || a || b || ' ') AS sym, cnt
              FROM w{k - 1} CROSS JOIN b{k}
            )"""
        )
        finals.append(
            f"SELECT {k} AS merge_idx, a AS left_, b, c FROM b{k}"
        )
    return parts, finals


def bpe_sql_oracle(
    tok_expr: str,
    table: str = "documents",
    n_merges: int = 20,
) -> str:
    """DuckDB replay of bpe_learn: the same word-type seeding, the
    same per-iteration pair-count/argmax/replace CTE triple."""
    parts, finals = _bpe_chain(tok_expr, table, int(n_merges))
    chain = ",\n".join(parts)
    union = "\nUNION ALL\n".join(finals)
    return f"""
        WITH {chain}
        SELECT merge_idx, left_ AS "left", b AS "right",
               left_ || b AS merged, CAST(c AS BIGINT) AS pair_count
        FROM ({union})
        ORDER BY merge_idx
    """


def bpe_encode_fertility(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 16,
    round_dp: int = 6,
) -> DataFrame:
    """Apply BPE merges learned from this corpus (bpe_learn) and report
    per-document tokenizer FERTILITY — subword tokens per word, the
    metric that tells a pipeline how expensive each document is to
    tokenize under a budgeted vocabulary (high fertility = rare/noisy
    words fragmenting into many units).

    The application is the part that must scale: each learned merge
    becomes ONE literal string ``replace`` on the space-joined symbol
    string, so the whole 16-merge tokenizer is a chain of 16 codegen'd
    per-row expressions — zero joins, zero extra shuffles over the
    corpus; the only exchanges are bpe_learn's vocab-table iterations
    and the final per-doc aggregate.  A subword unit = one
    space-separated symbol after all merges (the trailing ``</w>``
    counts when unmerged — documented convention, replayed exactly).

    Output: (id, n_words, n_subtokens, fertility); empty docs drop.
    """
    from .curation import tokens_col

    merges = [
        (r["left"], r["right"])
        for r in bpe_learn(df, text_col, n_merges).collect()
    ]
    sym = F.concat(
        F.lit(" "),
        F.regexp_replace(F.col("_w"), "(.)", "$1 "),
        F.lit("</w> "),
    )
    for a, b in merges:
        sym = F.replace(sym, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    per_word = df.select(
        F.col(id_col),
        F.explode(tokens_col(F.col(text_col))).alias("_w"),
    ).select(
        F.col(id_col),
        F.size(F.split(F.trim(sym), " ")).alias("_n_sub"),
    )
    return per_word.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("_n_sub").cast("long").alias("n_subtokens"),
        F.round(
            F.sum("_n_sub") / F.count(F.lit(1)), round_dp
        ).alias("fertility"),
    )


def bpe_encode_sql_oracle(
    tok_expr: str,
    table: str = "documents",
    id_col: str = "doc_id",
    n_merges: int = 16,
    round_dp: int = 6,
) -> str:
    """DuckDB replay of bpe_encode_fertility: the bpe_sql_oracle merge
    chain, then the same replace chain applied to every (doc, word)
    occurrence (one MATERIALIZED CTE per merge)."""
    learn_parts, _ = _bpe_chain(tok_expr, table, int(n_merges))
    chain = ",\n".join(learn_parts)
    parts = [
        f"""d0 AS MATERIALIZED (
          SELECT {id_col},
                 ' ' || regexp_replace(tok, '(.)', '\\1 ', 'g')
                 || '</w> ' AS sym
          FROM (SELECT {id_col}, unnest({tok_expr}) AS tok
                FROM {table})
        )"""
    ]
    for k in range(1, int(n_merges) + 1):
        parts.append(
            f"""d{k} AS MATERIALIZED (
              SELECT {id_col},
                     replace(sym, ' ' || a || ' ' || b || ' ',
                             ' ' || a || b || ' ') AS sym
              FROM d{k - 1} CROSS JOIN b{k}
            )"""
        )
    applied = ",\n".join(parts)
    return f"""
        WITH {chain},
        {applied}
        SELECT {id_col},
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(len(string_split(trim(sym), ' '))) AS BIGINT)
                 AS n_subtokens,
               ROUND(SUM(len(string_split(trim(sym), ' '))) * 1.0
                     / COUNT(*), {round_dp}) AS fertility
        FROM d{int(n_merges)}
        GROUP BY {id_col}
    """
