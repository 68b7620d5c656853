"""Pins for the round-6 HOF-materialization fixes: bind_once and the
staged operators must be value-identical to the naive forms on edge
inputs (empty text, docs shorter than the shingle width) — the class
of row the corpus fixtures do not contain but users will feed."""

import pandas as pd
from pyspark.sql import functions as F

from sqlfeatureextraction_spark.operators.curation import (
    adjacent_pairs_col,
    bind_once,
    shingles_col,
    tokens_col,
)
from sqlfeatureextraction_spark.operators.dedup import with_shingles
from sqlfeatureextraction_spark.operators.textstats import (
    winnow_fingerprints,
    with_char_entropy,
)

EDGE_TEXTS = [
    (0, None),
    (1, ""),
    (2, "one"),
    (3, "two tokens"),
    (4, "a b c d e f g h i j k l m n o p"),
    (5, "repeat repeat repeat repeat repeat"),
]


def _df(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")


def test_bind_once_is_identity_on_values(spark):
    df = _df(spark)
    plain = df.select(
        F.size(tokens_col(F.col("text"))).alias("n")
    ).collect()
    bound = df.select(
        bind_once(tokens_col(F.col("text")), lambda t: F.size(t)).alias("n")
    ).collect()
    assert [r["n"] for r in plain] == [r["n"] for r in bound]


def test_shingles_col_edges_match_python(spark):
    rows = (
        _df(spark)
        .select("doc_id", shingles_col(tokens_col(F.col("text")), 3).alias("sh"))
        .orderBy("doc_id")
        .collect()
    )
    for (doc_id, text), r in zip(EDGE_TEXTS, rows):
        toks = [t for t in (text or "").lower().split(" ") if t]
        want = [
            " ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))
        ]
        assert r["sh"] == want, (doc_id, r["sh"], want)


def test_adjacent_pairs_col_edges(spark):
    rows = (
        _df(spark)
        .select(
            "doc_id",
            adjacent_pairs_col(tokens_col(F.col("text"))).alias("p"),
        )
        .orderBy("doc_id")
        .collect()
    )
    for (doc_id, text), r in zip(EDGE_TEXTS, rows):
        toks = [t for t in (text or "").lower().split(" ") if t]
        want = list(zip(toks, toks[1:]))
        got = [(x["a"], x["b"]) for x in r["p"]]
        assert got == want, (doc_id, got, want)


def test_with_shingles_and_winnowing_edges_do_not_error(spark):
    df = _df(spark)
    sh = with_shingles(df, "text", 3).orderBy("doc_id").collect()
    assert sh[0]["shingles"] == []  # NULL text
    assert sh[2]["shingles"] == []  # 1 token < n
    assert len(sh[4]["shingles"]) == 14  # 16 tokens, n=3
    fp = winnow_fingerprints(df, k=3, w=2)
    # empty/short docs emit nothing; long docs emit winnowed picks
    got = {r["doc_id"] for r in fp.collect()}
    assert 0 not in got and 2 not in got and 4 in got


def test_char_entropy_edges(spark):
    out = {
        r["doc_id"]: r["char_entropy"]
        for r in with_char_entropy(_df(spark)).collect()
    }
    assert out[0] == 0.0 and out[1] == 0.0
    # "one": 3 distinct chars of 3 -> entropy log2(3)
    assert abs(out[2] - 1.584963) < 1e-6
