"""DSIR importance resampling and Bloom-prefiltered ingest vs
brute-force Python replays."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from sqlfeatureextraction_spark.operators import selection
from sqlfeatureextraction_spark.operators.dedup import (
    bloom_against_corpus,
    bloom_params,
    build_bloom,
    exact_against_corpus,
)

DOCS = [
    (0, "wiki facts about the solar system and planets", "target"),
    (1, "wiki facts about planets and the solar system", "target"),
    (2, "buy cheap pills online now best price deal", "crawl"),
    (3, "the solar system has eight planets wiki says", "crawl"),
    (4, "click here now cheap deal best pills online", "crawl"),
    (5, "short", "crawl"),
    (6, "", "crawl"),
    (7, "planets orbit the sun in the solar system", "crawl"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string"
    ).cache()


def _shingles(text, n=2):
    toks = [t for t in (text or "").lower().split(" ") if t]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _bucket(sh, hex_digits=4, salt="dsir"):
    return hashlib.md5(f"{salt}:{sh}".encode()).hexdigest()[:hex_digits]


def _replay_logweights(docs, target_ids, hex_digits=4, alpha=1.0):
    """Pure-python DSIR replay: bucket counts, smoothed log-ratio,
    per-doc sum."""
    B = 16**hex_digits
    tb, rb = {}, {}
    for i, t, _ in docs:
        for sh in _shingles(t):
            b = _bucket(sh, hex_digits)
            rb[b] = rb.get(b, 0) + 1
            if i in target_ids:
                tb[b] = tb.get(b, 0) + 1
    nt, nr = sum(tb.values()), sum(rb.values())
    out = {}
    for i, t, _ in docs:
        w = 0.0
        shs = _shingles(t)
        for sh in shs:
            b = _bucket(sh, hex_digits)
            w += math.log((tb.get(b, 0) + alpha) / (nt + alpha * B)) - math.log(
                (rb.get(b, 0) + alpha) / (nr + alpha * B)
            )
        out[i] = (len(shs), round(w, 6))
    return out


def test_dsir_logweights_vs_replay(spark, docs_df):
    target_ids = {i for i, _, s in DOCS if s == "target"}
    got = {
        r["doc_id"]: (r["n_shingles"], r["logw"])
        for r in selection.dsir_logweights(
            docs_df, docs_df.where(F.col("source") == "target")
        ).collect()
    }
    exp = _replay_logweights(DOCS, target_ids)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], i
        assert got[i][1] == pytest.approx(exp[i][1], abs=2e-6), i
    # zero-shingle docs are kept and neutral
    assert got[5] == (0, 0.0)
    assert got[6] == (0, 0.0)
    # the wiki-like crawl docs must outrank the spam docs
    assert got[3][1] > got[2][1]
    assert got[7][1] > got[4][1]


def test_dsir_topk_order_and_determinism(spark, docs_df):
    target = docs_df.where(F.col("source") == "target")
    top = selection.dsir_topk(docs_df, target, 3).collect()
    assert len(top) == 3
    keys = [(-r["logw"], r["doc_id"]) for r in top]
    assert keys == sorted(keys)
    assert top == selection.dsir_topk(docs_df, target, 3).collect()


def test_dsir_gumbel_replay(spark, docs_df):
    target = docs_df.where(F.col("source") == "target")
    got = selection.dsir_gumbel_sample(docs_df, target, 4).collect()
    exp_w = _replay_logweights(DOCS, {0, 1})
    keys = {}
    for i, _, _ in DOCS:
        u32 = int(
            hashlib.md5(f"dsir-gumbel:{i}".encode()).hexdigest()[:8], 16
        )
        u = (u32 + 0.5) / 2**32
        keys[i] = round(exp_w[i][1] - math.log(-math.log(u)), 6)
    exp_ids = [
        i for i, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:4]
    assert [r["doc_id"] for r in got] == exp_ids
    for r in got:
        assert r["gumbel_key"] == pytest.approx(keys[r["doc_id"]], abs=2e-6)


def test_dsir_scored_docs_disjoint_from_raw(spark, docs_df):
    """Scoring a batch that is NOT the raw corpus: buckets absent from
    both models fall to the constant default log-ratio."""
    raw = docs_df.where(F.col("doc_id") < 6)
    target = docs_df.where(F.col("source") == "target")
    new = spark.createDataFrame(
        [(100, "entirely novel zebra quantum words")], "doc_id long, text string"
    )
    got = selection.dsir_logweights(new, target, raw=raw).collect()
    B = 16**4
    tb, rb = {}, {}
    for i, t, s in DOCS[:6]:
        for sh in _shingles(t):
            b = _bucket(sh)
            rb[b] = rb.get(b, 0) + 1
            if s == "target":
                tb[b] = tb.get(b, 0) + 1
    nt, nr = sum(tb.values()), sum(rb.values())
    w = 0.0
    for sh in _shingles("entirely novel zebra quantum words"):
        b = _bucket(sh)
        w += math.log((tb.get(b, 0) + 1.0) / (nt + B)) - math.log(
            (rb.get(b, 0) + 1.0) / (nr + B)
        )
    assert got[0]["logw"] == pytest.approx(round(w, 6), abs=2e-6)


# ------------------------------------------------------------------ bloom


def test_bloom_params():
    m, h = bloom_params(1000, 0.01)
    assert m % 64 == 0 and m >= 9000  # ~9.6 bits/key at 1% fpp
    assert 5 <= h <= 9


def test_bloom_no_false_negatives(spark, docs_df):
    bm = build_bloom(docs_df, m_bits=1 << 10, num_hashes=3)
    # every corpus text must probe as a member, even in a tiny bitmap
    out = bloom_against_corpus(
        docs_df, docs_df, m_bits=1 << 10, num_hashes=3, bitmap=bm
    ).collect()
    assert all(r["in_corpus"] for r in out)


def test_bloom_path_equals_exact_path(spark, docs_df):
    new = spark.createDataFrame(
        [
            (100, DOCS[0][1]),  # exact corpus copy
            (101, "never seen before text one"),
            (102, "never seen before text one"),  # batch dup of 101
            (103, DOCS[2][1]),
            (104, "another novel document entirely"),
        ],
        "doc_id long, text string",
    )
    exact = sorted(
        exact_against_corpus(new, docs_df).collect(), key=lambda r: r["doc_id"]
    )
    for m_bits, h in [(1 << 16, 5), (1 << 8, 2)]:  # ample and FP-forcing
        bloom = sorted(
            bloom_against_corpus(
                new, docs_df, m_bits=m_bits, num_hashes=h
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        assert bloom == exact, (m_bits, h)


def test_bloom_prebuilt_bitmap_reuse(spark, docs_df):
    """The amortized-ingest shape: build once, probe many batches."""
    bm = build_bloom(docs_df, m_bits=1 << 12, num_hashes=4)
    b1 = spark.createDataFrame(
        [(200, DOCS[1][1])], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(201, "novel in batch two")], "doc_id long, text string"
    )
    r1 = bloom_against_corpus(b1, docs_df, num_hashes=4, bitmap=bm).collect()
    r2 = bloom_against_corpus(b2, docs_df, num_hashes=4, bitmap=bm).collect()
    assert r1[0]["in_corpus"] and not r1[0]["keep"]
    assert not r2[0]["in_corpus"] and r2[0]["keep"]


def test_dsir_plan_is_jvm_only(spark, docs_df):
    """dsir_logweights has no Python stage at all, and the ratio join
    is a broadcast (bucket-model table bounded by B)."""
    target = docs_df.where(F.col("source") == "target")
    plan = selection.dsir_logweights(docs_df, target)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
