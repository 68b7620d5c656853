"""Heaps' law fit, PMI collocations, KL drift (stats.py) and the
exact_rank_prefix primitive (curation.py)."""

import math
from collections import Counter


def _ols(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return slope, intercept


def test_exact_rank_prefix_matches_window(spark):
    from pyspark.sql import functions as F

    from sqlfeatureextraction_spark.operators.curation import (
        exact_rank_prefix,
    )

    rows = [(f"id{i:03d}", float((i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, v double").repartition(7)
    got = {
        r.k: (r.rank, r.cum_v)
        for r in exact_rank_prefix(df, ["k"], ["v"]).collect()
    }
    acc = 0.0
    for i, (k, v) in enumerate(sorted(rows)):
        acc += v
        assert got[k][0] == i + 1, (k, got[k])
        assert abs(got[k][1] - acc) < 1e-9

    # no unpartitioned Window in the plan
    plan = exact_rank_prefix(df, ["k"], ["v"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan or "_p" in plan
    assert F is not None


def test_heaps_law_matches_brute_force(spark):
    from sqlfeatureextraction_spark.operators.stats import heaps_law

    docs = [
        ("d01", "the cat sat"),
        ("d02", "the dog sat on the mat"),
        ("d03", "a cat and a dog"),
        ("d04", "entirely novel words appear here"),
        ("d05", "the the the"),
        ("d06", "cat dog mat words here plus more"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    r = heaps_law(df).collect()[0]

    seen, pts = set(), []
    n = 0
    for _, text in sorted(docs):
        toks = [t for t in text.lower().split(" ") if t]
        n += len(toks)
        seen.update(toks)
        if n > 0 and seen:
            pts.append((math.log(n), math.log(len(seen))))
    slope, intercept = _ols([p[0] for p in pts], [p[1] for p in pts])
    assert r.n_docs == len(pts)
    assert abs(r.beta - slope) < 1e-6
    assert abs(r.ln_k - intercept) < 1e-6
    assert 0.0 < r.beta < 1.0  # sublinear vocabulary growth


def test_pmi_collocations_brute_force(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        pmi_collocations,
    )

    docs = [
        ("new york is a city",),
        ("new york has new parks",),
        ("york new city a is",),
        ("a city is a city",),
    ]
    df = spark.createDataFrame(docs, "text string")
    got = [
        (r.w1, r.w2, r.pair_count, r.pmi)
        for r in pmi_collocations(df, min_count=2, top_k=3).collect()
    ]

    uni, bi = Counter(), Counter()
    t1 = t2 = 0
    for (text,) in docs:
        toks = text.split(" ")
        uni.update(toks)
        t1 += len(toks)
        bi.update(zip(toks, toks[1:]))
        t2 += len(toks) - 1
    exp = []
    for (x, y), c in bi.items():
        if c >= 2:
            pmi = math.log((c / t2) / ((uni[x] / t1) * (uni[y] / t1)))
            exp.append((round(pmi, 6), x, y, c))
    exp.sort(key=lambda e: (-e[0], e[1], e[2]))
    assert got == [(x, y, c, p) for p, x, y, c in exp[:3]]
    # the collocation "new york" makes the cut; its reversal (count 1,
    # under min_count) does not
    assert ("new", "york") in {(g[0], g[1]) for g in got}
    assert ("york", "new") not in {(g[0], g[1]) for g in got}


def test_kl_drift_matches_full_vocab_sum(spark):
    from sqlfeatureextraction_spark.operators.stats import kl_drift

    docs = [
        ("web", "the cat sat on the mat"),
        ("web", "the dog ran"),
        ("code", "def main return def"),
        ("code", "return x return y"),
        ("mix", "the cat def return"),
    ]
    df = spark.createDataFrame(docs, "src string, text string")
    a = 0.5
    got = {r.src: (r.n_tokens, r.vocab_seen, r.kl) for r in kl_drift(
        df, "src", alpha=a
    ).collect()}

    corpus, groups = Counter(), {}
    for src, text in docs:
        toks = text.split(" ")
        corpus.update(toks)
        groups.setdefault(src, Counter()).update(toks)
    vocab = sorted(corpus)
    big_v = len(vocab)
    big_t = sum(corpus.values())
    for src, gc in groups.items():
        ng = sum(gc.values())
        kl = 0.0
        for t in vocab:  # textbook sum over the FULL vocab
            p = (gc.get(t, 0) + a) / (ng + a * big_v)
            q = (corpus[t] + a) / (big_t + a * big_v)
            kl += p * math.log(p / q)
        assert got[src][0] == ng
        assert got[src][1] == len(gc)
        assert abs(got[src][2] - kl) < 1e-6, (src, got[src][2], kl)
    # a slice distributed like the corpus drifts less than a skewed one
    assert got["mix"][2] < got["code"][2]
