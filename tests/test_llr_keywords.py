"""Dunning log-likelihood-ratio slice keywords (stats.py)."""

import math
from collections import Counter


def _llr(a, b, c, d):
    def xlx(v):
        return v * math.log(v) if v > 0 else 0.0

    n = a + b + c + d
    return 2.0 * (
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


def test_llr_keywords_brute_force(spark):
    from sqlfeatureextraction_spark.operators.stats import llr_keywords

    docs = [
        ("code", "def foo def bar return foo the"),
        ("code", "def baz return return the a"),
        ("prose", "the cat sat on the mat"),
        ("prose", "a dog and the cat ran the"),
    ]
    df = spark.createDataFrame(docs, "src string, text string")
    got = [
        (r.src, r.token, r.cnt, r.llr)
        for r in llr_keywords(
            df, "src", top_k=2, min_count=2
        ).collect()
    ]

    corpus, groups = Counter(), {}
    for src, text in docs:
        toks = text.split(" ")
        corpus.update(toks)
        groups.setdefault(src, Counter()).update(toks)
    n = sum(corpus.values())
    exp = []
    for src, gc in groups.items():
        ng = sum(gc.values())
        rows = []
        for t, a in gc.items():
            b = corpus[t] - a
            if a < 2 or a / ng <= b / (n - ng):
                continue
            rows.append(
                (round(_llr(a, b, ng - a, n - ng - b), 6), t, a)
            )
        rows.sort(key=lambda r: (-r[0], r[1]))
        exp.extend((src, t, a, llr) for llr, t, a in rows[:2])
    assert sorted(got) == sorted(exp)
    # 'def' defines code and never surfaces for prose
    pairs = {(g, t) for g, t, _, _ in got}
    assert ("code", "def") in pairs
    assert ("prose", "def") not in pairs
