"""Winnowing fingerprints (MOSS local-minima selection)."""

import re

MOD = 2_147_483_647


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", (s or "").lower()) if t]


def _ph(s):
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % MOD
    return acc


def _brute(text, k=5, w=4):
    toks = _tok(text)
    grams = [
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    ]
    gh = [_ph(g) for g in grams]
    if not gh:
        return set()
    win = min(w, len(gh))
    out = set()
    for i in range(len(gh) - win + 1):
        window = gh[i : i + win]
        mv = min(window)
        pos = max(j for j in range(i, i + win) if gh[j] == mv)
        out.add((pos, mv))
    return out


def _run(spark, docs, k=5, w=4):
    from sqlfeatureextraction_spark.operators.textstats import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gram_hash))
    want = {i: _brute(t, k, w) for i, t in docs if _brute(t, k, w)}
    assert got == want
    return got


def test_winnowing_matches_brute(spark, transcripts_pdf):
    docs = [
        (i, t) for i, t in enumerate(transcripts_pdf["text"].head(120))
    ]
    _run(spark, docs)


def test_winnowing_edges_and_guarantee(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (0, "x y z"),                      # < k tokens: no rows
        (1, "one two three four five"),    # exactly k: 1 gram, short window
        (2, f"prefix words here {shared} and a tail"),
        (3, f"{shared} totally different continuation text now"),
    ]
    got = _run(spark, docs)
    assert 0 not in got
    assert len(got[1]) == 1
    # winnowing guarantee: the shared >= w+k-1 token run yields at
    # least one common fingerprint HASH between docs 2 and 3
    h2 = {h for _, h in got[2]}
    h3 = {h for _, h in got[3]}
    assert h2 & h3
