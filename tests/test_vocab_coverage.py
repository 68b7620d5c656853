"""Vocabulary coverage curve."""

import re
from collections import Counter


def test_vocab_coverage_matches_brute(spark, transcripts_pdf):
    from sqlfeatureextraction_spark.operators.stats import (
        vocab_coverage_curve,
    )

    texts = list(transcripts_pdf["text"].head(200))
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.rank, r.tok, r.cnt, r.share, r.cum_share)
        for r in vocab_coverage_curve(df, top_k=25)
        .orderBy("rank")
        .collect()
    ]
    cnt = Counter(
        t
        for s in texts
        for t in re.split(r"[^a-z0-9]+", (s or "").lower())
        if t
    )
    total = sum(cnt.values())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    run = 0
    for i, ((tok, c), g) in enumerate(zip(want, got), start=1):
        run += c
        assert g == (
            i,
            tok,
            c,
            round(c / total, 6),
            round(run / total, 6),
        )
    assert len(got) == 25
    assert got[-1][4] <= 1.0
