"""Character-entropy quality signal."""

import math
from collections import Counter


def _ent(s):
    if not s:
        return 0.0
    n = len(s)
    return round(
        -sum((c / n) * math.log2(c / n) for c in Counter(s).values()), 6
    )


def test_char_entropy_matches_python(spark, transcripts_pdf):
    from sqlfeatureextraction_spark.operators.textstats import (
        with_char_entropy,
    )

    pdf = transcripts_pdf[["conv_id", "turn_idx", "text"]].copy()
    df = spark.createDataFrame(
        pdf, "conv_id string, turn_idx int, text string"
    )
    got = {
        (r.conv_id, r.turn_idx): r.char_entropy
        for r in with_char_entropy(df).collect()
    }
    for r in pdf.itertuples():
        assert abs(got[(r.conv_id, r.turn_idx)] - _ent(r.text or "")) < 2e-6


def test_char_entropy_edges(spark):
    from sqlfeatureextraction_spark.operators.textstats import (
        with_char_entropy,
    )

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "abab"), (2, ""), (3, None), (4, "abcd")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.char_entropy for r in with_char_entropy(df).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 0.0, 3: 0.0, 4: 2.0}
