"""Markov transition statistics over conversation state sequences."""

from collections import Counter


def _brute(rows):
    by = {}
    for c, i, s in rows:
        by.setdefault(c, []).append((i, s or ""))
    cnt = Counter()
    for seq in by.values():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    tot = Counter()
    for (a, _), n in cnt.items():
        tot[a] += n
    return {
        k: (n, round(n / tot[k[0]], 6)) for k, n in cnt.items()
    }


def test_transitions_match_brute(spark, transcripts_pdf):
    from sqlfeatureextraction_spark.operators.sessionize import (
        transition_counts,
    )

    pdf = transcripts_pdf[["conv_id", "turn_idx", "tool"]]
    df = spark.createDataFrame(
        pdf, "conv_id string, turn_idx int, tool string"
    )
    got = {
        (r.prev_state, r.state): (r.n, r.p)
        for r in transition_counts(df).collect()
    }
    want = _brute([tuple(r) for r in pdf.itertuples(index=False)])
    assert got == want


def test_transitions_do_not_cross_conversations(spark):
    from sqlfeatureextraction_spark.operators.sessionize import (
        transition_counts,
    )

    df = spark.createDataFrame(
        [("a", 0, "x"), ("a", 1, "y"), ("b", 0, "y"), ("b", 1, "z")],
        "conv_id string, turn_idx int, tool string",
    )
    got = {
        (r.prev_state, r.state): r.n
        for r in transition_counts(df).collect()
    }
    # no (y, y) bridge between conv a's end and conv b's start
    assert got == {("x", "y"): 1, ("y", "z"): 1}
