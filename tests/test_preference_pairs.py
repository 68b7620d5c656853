"""Preference-pair (chosen/rejected) construction for DPO."""


def _brute(rows):
    """rows: (conv, idx, role, text, score) sorted by (conv, idx)."""
    out = {}
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r[0], []).append(r)
    for conv, grp in by_conv.items():
        grp.sort(key=lambda r: r[1])
        last_prompt = None
        groups = {}
        for _, idx, role, text, score in grp:
            if role == "user":
                last_prompt = (idx, text or "")
            elif role == "assistant" and last_prompt is not None:
                groups.setdefault(last_prompt, []).append(
                    (idx, text or "", float(score))
                )
        for (pidx, ptext), resp in groups.items():
            if len(resp) < 2:
                continue
            chosen = max(resp, key=lambda r: (r[2], -r[0]))
            rejected = min(resp, key=lambda r: (r[2], -r[0]))
            if chosen[2] <= rejected[2]:
                continue
            out[(conv, pidx)] = (
                ptext,
                len(resp),
                chosen[0],
                chosen[1],
                chosen[2],
                rejected[0],
                rejected[1],
                rejected[2],
            )
    return out


def _run(spark, rows):
    from sqlfeatureextraction_spark.operators.sessionize import (
        build_preference_pairs,
    )

    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, score double"
    )
    got = {
        (r.conv_id, r.prompt_idx): (
            r.prompt_text,
            r.n_responses,
            r.chosen_idx,
            r.chosen_text,
            r.chosen_score,
            r.rejected_idx,
            r.rejected_text,
            r.rejected_score,
        )
        for r in build_preference_pairs(df, score_col="score").collect()
    }
    assert got == _brute(rows)
    return got


def test_preference_pairs_edges(spark):
    rows = [
        # two regenerations -> one pair
        ("a", 0, "user", "q1", 0.0),
        ("a", 1, "assistant", "bad", 1.0),
        ("a", 2, "assistant", "good", 5.0),
        # single response -> no pair
        ("a", 3, "user", "q2", 0.0),
        ("a", 4, "assistant", "only", 9.0),
        # equal best/worst scores -> no pair (margin filter)
        ("b", 0, "user", "q3", 0.0),
        ("b", 1, "assistant", "x", 2.0),
        ("b", 2, "assistant", "y", 2.0),
        # three responses with a score tie at the top: earlier wins chosen
        ("c", 0, "user", "q4", 0.0),
        ("c", 1, "assistant", "t1", 7.0),
        ("c", 2, "assistant", "t2", 7.0),
        ("c", 3, "assistant", "t3", 1.0),
        # tool turns skipped over; orphan response (no prompt) dropped
        ("d", 0, "assistant", "orphan", 3.0),
        ("d", 1, "user", "q5", 0.0),
        ("d", 2, "tool", "lookup", 0.0),
        ("d", 3, "assistant", "r1", 1.0),
        ("d", 4, "assistant", "r2", 2.0),
    ]
    got = _run(spark, rows)
    assert set(got) == {("a", 0), ("c", 0), ("d", 1)}
    assert got[("a", 0)][2:5] == (2, "good", 5.0)
    assert got[("c", 0)][2] == 1  # earlier of the tied-at-7 pair
    assert got[("c", 0)][5] == 3


def test_preference_pairs_random(spark, transcripts_pdf):
    import numpy as np

    rng = np.random.default_rng(7)
    pdf = transcripts_pdf[["conv_id", "turn_idx", "role", "text"]].copy()
    pdf["score"] = np.round(rng.uniform(0, 10, len(pdf)), 2)
    rows = [tuple(r) for r in pdf.itertuples(index=False)]
    _run(spark, rows)
