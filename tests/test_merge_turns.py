"""Consecutive same-role turn merging (chat-template normalization)."""


def _brute(rows, sep="\n"):
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r[0], []).append(r)
    out = []
    for conv, grp in by_conv.items():
        grp.sort(key=lambda r: r[1])
        seg = -1
        prev_role = object()
        segs = []
        for _, idx, role, text in grp:
            role = role or ""
            if role != prev_role:
                seg += 1
                segs.append([role, [], []])
                prev_role = role
            segs[-1][1].append(text or "")
            segs[-1][2].append(idx)
        for i, (role, texts, idxs) in enumerate(segs):
            out.append(
                (conv, i, role, sep.join(texts), len(texts), idxs[0], idxs[-1])
            )
    return sorted(out)


def _run(spark, rows):
    from sqlfeatureextraction_spark.operators.sessionize import (
        merge_consecutive_turns,
    )

    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = sorted(tuple(r) for r in merge_consecutive_turns(df).collect())
    assert got == _brute(rows)
    return got


def test_merge_turns_edges(spark):
    rows = [
        ("a", 0, "user", "hi"),
        ("a", 1, "user", "anyone?"),
        ("a", 2, "assistant", "hello"),
        ("a", 3, "assistant", None),      # NULL text joins as ""
        ("a", 4, "assistant", "done"),
        ("a", 5, "user", "thanks"),
        ("b", 0, None, "x"),              # NULL role groups as ""
        ("b", 1, None, "y"),
        ("b", 2, "user", "z"),
    ]
    got = _run(spark, rows)
    assert ("a", 0, "user", "hi\nanyone?", 2, 0, 1) in got
    assert ("a", 1, "assistant", "hello\n\ndone", 3, 2, 4) in got
    assert ("a", 2, "user", "thanks", 1, 5, 5) in got
    assert ("b", 0, "", "x\ny", 2, 0, 1) in got


def test_merge_turns_fixture(spark, transcripts_pdf):
    pdf = transcripts_pdf[["conv_id", "turn_idx", "role", "text"]]
    _run(spark, [tuple(r) for r in pdf.itertuples(index=False)])
