"""Conversation-level structural feature vector."""


def _ntok(s):
    s = (s or "").strip()
    return len(s.split()) if s else 0


def test_conversation_features_brute(spark, transcripts_pdf):
    from sqlfeatureextraction_spark.operators.sessionize import (
        conversation_features,
    )

    pdf = transcripts_pdf[["conv_id", "turn_idx", "role", "text", "ts"]]
    df = spark.createDataFrame(pdf)
    got = {
        r.conv_id: r
        for r in conversation_features(df, ts_col="ts").collect()
    }
    for conv, grp in pdf.groupby("conv_id"):
        grp = grp.sort_values("turn_idx")
        roles = [x or "" for x in grp["role"]]
        r = got[conv]
        assert r.n_turns == len(grp)
        for name in ("user", "assistant", "tool", "system"):
            assert r[f"n_{name}"] == sum(1 for x in roles if x == name)
        assert r.n_tokens == sum(_ntok(t) for t in grp["text"])
        changes = sum(
            1 for a, b in zip(roles, roles[1:]) if a != b
        )
        want_alt = round(changes / max(len(grp) - 1, 1), 6)
        assert abs(r.alternation_ratio - want_alt) < 1e-9
        ts = [int(t.timestamp()) for t in grp["ts"]]
        if len(ts) > 1:
            gaps = [b - a for a, b in zip(ts, ts[1:])]
            assert abs(r.mean_gap_s - round(sum(gaps) / len(gaps), 4)) < 1e-9
        else:
            assert r.mean_gap_s is None


def test_conversation_features_single_turn(spark):
    from sqlfeatureextraction_spark.operators.sessionize import (
        conversation_features,
    )

    df = spark.createDataFrame(
        [("a", 0, "user", "hi there")],
        "conv_id string, turn_idx int, role string, text string",
    )
    r = conversation_features(df).collect()[0]
    assert r.n_turns == 1 and r.n_user == 1 and r.n_tokens == 2
    assert r.alternation_ratio == 0.0
