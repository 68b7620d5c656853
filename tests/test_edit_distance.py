"""Turn-over-turn edit-distance features."""


def _lev(a, b):
    if a is None or b is None:
        return None
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[lb]


def test_edit_distance_prev_turn(spark):
    from sqlfeatureextraction_spark.operators.sessionize import (
        with_edit_distance_features,
    )

    rows = [
        ("a", 0, "user", "run the test"),
        ("a", 1, "user", "run the tests"),   # 1-char resubmission
        ("a", 2, "assistant", "done"),
        ("b", 0, "user", ""),
        ("b", 1, "user", ""),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r.conv_id, r.turn_idx): (r.prev_len, r.edit_dist, r.edit_sim)
        for r in with_edit_distance_features(df).collect()
    }
    assert got[("a", 0)] == (None, None, None)
    assert got[("a", 1)] == (12, 1, round(1 - 1 / 13, 6))
    assert got[("a", 2)] == (13, _lev("done", "run the tests"), round(
        1 - _lev("done", "run the tests") / 13, 6
    ))
    assert got[("b", 1)] == (0, 0, 1.0)  # empty vs empty: identical


def test_edit_distance_same_role_variant(spark, transcripts_pdf):
    from sqlfeatureextraction_spark.operators.sessionize import (
        with_edit_distance_features,
    )

    pdf = transcripts_pdf[["conv_id", "turn_idx", "role", "text"]].head(
        300
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r.conv_id, r.turn_idx): (r.edit_dist, r.edit_sim)
        for r in with_edit_distance_features(
            df, role_col="role"
        ).collect()
    }
    prev = {}
    for r in pdf.sort_values(["conv_id", "turn_idx"]).itertuples():
        key = (r.conv_id, r.role or "")
        cur = r.text or ""
        p = prev.get(key)
        want_d = _lev(cur, p)
        d, s = got[(r.conv_id, r.turn_idx)]
        assert d == want_d
        if p is not None:
            mx = max(len(cur), len(p))
            want_s = 1.0 if mx == 0 else round(1 - want_d / mx, 6)
            assert abs(s - want_s) < 1e-9
        prev[key] = cur
