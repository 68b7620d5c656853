"""Time-decayed EWMA via prefix-sum rescaling."""

import math
from datetime import datetime, timedelta


def _brute(rows, half_life):
    lam = math.log(2) / half_life
    by = {}
    for c, t, v in rows:
        by.setdefault(c, []).append((t, v))
    out = {}
    for c, evs in by.items():
        evs.sort()
        for i, (ti, _) in enumerate(evs):
            out[(c, ti)] = round(
                sum(v * math.exp(-lam * (ti - tj)) for tj, v in evs[: i + 1]),
                6,
            )
    return out


def test_ewma_matches_direct_sum(spark):
    from sqlfeatureextraction_spark.operators.pit_window import (
        ewma_time_decay,
    )

    import numpy as np

    rng = np.random.default_rng(13)
    rows = []
    for c in range(8):
        t = 0
        for _ in range(60):
            t += int(rng.integers(1, 4000))
            rows.append((f"c{c}", t, float(np.round(rng.uniform(0, 10), 2))))
    df = spark.createDataFrame(
        [
            (c, datetime(2024, 1, 1) + timedelta(seconds=t), v)
            for c, t, v in rows
        ],
        "conv_id string, ts timestamp, value double",
    )
    got = {
        (r.conv_id, int(r.ts.timestamp() - datetime(2024, 1, 1).timestamp())): r.ewma
        for r in ewma_time_decay(df, half_life_s=3600).collect()
    }
    want = _brute(rows, 3600)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 5e-6, k


def test_ewma_halves_at_half_life(spark):
    from sqlfeatureextraction_spark.operators.pit_window import (
        ewma_time_decay,
    )

    df = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 0, 0), 8.0),
            ("a", datetime(2024, 1, 1, 1, 0, 0), 0.0),
            ("a", datetime(2024, 1, 1, 2, 0, 0), 0.0),
        ],
        "conv_id string, ts timestamp, value double",
    )
    vals = [
        r.ewma
        for r in ewma_time_decay(df, half_life_s=3600)
        .orderBy("ts")
        .collect()
    ]
    assert vals == [8.0, 4.0, 2.0]
