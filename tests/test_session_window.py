"""Native session_window vs the lag-flag gap-session formulation."""

from datetime import datetime, timedelta


def _brute(rows, gap_s):
    """(conv, ts_sec, value) -> sessions split at diff > gap_s
    (Spark session_window merges an exact-gap arrival)."""
    by = {}
    for c, t, v in rows:
        by.setdefault(c, []).append((t, v))
    out = []
    for c, evs in by.items():
        evs.sort()
        cur = [evs[0]]
        for t, v in evs[1:]:
            if t - cur[-1][0] > gap_s:
                out.append(
                    (c, cur[0][0], cur[-1][0] + gap_s, len(cur),
                     round(sum(x[1] for x in cur), 4))
                )
                cur = [(t, v)]
            else:
                cur.append((t, v))
        out.append(
            (c, cur[0][0], cur[-1][0] + gap_s, len(cur),
             round(sum(x[1] for x in cur), 4))
        )
    return sorted(out)


def test_session_window_matches_gap_formulation(spark):
    from sqlfeatureextraction_spark.operators.windows import (
        session_window_agg,
    )

    base = 1_700_000_000
    rows = [
        # conv a: gaps 100, 299, exactly 300 (MERGE), then 301 (SPLIT)
        ("a", base, 1.0),
        ("a", base + 100, 2.0),
        ("a", base + 399, 3.0),
        ("a", base + 699, 4.0),
        ("a", base + 1000, 5.0),
        # conv b: single event
        ("b", base + 5, 10.0),
        # conv c: two sessions far apart
        ("c", base, 1.5),
        ("c", base + 10_000, 2.5),
    ]
    df = spark.createDataFrame(
        [
            (c, datetime(1970, 1, 1) + timedelta(seconds=t), v)
            for c, t, v in rows
        ],
        "conv_id string, ts timestamp, value double",
    )
    got = sorted(
        (r.conv_id, r.session_start, r.session_end, r.n_events, r.total)
        for r in session_window_agg(
            df, gap_s=300, value_col="value"
        ).collect()
    )
    assert got == _brute(rows, 300)
    # exact-gap merged, strict-gap split: conv a has exactly 2 sessions
    assert sum(1 for g in got if g[0] == "a") == 2
    assert ("a", base, base + 699 + 300, 4, 10.0) in got


def test_session_window_matches_transcripts(spark, transcripts_df):
    from sqlfeatureextraction_spark.operators.windows import (
        session_window_agg,
    )

    rows = [
        (r.conv_id, int(r.ts.timestamp()), float(r.duration_ms))
        for r in transcripts_df.select(
            "conv_id", "ts", "duration_ms"
        ).collect()
    ]
    got = sorted(
        (r.conv_id, r.session_start, r.session_end, r.n_events, r.total)
        for r in session_window_agg(
            transcripts_df, gap_s=1800, value_col="duration_ms"
        ).collect()
    )
    assert got == _brute(rows, 1800)
