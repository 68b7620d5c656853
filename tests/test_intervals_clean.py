"""Interval merge, consecutive near-dup pruning, P1-P4 text transforms."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from sqlfeatureextraction_spark.functions.sqlclean import (
    clean_sql_text,
    extract_table,
    filter_ddl_dml,
    prune_recurring,
    statement_gate,
)
from sqlfeatureextraction_spark.operators.intervals import (
    merge_intervals,
    prune_consecutive_neardups,
)


def test_merge_intervals_hand_case(spark):
    rows = [
        (1, 0, 10),
        (1, 5, 20),   # overlaps → island [0,20]
        (1, 21, 30),  # gap of 1 → new island
        (1, 25, 26),  # inside
        (2, 0, 1),
    ]
    df = spark.createDataFrame(rows, "user_id int, start_s long, end_s long")
    got = (
        merge_intervals(df)
        .toPandas()
        .sort_values(["user_id", "island_start"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [
        [1, 0, 20, 2],
        [1, 21, 30, 2],
        [2, 0, 1, 1],
    ]


def test_prune_consecutive_neardups(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("c", 0, "alpha beta gamma", base),
        ("c", 1, "alpha beta gamma", base + dt.timedelta(seconds=10)),  # dup
        ("c", 2, "alpha beta delta", base + dt.timedelta(seconds=20)),  # 2/3
        ("c", 3, "totally different words", base + dt.timedelta(seconds=30)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp"
    )
    kept = prune_consecutive_neardups(df, threshold=0.8).toPandas()
    assert sorted(kept["turn_idx"]) == [0, 2, 3]
    # cos(alpha beta gamma, alpha beta delta) = 2/3 survives 0.8
    assert abs(
        kept.set_index("turn_idx").loc[2, "prev_cos"] - 2 / 3
    ) < 1e-6


def test_clean_and_gates(spark):
    df = spark.createDataFrame(
        [
            (0, "select * from `db`.events_cluster; -- x\n"),
            (1, "CREATE TABLE t (x int)"),
            (2, "insert into t values (1)"),
            (3, "drop table t"),
            (4, "with cte as (select 1) select * from cte"),
        ],
        "id long, text string",
    )
    cleaned = df.select("id", clean_sql_text(F.col("text")).alias("c")).toPandas()
    assert cleaned.set_index("id").loc[0, "c"] == "select * from db.events -- x"
    assert set(filter_ddl_dml(df).toPandas()["id"]) == {0, 2, 4}
    assert set(statement_gate(df).toPandas()["id"]) == {0, 2}
    pruned = prune_recurring(df, [r"^drop\b", r"^CREATE\b"])
    assert set(pruned.toPandas()["id"]) == {0, 2, 4}


def test_extract_table(spark):
    df = spark.createDataFrame(
        [
            (0, "['db.events_cluster']"),
            (1, '["apm.spans"]'),
            (2, "plain_table"),
        ],
        "id long, tables string",
    )
    got = df.select("id", extract_table(F.col("tables")).alias("t")).toPandas()
    assert list(got.sort_values("id")["t"]) == ["events", "spans", "plain_table"]


def test_interval_join_hand_case_and_plan(spark):
    """Containment join: hits attach their island, misses get NULLs
    (left) or drop (inner); the plan is a bucketized equi-join —
    never a BroadcastNestedLoopJoin/Cartesian — and bucket width does
    not change results."""
    from sqlfeatureextraction_spark.operators.intervals import interval_join

    iv = spark.createDataFrame(
        [
            ("u1", 100, 200),
            ("u1", 5000, 5600),   # different bucket at bucket_s=3600
            ("u2", 150, 250),
        ],
        "user_id string, island_start long, island_end long",
    )
    ev = spark.createDataFrame(
        [
            ("u1", 1, 150),    # hit island 1
            ("u1", 2, 200),    # boundary hit (inclusive end)
            ("u1", 3, 300),    # miss (gap)
            ("u1", 4, 5600),   # boundary hit in later bucket
            ("u2", 5, 150),    # hit, other key
            ("u2", 6, 5000),   # miss (no u2 island there)
            ("u3", 7, 150),    # miss (unknown key)
        ],
        "user_id string, event_id long, ts_p long",
    )
    left = interval_join(
        ev, iv, key_col="user_id", ts_col="ts_p", bucket_s=3600, how="left"
    )
    got = {
        r["event_id"]: (r["island_start"], r["island_end"])
        for r in left.collect()
    }
    assert got == {
        1: (100, 200),
        2: (100, 200),
        3: (None, None),
        4: (5000, 5600),
        5: (150, 250),
        6: (None, None),
        7: (None, None),
    }
    inner = interval_join(
        ev, iv, key_col="user_id", ts_col="ts_p", bucket_s=3600, how="inner"
    )
    assert {r["event_id"] for r in inner.collect()} == {1, 2, 4, 5}

    # bucket-width invariance (replication factor changes, pairs don't)
    for b in (10, 100, 10**9):
        alt = interval_join(
            ev, iv, key_col="user_id", ts_col="ts_p", bucket_s=b, how="left"
        )
        assert sorted(map(tuple, alt.collect())) == sorted(
            map(tuple, left.collect())
        )

    plan = inner._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "Cartesian" not in plan


def test_interval_join_random_differential(spark):
    """Seeded sweep vs a brute-force nested-loop oracle: random keys,
    interval lengths straddling the bucket width (incl. zero-length
    and many-bucket spans), random probe times; disjointness NOT
    assumed by the oracle (overlaps produce multi-matches in both)."""
    import numpy as np

    from sqlfeatureextraction_spark.operators.intervals import interval_join

    for seed in (5, 6):
        rng = np.random.RandomState(seed)
        iv_rows = [
            (
                f"u{int(rng.randint(0, 5))}",
                int(s),
                int(s + rng.randint(0, 250)),
            )
            for s in rng.randint(0, 2000, size=40)
        ]
        ev_rows = [
            (f"u{int(rng.randint(0, 6))}", int(i), int(rng.randint(0, 2200)))
            for i in range(120)
        ]
        iv = spark.createDataFrame(
            iv_rows, "user_id string, island_start long, island_end long"
        )
        ev = spark.createDataFrame(
            ev_rows, "user_id string, event_id long, ts_p long"
        )
        got = sorted(
            map(
                tuple,
                interval_join(
                    ev,
                    iv,
                    key_col="user_id",
                    ts_col="ts_p",
                    bucket_s=100,
                    how="inner",
                ).collect(),
            )
        )
        want = sorted(
            (u, e, t, s, en)
            for (u, e, t) in ev_rows
            for (iu, s, en) in iv_rows
            if u == iu and s <= t <= en
        )
        assert got == want, seed


def test_interval_join_left_null_payload_no_duplication(spark):
    """Regression: a matched event carrying a NULL payload column must
    appear exactly once in how='left' output (the old inner+anti-join
    union compared all event columns with null-unsafe equality and
    double-emitted such rows)."""
    from sqlfeatureextraction_spark.operators.intervals import interval_join

    iv = spark.createDataFrame(
        [("u1", 100, 200)],
        "user_id string, island_start long, island_end long",
    )
    ev = spark.createDataFrame(
        [("u1", 1, 150, None), ("u1", 2, 999, None)],
        "user_id string, event_id long, ts_p long, note string",
    )
    out = interval_join(
        ev, iv, key_col="user_id", ts_col="ts_p", bucket_s=3600, how="left"
    ).collect()
    assert len(out) == 2
    got = {r["event_id"]: (r["island_start"], r["island_end"]) for r in out}
    assert got == {1: (100, 200), 2: (None, None)}


def test_interval_join_guards(spark):
    from sqlfeatureextraction_spark.operators.intervals import interval_join

    iv = spark.createDataFrame(
        [("u1", 100, 200)],
        "user_id string, island_start long, island_end long",
    )
    clash = spark.createDataFrame(
        [("u1", 150, 1)], "user_id string, ts_p long, island_start long"
    )
    with pytest.raises(ValueError, match="island_start"):
        interval_join(clash, iv, key_col="user_id", ts_col="ts_p")
    ok = spark.createDataFrame(
        [("u1", 150)], "user_id string, ts_p long"
    )
    with pytest.raises(ValueError, match="inner|left"):
        interval_join(ok, iv, key_col="user_id", ts_col="ts_p", how="full")
