"""Cohort retention and funnel conversion (behavior.py)."""

from pyspark.sql import functions as F

WEEK = 7 * 24 * 3600


def test_retention_cohorts_hand_built(spark):
    from sqlfeatureextraction_spark.operators.behavior import (
        retention_cohorts,
    )

    rows = [
        # u1: first week 0, active weeks 0,1,2
        (1, 10), (1, WEEK + 5), (1, 2 * WEEK + 5),
        # u2: first week 0, active weeks 0,2
        (2, 20), (2, 2 * WEEK + 9),
        # u3: first week 1, active week 1 only
        (3, WEEK + 100),
    ]
    df = spark.createDataFrame(rows, "user_id int, sec long").select(
        "user_id", F.col("sec").cast("timestamp").alias("ts")
    )
    got = {
        (r.cohort_week, r.week_offset): (r.n_active, r.retention)
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        (0, 0): (2, 1.0),
        (0, 1): (1, 0.5),
        (0, 2): (2, 1.0),
        (1, 0): (1, 1.0),
    }


def test_funnel_strict_ordering(spark):
    from sqlfeatureextraction_spark.operators.behavior import (
        funnel_conversion,
    )

    rows = [
        # u1: full ordered funnel
        (1, "signup", 10), (1, "view", 20), (1, "purchase", 30),
        # u2: purchase BEFORE signup -> not counted past step 1;
        # view after signup counts
        (2, "purchase", 5), (2, "signup", 10), (2, "view", 15),
        # u3: signup only
        (3, "signup", 50),
        # u4: never signed up -> contributes nowhere
        (4, "view", 1), (4, "purchase", 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, sec long"
    ).select(
        "user_id", "event_type", F.col("sec").cast("timestamp").alias("ts")
    )
    got = {
        r.step_idx: (r.step, r.n_users, r.conversion)
        for r in funnel_conversion(
            df, ["signup", "view", "purchase"]
        ).collect()
    }
    assert got == {
        1: ("signup", 3, 1.0),
        2: ("view", 2, round(2 / 3, 6)),
        3: ("purchase", 1, round(1 / 3, 6)),
    }


def test_funnel_same_ts_counts(spark):
    from sqlfeatureextraction_spark.operators.behavior import (
        funnel_conversion,
    )

    # step 2 at the SAME second as step 1 counts (>=, not >)
    rows = [(1, "signup", 10), (1, "purchase", 10)]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, sec long"
    ).select(
        "user_id", "event_type", F.col("sec").cast("timestamp").alias("ts")
    )
    got = {
        r.step_idx: r.n_users
        for r in funnel_conversion(df, ["signup", "purchase"]).collect()
    }
    assert got == {1: 1, 2: 1}
