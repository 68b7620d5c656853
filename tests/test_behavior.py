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


def test_basket_lift_brute_force(spark):
    from itertools import combinations

    from sqlfeatureextraction_spark.operators.behavior import (
        basket_lift_pairs,
    )

    baskets = {
        1: {"a", "b", "c"},
        2: {"a", "b"},
        3: {"a", "c"},
        4: {"b", "c"},
        5: {"a"},
    }
    rows = [
        (b, i) for b, items in baskets.items() for i in items
    ] + [(1, "a")]  # duplicate event -> distinct-ed away
    df = spark.createDataFrame(rows, "user_id int, event_type string")
    got = {
        (r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b, r.lift)
        for r in basket_lift_pairs(df, min_support=2).collect()
    }
    nb = len(baskets)
    item_n = {}
    pair_n = {}
    for items in baskets.values():
        for i in items:
            item_n[i] = item_n.get(i, 0) + 1
        for a, b in combinations(sorted(items), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    exp = {}
    for (a, b), nab in pair_n.items():
        if nab >= 2:
            lift = (nab / nb) / ((item_n[a] / nb) * (item_n[b] / nb))
            exp[(a, b)] = (nab, item_n[a], item_n[b], round(lift, 6))
    assert got == exp


def test_seasonality_strength_signal_vs_noise(spark):
    import math

    from sqlfeatureextraction_spark.operators.behavior import (
        seasonality_strength,
    )

    rows = []
    # 'sine': value determined entirely by hour -> strength ~ 1
    # 'flatnoise': constant per hour pattern absent -> strength ~ 0
    vals = {}
    for day in range(4):
        for hour in range(24):
            sec = (day * 24 + hour) * 3600
            rows.append(("sine", sec, 10.0 + 5 * math.sin(hour)))
            rows.append(("flatnoise", sec, float((day * 24 + hour) % 7)))
    df = spark.createDataFrame(
        rows, "grp string, sec long, value double"
    ).select("grp", F.col("sec").cast("timestamp").alias("ts"), "value")
    got = {
        r.grp: (r.n, r.strength)
        for r in seasonality_strength(df, "grp").collect()
    }
    assert got["sine"][0] == 96
    assert got["sine"][1] == 1.0  # zero within-hour variance
    assert got["flatnoise"][1] < 0.3

    # brute check of the variance identity for flatnoise
    from collections import defaultdict

    cells = defaultdict(list)
    allv = []
    for g, sec, v in rows:
        if g == "flatnoise":
            cells[(sec // 3600) % 24].append(v)
            allv.append(v)
    ssw = sum(
        sum((x - sum(c) / len(c)) ** 2 for x in c)
        for c in cells.values()
    )
    m = sum(allv) / len(allv)
    sst = sum((x - m) ** 2 for x in allv)
    assert abs(got["flatnoise"][1] - (1 - ssw / sst)) < 1e-6
