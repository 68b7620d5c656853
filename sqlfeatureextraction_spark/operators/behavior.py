"""Behavioral event analytics: cohort retention and ordered funnel
conversion — the two classic product-analytics aggregations, expressed
Spark-first over the events table (the same user/ts/event_type shape
the reference's session logs reduce to; its windowed query-count
metrics, enc/APMWindowFragmentIntent.java's per-window totals, are the
degenerate single-step case).

Both operators share the scale rules of the rest of the engine:
per-user reductions are map-side-combinable aggregates on the ONE
user key, cross-user results are tiny (cohort x offset / step tables),
and nothing row-global exists anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "retention_cohorts",
    "funnel_conversion",
    "basket_lift_pairs",
    "seasonality_strength",
]

WEEK_S = 7 * 24 * 3600


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    origin_ts: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the week
    of their FIRST event; for each (cohort_week, week_offset) the
    output counts distinct users active that week and the ratio to the
    cohort size — the standard "are users who arrived in week c still
    here k weeks later" triangle.

    Weeks are epoch-second floors from ``origin_ts`` (default 0 =
    epoch-aligned weeks, identical arithmetic in the oracle).

    Plan: (1) per-user first-ts aggregate (ONE map-side-combinable
    groupBy on the user key); (2) distinct (user, week) activity
    pairs (same key family — Catalyst reuses the exchange); (3) join
    activity to cohorts on the user key and reduce to the cohort x
    offset cell counts; (4) broadcast the cohort-size aggregate (#
    cohorts rows) back onto the cells.  Nothing bigger than distinct
    (user, week) ever shuffles; the result is weeks^2/2 rows.

    Output: (cohort_week, week_offset, n_active, retention) with
    week_offset 0 rows = cohort sizes (retention 1.0).
    """
    org = int(origin_ts or 0)
    ts_sec = F.col(ts_col).cast("timestamp").cast("long")
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.floor((ts_sec - org) / WEEK_S).cast("long").alias("_w"),
    ).where(F.col("_w").isNotNull())
    cohorts = ev.groupBy("_u").agg(F.min("_w").alias("_cw"))
    active = ev.distinct()
    cells = (
        active.join(cohorts, "_u")
        .groupBy(
            F.col("_cw").alias("cohort_week"),
            (F.col("_w") - F.col("_cw")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = cohorts.groupBy(F.col("_cw").alias("cohort_week")).agg(
        F.count(F.lit(1)).alias("_size")
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("_size"), round_dp).alias(
                "retention"
            ),
        )
    )


def funnel_conversion(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_dp: int = 6,
) -> DataFrame:
    """Ordered funnel: how many users performed step 1, THEN step 2 at
    or after their step-1 time, THEN step 3 after that, ... — the
    strictly-sequenced conversion count (an unordered distinct-step
    count would credit a purchase that preceded the signup).

    The sequential scan per user is a fold over per-step sorted
    timestamp arrays: t_1 = min ts(step 1); t_k = first ts(step k)
    >= t_{k-1}.  One groupBy on the user key collects each step's
    sorted ts array (``sort_array(collect_list(...))`` conditioned
    per step — per-user state bounded by that user's event count,
    the same bound every sessionize window already carries); the walk
    itself is array_min/filter higher-order functions — per-row
    codegen, no Python, no joins, no window.  Cross-user output is
    the len(steps)-row funnel.

    Output: one row per step (step_idx, step, n_users, conversion)
    with conversion = n_users / n_users(step 1); NULL-safe (a user
    missing a step stops contributing downstream).
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    ts_sec = F.col(ts_col).cast("timestamp").cast("long")
    ev = df.where(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        ts_sec.alias("_s"),
    )
    per_user = ev.groupBy("_u").agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("_t") == s, F.col("_s")))
            ).alias(f"_ts_{i}")
            for i, s in enumerate(steps)
        ]
    )
    # fold: t_k = min element of _ts_k that is >= t_{k-1}
    reached = per_user
    prev = F.array_min(F.col("_ts_0"))
    reached = reached.withColumn("_r_0", prev)
    def _ge(prev_col):
        # one-arg lambda: a two-arg lambda would be interpreted by
        # PySpark as (element, index)
        return lambda x: x >= prev_col

    for i in range(1, len(steps)):
        prev = F.array_min(
            F.filter(F.col(f"_ts_{i}"), _ge(F.col(f"_r_{i - 1}")))
        )
        reached = reached.withColumn(f"_r_{i}", prev)
    counts = reached.agg(
        *[
            F.count(F.col(f"_r_{i}")).alias(f"_n_{i}")
            for i in range(len(steps))
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.col(f"_n_{i}").alias("n_users"),
                        F.round(
                            F.col(f"_n_{i}")
                            / F.greatest(F.col("_n_0"), F.lit(1)),
                            round_dp,
                        ).alias("conversion"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.*")


def basket_lift_pairs(
    df: DataFrame,
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_support: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Association-rule mining over (basket, item) events: for every
    unordered item pair, support counts and LIFT = P(ab)/(P(a)P(b))
    over baskets — the classic co-occurrence miner (which tools get
    used together, which event types co-fire) with the
    frequent-but-independent pairs deflated exactly as PMI does for
    adjacent tokens (lift is PMI's exponential over baskets instead
    of positions).

    Plan: distinct (basket, item) pairs (ONE corpus shuffle on the
    basket key); per-basket sorted item ARRAYS, pairs generated
    per-row by a nested transform/flatten over the (small,
    per-basket-distinct) item array — no self-join of the pair table;
    item and pair supports are map-side-combinable counts over
    ITEM-TYPE-sized outputs; the basket total is one broadcast
    scalar.  Pair ordering inside a basket is lexicographic
    (a < b), deterministic.

    Output: (item_a, item_b, n_ab, n_a, n_b, lift) for pairs with
    n_ab >= min_support.
    """
    d = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).where(F.col("_i").isNotNull()).distinct()
    # three consumers (basket total, item supports, per-basket
    # arrays) read this distinct frame — materialize it once instead
    # of recomputing the scan+distinct per consumer
    d = d.localCheckpoint(eager=True)
    n_baskets = d.select("_b").distinct().count()
    items = d.groupBy("_i").agg(F.count(F.lit(1)).alias("_ni"))
    arrs = d.groupBy("_b").agg(
        F.sort_array(F.collect_list("_i")).alias("_arr")
    )
    pairs = arrs.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("_arr"),
                    lambda a, i: F.filter(
                        F.transform(
                            F.col("_arr"),
                            lambda b, j: F.when(
                                j > i, F.struct(a.alias("a"), b.alias("b"))
                            ),
                        ),
                        lambda s: s.isNotNull(),
                    ),
                )
            )
        ).alias("_pr")
    ).select(F.col("_pr.a").alias("item_a"), F.col("_pr.b").alias("item_b"))
    pc = (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= int(min_support))
    )
    out = (
        pc.join(
            items.select(
                F.col("_i").alias("item_a"), F.col("_ni").alias("n_a")
            ),
            "item_a",
        )
        .join(
            items.select(
                F.col("_i").alias("item_b"), F.col("_ni").alias("n_b")
            ),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_ab") / F.lit(float(n_baskets)))
                / (
                    (F.col("n_a") / F.lit(float(n_baskets)))
                    * (F.col("n_b") / F.lit(float(n_baskets)))
                ),
                round_dp,
            ).alias("lift"),
        )
    )
    return out


def seasonality_strength(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    round_dp: int = 6,
) -> DataFrame:
    """Hour-of-day seasonal profile strength per group: fit the
    trivial seasonal model value ~ mean(value | hour) and report
    strength = 1 - Var(residual)/Var(total) — the standard
    "how periodic is this metric" decomposition statistic (STL's
    seasonal-strength measure with seasonal means as the fit).

    Two map-side-combinable aggregates ((group, hour) cell moments,
    group totals) and a broadcast join-back; the variance identity
    Var(resid) = sum_h n_h * (Var_h) / n means strength derives from
    WITHIN-hour variances alone — nothing row-sized recrosses the
    wire after the first aggregate.  Groups with < 2 rows or zero
    variance yield NULL strength.

    Output: (group_col, n, strength).
    """
    ts_sec = F.col(ts_col).cast("timestamp").cast("long")
    d = df.where(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        (F.floor(ts_sec / 3600) % 24).alias("_h"),
        F.col(value_col).cast("double").alias("_v"),
    )
    cells = d.groupBy("_g", "_h").agg(
        F.count(F.lit(1)).alias("_nh"),
        F.sum("_v").alias("_sh"),
        F.sum(F.col("_v") * F.col("_v")).alias("_qh"),
    )
    g = cells.groupBy("_g").agg(
        F.sum("_nh").alias("n"),
        F.sum("_sh").alias("_s"),
        F.sum("_qh").alias("_q"),
        # within-hour sum of squared deviations: q_h - s_h^2/n_h
        F.sum(
            F.col("_qh") - F.col("_sh") * F.col("_sh") / F.col("_nh")
        ).alias("_ssw"),
    )
    sst = F.col("_q") - F.col("_s") * F.col("_s") / F.col("n")
    strength = F.when(
        (F.col("n") > 1) & (sst > 0),
        F.lit(1.0) - F.col("_ssw") / sst,
    )
    return g.select(
        F.col("_g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.round(strength, round_dp).alias("strength"),
    )
