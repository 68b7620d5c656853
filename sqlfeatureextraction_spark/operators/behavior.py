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

__all__ = ["retention_cohorts", "funnel_conversion"]

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
