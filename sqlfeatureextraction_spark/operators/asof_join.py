"""Generic two-table as-of (point-in-time) join.

Reference analog J4 (SURVEY §2.3): each SLIDING window is a per-entity
backward range lookup (enc/APMWindowFragmentIntent.java:279-300).  The
generalization a feature store needs: for every left row (by, ts),
attach the newest right row with ts' ≤ ts (backward; optional
tolerance), never a future row — the as-of join IS the zero-leakage
primitive.

Spark has no native as-of join; two formulations:

  union-trick (default, pure built-ins): tag both sides, union on a
  common schema, one window per `by` ordered by (ts, is_left) with
  last(right_value, ignorenulls) over rowsBetween(unboundedPreceding,
  current) — right rows at the same ts sort BEFORE left rows, making
  the bound inclusive (ts' ≤ ts).  ONE shuffle of |L|+|R| rows, sort-
  based, no join blow-up, AQE-skew-safe.

  merge_asof (throughput path for wide right payloads):
  repartition both sides by `by`, applyInPandas pd.merge_asof per
  group — used when the right row carries many columns (the union
  trick would null-pad them through the shuffle).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts_sec",
    by: str = "user_id",
    value_cols: tuple = ("value",),
    tolerance_s: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join via the union trick (built-ins only).

    Returns `left` plus, per value column v, `v_asof` (newest right
    value with right.on ≤ left.on, same `by`), and `asof_ts{suffix}`.
    Ties at equal `on`: the right row is visible to the left row.
    """
    lcols = left.columns
    l = left.withColumn("_is_left", F.lit(1))
    r = right.select(
        by,
        F.col(on).alias(on),
        *[F.col(c) for c in value_cols],
    ).withColumn("_is_left", F.lit(0))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in value_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    u = l.select(*lcols, "_is_left", *[c for c in value_cols if c not in lcols]).unionByName(
        r.select(*lcols, "_is_left", *[c for c in value_cols if c not in lcols]),
        allowMissingColumns=True,
    )

    # right rows (is_left=0) sort before left rows at equal ts → ties
    # are visible; running last(ignorenulls) carries the newest right
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    right_ts = F.when(F.col("_is_left") == 0, F.col(on))
    out = u.withColumn(f"asof_ts{suffix}", F.last(right_ts, ignorenulls=True).over(w))
    for c in value_cols:
        rv = F.when(F.col("_is_left") == 0, F.col(c))
        out = out.withColumn(f"{c}{suffix}", F.last(rv, ignorenulls=True).over(w))
    out = out.where(F.col("_is_left") == 1)
    if tolerance_s is not None:
        stale = F.col(f"asof_ts{suffix}") < F.col(on) - tolerance_s
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
            )
        out = out.withColumn(
            f"asof_ts{suffix}",
            F.when(stale, F.lit(None)).otherwise(F.col(f"asof_ts{suffix}")),
        )
    return out.select(
        *lcols,
        f"asof_ts{suffix}",
        *[f"{c}{suffix}" for c in value_cols],
    )


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts_sec",
    by: str = "user_id",
    value_cols: tuple = ("value",),
    tolerance_s: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """applyInPandas pd.merge_asof per `by` group (cogroup formulation)."""
    lcols = left.columns
    out_fields = ", ".join(
        f"`{c}` {t}" for c, t in left.dtypes
    )
    r_types = dict(right.dtypes)
    extra = ", ".join(
        [f"`asof_ts{suffix}` bigint"]
        + [f"`{c}{suffix}` {r_types[c]}" for c in value_cols]
    )
    schema = f"{out_fields}, {extra}"

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on, kind="mergesort")
        rr = rpdf[[on, *value_cols]].sort_values(on, kind="mergesort")
        rr = rr.rename(
            columns={on: f"asof_ts{suffix}", **{c: f"{c}{suffix}" for c in value_cols}}
        )
        merged = pd.merge_asof(
            lpdf,
            rr,
            left_on=on,
            right_on=f"asof_ts{suffix}",
            direction="backward",
            tolerance=tolerance_s,
        )
        return merged[
            lcols + [f"asof_ts{suffix}"] + [f"{c}{suffix}" for c in value_cols]
        ]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(fn, schema)
    )
