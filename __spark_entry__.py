"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship transcript feature pipeline on
sf0.001.  ``queries()`` exposes one entry per implemented operator
(SURVEY.md §2) over the driver-provided tables; ``oracle_sql()`` gives
the DuckDB-equivalent SQL for each SQL-expressible one.

Column-name parity: every computed column is aliased identically in
the Spark code and the SQL.  Float aggregates are rounded to a fixed
number of decimals strictly finer than the data's decimal granularity
(events.value / lineitem prices are 2dp, so true sums are exact
multiples of 0.01 and both engines round identically despite
summation-order fp noise).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"
SESSION_GAP_S = 1800


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ts is TIMESTAMP_NTZ in parquet; session TZ is UTC so the double cast
    # yields the same epoch seconds DuckDB's epoch() computes
    return ev.withColumn("ts_sec", F.col("ts").cast("timestamp").cast("long"))


def _tokens(col):
    arr = F.split(F.lower(F.coalesce(col, F.lit(""))), TOKEN_RE)
    return F.filter(arr, lambda t: t != F.lit(""))


# ---------------------------------------------------------------- flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end point-in-time window features over the
    transcript-shaped view of events at sf0.001."""
    from sqlfeatureextraction_spark.config import FeatureConfig
    from sqlfeatureextraction_spark.operators.pit_window import (
        window_features_builtin,
    )
    from sqlfeatureextraction_spark.operators.vectorize import with_turn_features
    from sqlfeatureextraction_spark.synth import events_as_transcripts
    from sqlfeatureextraction_spark.vocab import fit_vocabulary

    cfg = FeatureConfig()
    tx = events_as_transcripts(spark, "/root/testdata/sf0.001")
    vocab = fit_vocabulary(tx, max_tokens=256)
    vec, layout = with_turn_features(tx, vocab, cfg)
    wf = window_features_builtin(vec, vocab, cfg, layout)
    return wf.select("conv_id", "ts", F.size("window_features").alias("width"))


# ---------------------------------------------------------------- queries


def _q_pit_window_sum(spark, sf_dir):
    """W2/W3: right-closed trailing (ts−300s, ts] per-entity window agg."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-299, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.round(F.sum("value").over(w), 4).alias("w_sum"),
        F.count("*").over(w).alias("w_cnt"),
    )


def _q_sessionize(spark, sf_dir):
    """Gap-based sessionization with monotonic session_id (running sum
    of gap-exceeded flags)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    gap = F.col("ts_sec") - F.lag("ts_sec").over(w)
    flag = F.when(gap > SESSION_GAP_S, F.lit(1)).otherwise(F.lit(0))
    return ev.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.sum(flag)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )


def _q_lag_lead(spark, sf_dir):
    """W10/P9 analog: lag gap + lead value per entity, stable order."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_sec") - F.lag("ts_sec").over(w)).alias("prev_gap_s"),
        F.lead("value").over(w).alias("next_value"),
    )


def _q_topk_per_group(spark, sf_dir):
    """W6/W7: top-3 rows per entity by value (cost) desc, defined ties."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("user_id", "rk", "event_id", "value")
    )


def _q_asof_last_match(spark, sf_dir):
    """J4 as-of lookup: most recent 'signup' value at-or-before each
    event (backward as-of via last(ignorenulls) running window)."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sig = F.when(F.col("event_type") == "signup", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(sig, ignorenulls=True).over(w).alias("last_signup_value"),
    )


def _q_backfill_spine(spark, sf_dir):
    """W5 backfill: dense per-entity minute spine, zero-filled counts."""
    ev = _events(spark, sf_dir).withColumn(
        "minute", F.floor(F.col("ts_sec") / 60).cast("long")
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("minute").alias("mn"), F.max("minute").alias("mx")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("mn", "mx")).alias("minute")
    )
    cnt = ev.groupBy("user_id", "minute").agg(F.count("*").alias("n"))
    return spine.join(cnt, ["user_id", "minute"], "left").select(
        "user_id",
        "minute",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
    )


def _q_dedup_exact(spark, sf_dir):
    """Exact dedupe on documents: canonical doc per identical text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


def _q_text_stats(spark, sf_dir):
    """Text analysis: token count + char length per document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.length("text").alias("n_chars_txt"),
    )


def _q_vocab_fit(spark, sf_dir):
    """S2 vocabulary fit: distinct tokens, lexicographic bit positions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("token")).distinct()
    w = Window.orderBy("token")
    return toks.select(
        "token", (F.row_number().over(w) - 1).cast("int").alias("bit_pos")
    )


def _q_group_agg(spark, sf_dir):
    """A1-A3 family: multi-agg groupBy (TPC-H Q1 shape) on lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


def _q_transcript_window_features(spark, sf_dir):
    """Flagship pipeline (non-SQL-expressible: fixed-width vector
    assembly) — rows-only check."""
    from sqlfeatureextraction_spark.config import FeatureConfig
    from sqlfeatureextraction_spark.operators.pit_window import (
        window_features_builtin,
    )
    from sqlfeatureextraction_spark.operators.vectorize import with_turn_features
    from sqlfeatureextraction_spark.synth import events_as_transcripts
    from sqlfeatureextraction_spark.vocab import fit_vocabulary

    cfg = FeatureConfig()
    tx = events_as_transcripts(spark, sf_dir)
    vocab = fit_vocabulary(tx, max_tokens=256)
    vec, layout = with_turn_features(tx, vocab, cfg)
    return window_features_builtin(vec, vocab, cfg, layout)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pit_window_sum": _q_pit_window_sum,
        "sessionize": _q_sessionize,
        "lag_lead": _q_lag_lead,
        "topk_per_group": _q_topk_per_group,
        "asof_last_match": _q_asof_last_match,
        "backfill_spine": _q_backfill_spine,
        "dedup_exact": _q_dedup_exact,
        "text_stats": _q_text_stats,
        "vocab_fit": _q_vocab_fit,
        "group_agg": _q_group_agg,
        "transcript_window_features": _q_transcript_window_features,
    }


# ---------------------------------------------------------------- oracles

_EV_TS = "SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events"
_TOK = (
    "list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),"
    " x -> x <> '')"
)


def oracle_sql() -> dict[str, str]:
    return {
        "pit_window_sum": f"""
            SELECT event_id, user_id, ts_sec,
                   ROUND(SUM(value) OVER w, 4) AS w_sum,
                   COUNT(*) OVER w AS w_cnt
            FROM ({_EV_TS})
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                         RANGE BETWEEN 299 PRECEDING AND CURRENT ROW)
        """,
        "sessionize": f"""
            WITH g AS (
              SELECT event_id, user_id, ts_sec,
                     ts_sec - LAG(ts_sec) OVER
                       (PARTITION BY user_id ORDER BY ts_sec, event_id) AS gap
              FROM ({_EV_TS})
            )
            SELECT event_id, user_id, ts_sec,
                   SUM(CASE WHEN gap > {SESSION_GAP_S} THEN 1 ELSE 0 END) OVER
                     (PARTITION BY user_id ORDER BY ts_sec, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS session_id
            FROM g
        """,
        "lag_lead": f"""
            SELECT event_id, user_id,
                   ts_sec - LAG(ts_sec) OVER w AS prev_gap_s,
                   LEAD(value) OVER w AS next_value
            FROM ({_EV_TS})
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
        """,
        "topk_per_group": """
            SELECT user_id, rk, event_id, value FROM (
              SELECT user_id, event_id, value,
                     CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY value DESC, event_id ASC) AS INT) AS rk
              FROM events
            ) WHERE rk <= 3
        """,
        "asof_last_match": f"""
            SELECT event_id, user_id,
                   LAST_VALUE(CASE WHEN event_type = 'signup' THEN value END
                              IGNORE NULLS) OVER
                     (PARTITION BY user_id ORDER BY ts_sec, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS last_signup_value
            FROM ({_EV_TS})
        """,
        "backfill_spine": f"""
            WITH e AS (
              SELECT user_id, ts_sec // 60 AS minute FROM ({_EV_TS})
            ),
            b AS (SELECT user_id, MIN(minute) AS mn, MAX(minute) AS mx
                  FROM e GROUP BY user_id),
            s AS (SELECT user_id, UNNEST(range(mn, mx + 1)) AS minute FROM b),
            c AS (SELECT user_id, minute, COUNT(*) AS n
                  FROM e GROUP BY user_id, minute)
            SELECT s.user_id, s.minute,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
            FROM s LEFT JOIN c USING (user_id, minute)
        """,
        "dedup_exact": """
            SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "text_stats": f"""
            SELECT doc_id,
                   CAST(len({_TOK}) AS INT) AS n_tokens,
                   CAST(length(text) AS INT) AS n_chars_txt
            FROM documents
        """,
        "vocab_fit": f"""
            SELECT token,
                   CAST(ROW_NUMBER() OVER (ORDER BY token) - 1 AS INT) AS bit_pos
            FROM (SELECT DISTINCT UNNEST({_TOK}) AS token FROM documents)
        """,
        "group_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 4) AS sum_qty,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   COUNT(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
    }
