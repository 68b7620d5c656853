"""Structured Streaming variants of the windowed feature aggregation.

The reference is pure batch, but its semantics are event-time streaming
semantics (SURVEY §2.9): sorted input replaces a watermark; FIXED
windows are tumbling/sliding event-time windows; sessions are gap
windows.  These are the streaming formulations for when transcripts
arrive as a stream:

  * windowed_counts: watermarked sliding window aggregation
    (reference W1 — note Spark's window() is LEFT-closed; the batch
    engine's right-closed bounds are kept there, and the divergence is
    documented here rather than hidden)
  * session_windows: F.session_window gap-based sessionization
  * stateful_turn_counter: applyInPandasWithState running per-entity
    counters (the reference's prevSessionID/queryID counters,
    enc/IntentCreatorMultiThread.java:73-78)

Batch parity of aggregation values is pinned by tests using the
file-source → memory-sink pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    entity_col: str = "tool",
    cost_col: str = "duration_ms",
) -> DataFrame:
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), F.col(entity_col))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(cost_col).alias("total_cost"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            entity_col,
            "n_turns",
            "total_cost",
        )
    )


def session_windows(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    entity_col: str = "conv_id",
) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col(entity_col))
        .agg(F.count("*").alias("n_turns"))
        .select(
            entity_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_turns",
        )
    )


def stateful_turn_counter(
    stream: DataFrame,
    entity_col: str = "conv_id",
    gap_s: int = 1800,
):
    """Custom stateful operator: running turn counter + monotonic
    session_id per conversation, kept in GroupState across micro-batches
    (``applyInPandasWithState``).  The streaming analog of the
    reference's prevSessionID/queryID counters
    (enc/IntentCreatorMultiThread.java:73-78).

    State: (n_turns_so_far, last_ts_sec, session_id).
    Output per input row: conv_id, ts, turn_no (1-based, stable across
    batches), session_id.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{entity_col} string, ts timestamp, turn_no long, session_id long"
    )
    state_schema = "n long, last_ts long, sess long"

    import numpy as np

    def fn(key, pdfs, state):
        # vectorized within each micro-batch: gap flags → cumsum; only
        # the scalar (n, last_ts, sess) carries across batches
        n, last_ts, sess = state.get if state.exists else (0, None, 0)
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            ts_sec = (
                pdf["ts"].astype("datetime64[s]").astype("int64").to_numpy()
            )
            if len(ts_sec) == 0:
                continue
            prev = np.empty_like(ts_sec)
            prev[1:] = ts_sec[:-1]
            prev[0] = last_ts if last_ts is not None else ts_sec[0]
            flags = (ts_sec - prev > gap_s).astype(np.int64)
            sess_ids = sess + np.cumsum(flags)
            turn_no = n + np.arange(1, len(ts_sec) + 1, dtype=np.int64)
            n += len(ts_sec)
            last_ts = int(ts_sec[-1])
            sess = int(sess_ids[-1])
            frames.append(
                pd.DataFrame(
                    {
                        entity_col: key[0],
                        "ts": pdf["ts"].to_numpy(),
                        "turn_no": turn_no,
                        "session_id": sess_ids,
                    }
                )
            )
        state.update((n, last_ts, sess))
        yield from frames

    return stream.groupBy(entity_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(agg: DataFrame, name: str):
    """Drive a bounded file-backed stream to completion synchronously;
    results land in the in-memory table `name`."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
