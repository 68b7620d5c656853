"""Sources/sinks round-trip + Structured Streaming parity smoke."""

import numpy as np
from pyspark.sql import functions as F

from conftest import stage_slice_file
from sqlfeatureextraction_spark.sources.io import (
    read_encoded_lines,
    read_raw_log_tsv,
    write_encoded_lines,
)
from sqlfeatureextraction_spark.streaming.stream import (
    run_stream_to_memory,
    session_windows,
    windowed_counts,
)


def test_encoded_line_roundtrip(tmp_path, spark):
    src = spark.createDataFrame(
        [
            ("c1", 1704067200, "hello world", [1.0, 0.0, 1.0]),
            ("c2", 1704067260, "", [0.0, 0.0, 0.0]),
        ],
        "conv_id string, ts_sec long, text string, window_features array<double>",
    ).withColumn("ts", F.timestamp_seconds("ts_sec"))
    out = str(tmp_path / "lines")
    write_encoded_lines(src, out)
    back = read_encoded_lines(spark, out).toPandas().sort_values("conv_id")
    assert list(back["conv_id"]) == ["c1", "c2"]
    assert list(back["window_features"].iloc[0]) == [1.0, 0.0, 1.0]
    assert back["text"].iloc[0] == "hello world"
    assert back["ts"].iloc[0].timestamp() == 1704067200


def test_raw_tsv_scan(tmp_path, spark):
    p = tmp_path / "log.tsv"
    p.write_text(
        "tables\tevent_time\tquery\tquery_duration_ms\n"
        "db.t1\t2024/1/1 10:05\tselect 1\t42\n"
        "db.t2\t2024/1/2 23:59\tselect 2\t7\n"
    )
    df = read_raw_log_tsv(spark, str(p)).toPandas()
    assert df["ts"].iloc[0].hour == 10
    # deterministic jitter: same content → same jitter, within the minute
    j1 = read_raw_log_tsv(spark, str(p), jitter=True).toPandas()
    j2 = read_raw_log_tsv(spark, str(p), jitter=True).toPandas()
    assert (j1["ts"] == j2["ts"]).all()
    assert ((j1["ts"] - df["ts"]).dt.total_seconds() < 60).all()


def test_streaming_windowed_counts_matches_batch(tmp_path, spark, transcripts_df):
    src_dir = str(tmp_path / "stream_src")
    transcripts_df.write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(transcripts_df.schema).parquet(src_dir)
    )
    agg = windowed_counts(stream, window="5 minutes", entity_col="tool")
    run_stream_to_memory(agg, "stream_counts")
    got = spark.sql("SELECT * FROM stream_counts").toPandas()

    exp = (
        transcripts_df.groupBy(
            F.window("ts", "5 minutes").alias("win"), "tool"
        )
        .agg(F.count("*").alias("n_turns"), F.sum("duration_ms").alias("total_cost"))
        .select(
            F.col("win.start").alias("window_start"),
            "tool",
            "n_turns",
            "total_cost",
        )
        .toPandas()
    )
    key = ["window_start", "tool"]
    m = got.merge(exp, on=key, suffixes=("_s", "_b"))
    assert len(m) == len(exp) == len(got)
    assert (m["n_turns_s"] == m["n_turns_b"]).all()
    assert (m["total_cost_s"] == m["total_cost_b"]).all()


def test_streaming_windowed_counts_drops_late_data(tmp_path, spark):
    """Watermark semantics under APPEND output: once the watermark
    (max event time − 10 min, lagged one batch) passes a window's end,
    the window finalizes and emits — and a row arriving LATER than the
    watermark for that window is dropped, not merged.  Pinned with a
    two-batch replay: batch 2 carries a row for a window batch 1
    already pushed past the watermark."""
    import pandas as pd

    base = pd.Timestamp("2026-01-01 10:00:00")

    def write_slice(path, offsets_min, mtime):
        pdf = pd.DataFrame(
            {
                "tool": "t1",
                "ts": [
                    base + pd.to_timedelta(m, unit="min")
                    for m in offsets_min
                ],
                "duration_ms": [10.0] * len(offsets_min),
            }
        )
        return stage_slice_file(spark, tmp_path, pdf, path, mtime)

    # Watermark eviction lags: the watermark computed from batch N's
    # max event time takes effect in batch N+1, and a window's state
    # is evicted (and emitted) at the END of the first batch whose
    # watermark passed its end — a late row landing in THAT batch
    # still merges (Spark's documented best-effort semantics).  The
    # drop guarantee starts one batch later, so the late row goes in
    # batch 3:
    #   batch 1 [10:00, 10:02, 11:00] -> wm 0, max 11:00
    #   batch 2 [11:30]               -> wm 10:50: 10:00-window
    #                                    finalizes+emits (n=2)
    #   batch 3 [10:01 LATE, 12:00]   -> wm 11:20 > 10:05: the late
    #                                    row is dropped, never re-emits
    schema = write_slice("f1.parquet", [0, 2, 60], 1_000_000)
    write_slice("f2.parquet", [90], 2_000_000)
    write_slice("f3.parquet", [1, 120], 3_000_000)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "f*.parquet"))
    )
    agg = windowed_counts(
        stream, window="5 minutes", watermark="10 minutes", entity_col="tool"
    )
    run_stream_to_memory(agg, "late_counts", output_mode="append")
    got = spark.sql("SELECT * FROM late_counts").toPandas()
    w10 = got[got["window_start"] == base]
    # exactly ONE emission for the 10:00 window, with the two on-time
    # rows only — the batch-3 late row neither merged nor re-emitted
    assert len(w10) == 1
    assert w10["n_turns"].iloc[0] == 2
    assert w10["total_cost"].iloc[0] == 20.0
    # 11:00 window flushed once the watermark passed its end
    w11 = got[got["window_start"] == base + pd.Timedelta(minutes=60)]
    assert len(w11) == 1 and w11["n_turns"].iloc[0] == 1
    # the 12:00 window is still open (no later data advanced the
    # watermark past 12:05)
    assert not (
        got["window_start"] == base + pd.Timedelta(minutes=120)
    ).any()


def test_streaming_session_windows(tmp_path, spark, transcripts_df):
    src_dir = str(tmp_path / "stream_src2")
    transcripts_df.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(transcripts_df.schema).parquet(src_dir)
    agg = session_windows(stream, gap="30 minutes")
    run_stream_to_memory(agg, "stream_sessions")
    got = spark.sql("SELECT * FROM stream_sessions").toPandas()
    # session count per conv must equal the batch sessionizer's count
    from sqlfeatureextraction_spark.operators.sessionize import sessionize

    exp = (
        sessionize(transcripts_df, gap_s=1800)
        .groupBy("conv_id")
        .agg(F.countDistinct("session_id").alias("n"))
        .toPandas()
    )
    got_n = got.groupby("conv_id").size().rename("n").reset_index()
    m = exp.merge(got_n, on="conv_id", suffixes=("_b", "_s"))
    assert len(m) == len(exp)
    # session_window uses gap from LAST event (t, t+gap); our batch rule
    # starts a new session when gap > threshold — identical partitioning
    assert (m["n_b"] == m["n_s"]).all()
