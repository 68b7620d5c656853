"""Sources/sinks round-trip + Structured Streaming parity smoke."""

import numpy as np
from pyspark.sql import functions as F

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
