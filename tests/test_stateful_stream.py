"""Stateful streaming operator + S4 session-log scan."""

from pyspark.sql import functions as F

from sqlfeatureextraction_spark.sources.io import read_session_log_lines
from sqlfeatureextraction_spark.streaming.stream import stateful_turn_counter


def test_stateful_turn_counter_matches_batch(tmp_path, spark, transcripts_df):
    src = str(tmp_path / "src")
    # write as TWO parquet files so maxFilesPerTrigger=1 forces the
    # state to survive across micro-batches; each conversation must
    # live wholly in ONE file in ts order (event-time order per key is
    # the operator's contract — a real deployment enforces it with a
    # watermark + sorted upstream)
    (
        transcripts_df.repartition(2, "conv_id")
        .sortWithinPartitions("conv_id", "ts", "turn_idx")
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = (
        spark.readStream.schema(transcripts_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_turn_counter(stream, gap_s=1800)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("turncount")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM turncount").toPandas()

    # batch oracle: per conv, count == n turns; max turn_no == count;
    # session count == batch sessionizer's
    from sqlfeatureextraction_spark.operators.sessionize import sessionize

    exp = (
        sessionize(transcripts_df, gap_s=1800)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("session_id").alias("n_sess"),
        )
        .toPandas()
        .set_index("conv_id")
    )
    g = got.groupby("conv_id").agg(
        n=("turn_no", "size"), max_turn=("turn_no", "max"),
        n_sess=("session_id", "nunique"),
    )
    assert len(got) == int(exp["n"].sum())
    for conv, row in g.iterrows():
        assert row["n"] == exp.loc[conv, "n"]
        assert row["max_turn"] == exp.loc[conv, "n"]
        # NOTE: ordering across micro-batches follows file order; the
        # deterministic synth writes each conv into one partition file,
        # so per-conv order is preserved and session counts must match
        assert row["n_sess"] == exp.loc[conv, "n_sess"], conv


def test_session_log_scan(tmp_path, spark):
    p = tmp_path / "log.txt"
    p.write_text(
        "Session 1, Query  select   1\n"
        "garbage line\n"
        "Session 1, Query select 2\n"
        "another Query   here\n"
    )
    got = read_session_log_lines(spark, str(p)).toPandas()
    assert len(got) == 3
    assert got["line"].str.contains("Query").all()
    assert not got["line"].str.contains("  ").any()  # normalized
