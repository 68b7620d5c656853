"""Stateful streaming operator + S4 session-log scan."""

import os

from pyspark.sql import functions as F

from conftest import stage_slice_file
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


def test_stateful_pit_window_matches_batch_across_batches(
    tmp_path, spark, transcripts_df
):
    """Streaming PIT rolling window == batch rangeBetween, with every
    conversation's rows SPLIT ACROSS two micro-batches at a global time
    threshold (true cross-batch GroupState carry, unlike the turn
    counter test where each conv lives in one file).  Ties cannot
    straddle the split because the split is on ts itself."""
    import numpy as np
    from pyspark.sql import Window

    from sqlfeatureextraction_spark.streaming.stream import (
        stateful_pit_window,
    )

    src = tmp_path / "src"
    src.mkdir()
    ev = transcripts_df.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("event_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("duration_ms").cast("double").alias("value"),
    )
    t_split = ev.agg(
        F.expr("percentile_approx(cast(ts as long), 0.5)")
    ).collect()[0][0]
    early = ev.where(F.col("ts").cast("long") < t_split)
    late = ev.where(F.col("ts").cast("long") >= t_split)
    early.coalesce(1).write.mode("overwrite").parquet(str(src / "a"))
    late.coalesce(1).write.mode("overwrite").parquet(str(src / "b"))
    # one file per trigger, oldest mtime first -> a then b
    a_file = next((src / "a").glob("part-*.parquet"))
    b_file = next((src / "b").glob("part-*.parquet"))
    (src / "f1.parquet").write_bytes(a_file.read_bytes())
    (src / "f2.parquet").write_bytes(b_file.read_bytes())
    os.utime(src / "f1.parquet", (1_000_000, 1_000_000))
    os.utime(src / "f2.parquet", (2_000_000, 2_000_000))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*.parquet"))
    )
    out = stateful_pit_window(
        stream, entity_col="conv_id", window_s=300
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("pitwin")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM pitwin")
        .toPandas()
        .sort_values(["conv_id", "event_id"])
        .reset_index(drop=True)
    )

    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-299, 0)
    )
    exp = (
        ev.select(
            "conv_id",
            "event_id",
            F.col("ts").cast("long").alias("ts_sec"),
            F.sum("value").over(w).alias("w_sum"),
            F.count("*").over(w).alias("w_cnt"),
        )
        .toPandas()
        .sort_values(["conv_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["conv_id"] == exp["conv_id"]).all()
    assert (got["ts_sec"].to_numpy() == exp["ts_sec"].to_numpy()).all()
    assert (got["w_cnt"].to_numpy() == exp["w_cnt"].to_numpy()).all()
    assert np.allclose(got["w_sum"].to_numpy(), exp["w_sum"].to_numpy())


def test_stateful_pit_window_multichunk_group(tmp_path, spark):
    """A group larger than one Arrow chunk arrives as MULTIPLE pdfs in
    arbitrary row order within one micro-batch; the operator must
    window over the whole batch, not per chunk.  Forced with a 64-row
    Arrow batch size and a 500-row single-conversation input written in
    shuffled order."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    from sqlfeatureextraction_spark.streaming.stream import (
        stateful_pit_window,
    )

    rng = np.random.default_rng(7)
    n = 500
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 3600, n)), unit="s"
    )
    pdf = pd.DataFrame(
        {
            "conv_id": "c0",
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "value": rng.integers(1, 100, n).astype(np.float64),
        }
    ).sample(frac=1.0, random_state=3)  # shuffled row order on disk
    src = str(tmp_path / "src")
    ev = spark.createDataFrame(pdf)
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = stateful_pit_window(stream, entity_col="conv_id", window_s=300)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("pitchunk")
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    got = (
        spark.sql("SELECT * FROM pitchunk")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-299, 0)
    )
    exp = (
        ev.select(
            "event_id",
            F.sum("value").over(w).alias("w_sum"),
            F.count("*").over(w).alias("w_cnt"),
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == n
    assert (got["w_cnt"].to_numpy() == exp["w_cnt"].to_numpy()).all()
    assert np.allclose(got["w_sum"].to_numpy(), exp["w_sum"].to_numpy())


def test_stateful_pit_window_idle_timeout_evicts(tmp_path, spark):
    """idle_timeout_s removes a key's GroupState after processing-time
    inactivity; keys that reappear after more than window_s of EVENT
    time produce identical output to the batch oracle (eviction is
    semantically invisible there), and the state-store metrics show the
    removal actually happened.

    NOTE: with ProcessingTimeTimeout the micro-batch engine always has
    another timeout-evaluation batch to run, so processAllAvailable()
    NEVER quiesces — the test paces the query with a processing-time
    trigger and deadline-polls the memory sink instead."""
    import time

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    from sqlfeatureextraction_spark.streaming.stream import (
        stateful_pit_window,
    )

    base = pd.Timestamp("2026-01-01")

    def write_slice(path, rows, mtime):
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "event_id", "ts_off", "value"]
        )
        pdf["ts"] = base + pd.to_timedelta(pdf.pop("ts_off"), unit="s")
        pdf = pdf[["conv_id", "event_id", "ts", "value"]]
        pdf["event_id"] = pdf["event_id"].astype(np.int64)
        pdf["value"] = pdf["value"].astype(np.float64)
        return stage_slice_file(spark, tmp_path, pdf, path, mtime)

    # every reappearance is > window_s (300 s) later in EVENT time, so
    # evicting the idle state between files cannot change any window
    schema = write_slice(
        "f1.parquet",
        [("A", 0, 0, 10.0), ("A", 1, 100, 20.0), ("B", 0, 50, 5.0)],
        1_000_000,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "f*.parquet"))
    )
    out = stateful_pit_window(
        stream, entity_col="conv_id", window_s=300, idle_timeout_s=1
    )
    q = (
        out.writeStream.outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .format("memory")
        .queryName("pitevict")
        .start()
    )

    def wait_rows(n, deadline_s=90):
        t0 = time.monotonic()
        while time.monotonic() - t0 < deadline_s:
            if spark.sql("SELECT count(*) FROM pitevict").collect()[0][0] >= n:
                return
            time.sleep(0.3)
        raise AssertionError(f"sink never reached {n} rows")

    wait_rows(3)
    time.sleep(2.5)  # idle > 1 s -> both keys' timeouts fire
    write_slice("f2.parquet", [("B", 1, 500, 7.0)], 2_000_000)
    wait_rows(4)
    time.sleep(2.5)
    write_slice(
        "f3.parquet",
        [("A", 2, 1000, 40.0), ("B", 2, 1000, 1.0)],
        3_000_000,
    )
    wait_rows(6)
    # deadline-poll the state metrics for the eviction evidence
    t0 = time.monotonic()
    removed = 0
    while time.monotonic() - t0 < 60 and removed < 1:
        removed = sum(
            so.get("numRowsRemoved", 0)
            for p in q.recentProgress
            for so in p.get("stateOperators", [])
        )
        time.sleep(0.3)
    q.stop()
    assert removed >= 1  # the eviction actually fired

    got = (
        spark.sql("SELECT * FROM pitevict")
        .toPandas()
        .sort_values(["conv_id", "event_id"])
        .reset_index(drop=True)
    )
    ev = spark.read.parquet(str(tmp_path / "f*.parquet")).select(
        "conv_id", "event_id", "ts", "value"
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-299, 0)
    )
    exp = (
        ev.select(
            "conv_id",
            "event_id",
            F.sum("value").over(w).alias("w_sum"),
            F.count("*").over(w).alias("w_cnt"),
        )
        .toPandas()
        .sort_values(["conv_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["w_cnt"].to_numpy() == exp["w_cnt"].to_numpy()).all()
    assert (got["w_sum"].to_numpy() == exp["w_sum"].to_numpy()).all()


def test_stateful_pit_window_rejects_out_of_order_batch(tmp_path, spark):
    """A micro-batch carrying a row OLDER than the key's consumed state
    must fail the query loudly (unsorted timeline => silently wrong
    windows), not emit results."""
    import numpy as np
    import pandas as pd
    import pytest

    from sqlfeatureextraction_spark.streaming.stream import (
        stateful_pit_window,
    )

    base = pd.Timestamp("2026-01-01")

    def write_slice(path, ts_off, mtime):
        pdf = pd.DataFrame(
            {
                "conv_id": ["A"],
                "event_id": np.array([0], dtype=np.int64),
                "ts": [base + pd.to_timedelta(ts_off, unit="s")],
                "value": [1.0],
            }
        )
        return stage_slice_file(spark, tmp_path, pdf, path, mtime)

    schema = write_slice("f1.parquet", 1000, 1_000_000)
    write_slice("f2.parquet", 500, 2_000_000)  # older -> must raise
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "f*.parquet"))
    )
    out = stateful_pit_window(stream, entity_col="conv_id", window_s=300)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("pitooo")
        .start()
    )
    with pytest.raises(Exception, match="not strictly newer than"):
        q.processAllAvailable()
    q.stop()


def test_stateful_pit_window_restart_from_checkpoint(tmp_path, spark):
    """Kill-and-resume: stop the query after the first micro-batch,
    then restart from the same checkpointLocation with more files
    present.  Source offsets AND the per-key GroupState must both
    recover — the resumed windows span the pre-kill rows — and the
    file sink must hold every event exactly once, equal to the batch
    rangeBetween oracle over the full input."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    from sqlfeatureextraction_spark.streaming.stream import (
        stateful_pit_window,
    )

    base = pd.Timestamp("2026-01-01")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def write_slice(path, rows, mtime):
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "event_id", "ts_off", "value"]
        )
        pdf["ts"] = base + pd.to_timedelta(pdf.pop("ts_off"), unit="s")
        pdf = pdf[["conv_id", "event_id", "ts", "value"]]
        pdf["event_id"] = pdf["event_id"].astype(np.int64)
        pdf["value"] = pdf["value"].astype(np.float64)
        return stage_slice_file(spark, tmp_path, pdf, path, mtime)

    # f2/f3 rows fall INSIDE the 300 s window of f1 rows, so resumed
    # output is only correct if the state survived the restart
    schema = write_slice(
        "f1.parquet",
        [("A", 0, 0, 10.0), ("A", 1, 100, 20.0), ("B", 0, 50, 5.0)],
        1_000_000,
    )

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "f*.parquet"))
        )
        out = stateful_pit_window(stream, entity_col="conv_id", window_s=300)
        return (
            out.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", sink)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()  # simulated failure after batch 1

    write_slice(
        "f2.parquet", [("A", 2, 200, 1.0), ("B", 1, 250, 2.0)], 2_000_000
    )
    write_slice("f3.parquet", [("A", 3, 350, 4.0)], 3_000_000)
    q = start()
    q.processAllAvailable()
    q.stop()

    got = (
        spark.read.parquet(sink)
        .toPandas()
        .sort_values(["conv_id", "event_id"])
        .reset_index(drop=True)
    )
    ev = spark.read.parquet(str(tmp_path / "f*.parquet")).select(
        "conv_id", "event_id", "ts", "value"
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-299, 0)
    )
    exp = (
        ev.select(
            "conv_id",
            "event_id",
            F.sum("value").over(w).alias("w_sum"),
            F.count("*").over(w).alias("w_cnt"),
        )
        .toPandas()
        .sort_values(["conv_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)  # exactly once, no dup re-emits
    assert (got["conv_id"] == exp["conv_id"]).all()
    assert (got["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()
    # A@200 window must include A@0 and A@100 (pre-kill state): cnt 3
    a2 = got[(got["conv_id"] == "A") & (got["event_id"] == 2)]
    assert a2["w_cnt"].iloc[0] == 3
    assert (got["w_cnt"].to_numpy() == exp["w_cnt"].to_numpy()).all()
    assert np.allclose(got["w_sum"].to_numpy(), exp["w_sum"].to_numpy())


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


def test_exact_dedup_stream_cross_batch(tmp_path, spark):
    """Cross-batch exact dedup: keys repeated in a later micro-batch
    must NOT re-emit; genuinely new keys must.  Also pins the
    within-watermark regime: a duplicate arriving after the watermark
    passed its first occurrence re-emits (the documented bounded-state
    trade)."""
    import pandas as pd

    from sqlfeatureextraction_spark.streaming.stream import (
        exact_dedup_stream,
        run_stream_to_memory,
    )

    def mk(rows):
        return pd.DataFrame(
            rows, columns=["k", "ts"]
        ).astype({"k": "string"}).assign(
            ts=lambda d: pd.to_datetime(d.ts, unit="s")
        )

    # batch 1: a, b   batch 2: a (dup), c (new AND very late — the
    # global regime must not watermark-filter it: first-seen keys
    # emit no matter how late they arrive)
    b1 = mk([("a", 1000), ("b", 1010)])
    b2 = mk([("a", 1020), ("c", 900)])
    schema = stage_slice_file(spark, tmp_path, b1, "s1.parquet", 1_000_000)
    stage_slice_file(spark, tmp_path, b2, "s2.parquet", 1_000_001)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    out = exact_dedup_stream(stream, ["k"])
    run_stream_to_memory(out, "dedup_global", output_mode="append")
    got = sorted(
        r["k"] for r in spark.sql("SELECT k FROM dedup_global").collect()
    )
    assert got == ["a", "b", "c"]

    # within-watermark: 'b' repeated inside the 10s delay is suppressed.
    # State eviction happens at batch END using that batch's watermark
    # (wm itself lags one batch: it advances to max_event_time - delay
    # at batch end), so expiring 'a''s state takes one intervening batch
    # after the wm passes expiry: batch s2 advances wm to 1190, batch s3
    # ('y') runs its end-of-batch eviction with wm 1190 > 1010, and only
    # THEN does the late duplicate of 'a' find state gone and re-emit —
    # the documented bounded-state trade
    b3 = mk([("a", 1000), ("b", 1010)])
    b4 = mk([("b", 1015), ("x", 1200)])
    b4b = mk([("y", 1250)])
    b5 = mk([("a", 1300)])
    tmp2 = tmp_path / "ww"
    tmp2.mkdir()
    schema = stage_slice_file(spark, tmp2, b3, "s1.parquet", 1_000_000)
    stage_slice_file(spark, tmp2, b4, "s2.parquet", 1_000_001)
    stage_slice_file(spark, tmp2, b4b, "s3.parquet", 1_000_002)
    stage_slice_file(spark, tmp2, b5, "s4.parquet", 1_000_003)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp2))
    )
    out = exact_dedup_stream(
        stream, ["k"], watermark=("ts", "10 seconds"), within_watermark=True
    )
    run_stream_to_memory(out, "dedup_ww", output_mode="append")
    got = sorted(
        r["k"] for r in spark.sql("SELECT k FROM dedup_ww").collect()
    )
    assert got == ["a", "a", "b", "x", "y"]


def test_stateful_cusum_matches_batch_across_batches(tmp_path, spark):
    """Streaming CUSUM (two scalars of state) == the batch closed
    form with the same fixed mu, rows split across two micro-batches
    at a time threshold."""
    import numpy as np
    from pyspark.sql import Window

    from sqlfeatureextraction_spark.streaming.stream import stateful_cusum

    rows = []
    rng = __import__("random").Random(13)
    for conv in ("a", "b"):
        base = 1_700_000_000
        for i in range(60):
            if conv == "a":
                # level shift upward halfway through conv 'a'
                v = rng.uniform(0, 10) + (8.0 if i >= 30 else 0.0)
            else:
                # control pinned at mu: cusum stays 0, never flags
                v = 5.0
            rows.append((conv, i, float(base + i * 7), v))
    # same-SECOND tie whose microsecond order INVERTS the id order:
    # the op must process by (truncated second, id), not raw ts
    rows.append(("a", 60, base + 60 * 7 + 0.9, 1.0))
    rows.append(("a", 61, base + 60 * 7 + 0.1, 9.0))
    df = spark.createDataFrame(
        rows, "conv_id string, event_id long, ts_sec double, value double"
    ).select(
        "conv_id",
        "event_id",
        F.col("ts_sec").cast("timestamp").alias("ts"),
        "value",
    )
    src = tmp_path / "src"
    src.mkdir()
    split = 1_700_000_000 + 35 * 7
    df.where(F.col("ts").cast("long") < split).coalesce(1).write.parquet(
        str(src / "a")
    )
    df.where(F.col("ts").cast("long") >= split).coalesce(1).write.parquet(
        str(src / "b")
    )
    a = next((src / "a").glob("part-*.parquet"))
    b = next((src / "b").glob("part-*.parquet"))
    (src / "f1.parquet").write_bytes(a.read_bytes())
    (src / "f2.parquet").write_bytes(b.read_bytes())
    os.utime(src / "f1.parquet", (1_000_000, 1_000_000))
    os.utime(src / "f2.parquet", (2_000_000, 2_000_000))

    mu, sigma, h = 5.0, 3.0, 4.0
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*.parquet"))
    )
    out = stateful_cusum(
        stream, entity_col="conv_id", mu=mu, sigma=sigma, h=h
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cusumstream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM cusumstream")
        .toPandas()
        .sort_values(["conv_id", "event_id"])
        .reset_index(drop=True)
    )

    w = (
        Window.partitionBy("conv_id")
        .orderBy("ts_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = F.sum(F.col("value") - F.lit(mu)).over(w)
    exp = (
        df.select(
            "conv_id",
            "event_id",
            F.col("ts").cast("long").alias("ts_sec"),
            "value",
        )
        .withColumn("_p", pre)
        .withColumn(
            "cusum",
            F.round(
                F.col("_p") - F.least(F.lit(0.0), F.min("_p").over(w)), 6
            ),
        )
        .withColumn("is_shift", F.col("cusum") > h * sigma)
        .toPandas()
        .sort_values(["conv_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == 122
    assert np.allclose(got["cusum"], exp["cusum"], atol=1e-6)
    assert (got["is_shift"] == exp["is_shift"]).all()
    # the injected level shift in conv 'a' is flagged, conv 'b' never
    assert got[got.conv_id == "a"]["is_shift"].any()
    assert not got[got.conv_id == "b"]["is_shift"].any()
