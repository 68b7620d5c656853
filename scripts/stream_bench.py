"""Streaming-path throughput datapoint: stateful_pit_window over the
replicated transcripts input replayed as a TIME-SLICED multi-batch
file stream.

The input is re-staged as K single-file parquet slices cut on ts
percentiles (ties never straddle a cut) with increasing mtimes, so the
file source replays them as K micro-batches in event-time order and —
because slicing is on TIME, not on conv_id — (nearly) every
conversation appears in every batch: each batch genuinely reads its
keys' GroupState back, prunes it, and re-commits it.  (A conv_id-hash
file layout, like scale_bench's prepare output, would put each key
wholly inside one batch and never exercise the cross-batch carry.)

The measured span covers source scan → per-entity stateful rolling
window → noop sink, end-to-end.

Usage: python scripts/stream_bench.py [input_dir] [parallelism] [n_slices]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_input_rep32"
    par = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_slices = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from sqlfeatureextraction_spark.session import get_spark
    from sqlfeatureextraction_spark.streaming.stream import (
        stateful_pit_window,
    )

    spark = get_spark("stream_bench", parallelism=par, shuffle_partitions=par)
    # NULL-ts rows can never match a time slice; drop them up front so
    # the row count (and rows/sec) covers exactly what is replayed
    batch = spark.read.parquet(path).where(F.col("ts").isNotNull())
    n_rows = batch.count()

    # ---- stage: K time slices, one file each, mtime = slice order ----
    stage = tempfile.mkdtemp(prefix="stream_bench_slices_")
    qs = [i / n_slices for i in range(1, n_slices)]
    bounds = None
    if qs:  # n_slices == 1 -> no interior cuts, one full slice
        bounds = batch.agg(
            F.expr(
                "percentile_approx(cast(cast(ts as timestamp) as long), "
                f"array({', '.join(f'{q}D' for q in qs)}))"
            )
        ).collect()[0][0]
    edges = [None] + list(bounds or []) + [None]
    ts_long = F.col("ts").cast("timestamp").cast("long")
    n_files = 0
    for i in range(len(edges) - 1):
        sl = batch
        if edges[i] is not None:
            sl = sl.where(ts_long >= edges[i])
        if edges[i + 1] is not None:
            sl = sl.where(ts_long < edges[i + 1])
        tmp = os.path.join(stage, f"_w{i}")
        sl.coalesce(1).write.mode("overwrite").parquet(tmp)
        parts = glob.glob(os.path.join(tmp, "part-*.parquet"))
        if not parts:  # duplicate percentile edge -> empty slice
            continue
        dst = os.path.join(stage, f"f{n_files:03d}.parquet")
        shutil.copyfile(parts[0], dst)
        os.utime(dst, (1_000_000 + n_files, 1_000_000 + n_files))
        shutil.rmtree(tmp)
        n_files += 1

    # ---- measure (staging dir reclaimed even on query failure) ----
    try:
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(stage, "f*.parquet"))
            .select(
                "conv_id",
                F.col("turn_idx").cast("long").alias("event_id"),
                F.col("ts").cast("timestamp").alias("ts"),
                F.col("duration_ms").cast("double").alias("value"),
            )
        )
        out = stateful_pit_window(stream, entity_col="conv_id", window_s=300)
        t0 = time.perf_counter()
        q = out.writeStream.outputMode("append").format("noop").start()
        q.processAllAvailable()
        last = q.lastProgress
        n_batches = (last["batchId"] + 1) if last else 0
        q.stop()
        dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "streaming PIT window rows/sec (bounded replay)",
                "input": path,
                "rows": n_rows,
                "parallelism": par,
                "time_slices": n_files,
                "micro_batches": n_batches,
                "sec": round(dt, 2),
                "rows_per_sec": round(n_rows / dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
