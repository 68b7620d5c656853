"""Streaming-path throughput datapoint: stateful_pit_window over the
replicated transcripts input as a bounded multi-batch file stream.

The batch engine's numbers live in scale_bench.py; this measures the
INCREMENTAL path (applyInPandasWithState + GroupState) end-to-end —
source scan → per-entity stateful rolling window → noop sink — so the
streaming flagship analog has a recorded rows/s too, not just a
correctness row.  maxFilesPerTrigger splits the input into several
micro-batches, so the measurement includes state round-trips, not one
degenerate mega-batch.

Usage: python scripts/stream_bench.py [input_dir] [parallelism] [files_per_trigger]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_input_rep32"
    par = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    fpt = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from sqlfeatureextraction_spark.session import get_spark
    from sqlfeatureextraction_spark.streaming.stream import (
        stateful_pit_window,
    )

    spark = get_spark("stream_bench", parallelism=par, shuffle_partitions=par)
    batch = spark.read.parquet(path)
    n_rows = batch.count()

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", fpt)
        .parquet(path)
        .select(
            "conv_id",
            F.col("turn_idx").cast("long").alias("event_id"),
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("duration_ms").cast("double").alias("value"),
        )
    )
    out = stateful_pit_window(stream, entity_col="conv_id", window_s=300)
    t0 = time.perf_counter()
    q = (
        out.writeStream.outputMode("append")
        .format("noop")
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "streaming PIT window rows/sec (bounded replay)",
                "input": path,
                "rows": n_rows,
                "parallelism": par,
                "files_per_trigger": fpt,
                "micro_batches": n_batches,
                "sec": round(dt, 2),
                "rows_per_sec": round(n_rows / dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
