"""spark-submit entry point for the full feature pipeline.

    spark-submit --master local[32] \
        --py-files sqlfeatureextraction_spark.zip \
        scripts/run_pipeline.py \
        --input /root/testdata/sf0.01/events.parquet \
        --output /tmp/features_out \
        --checkpoint /tmp/features_ckpt --buckets 16

Build the zip with:  python scripts/make_pyfiles_zip.py

Runs fit → checkpointed transform (resumable) → split → write, and
prints run metrics (rows, OOV, empty-window rate) as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet (or events parquet)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--snapshot-id", default="")
    ap.add_argument("--window", type=int, default=300)
    ap.add_argument("--max-tokens", type=int, default=4096)
    ap.add_argument("--events-shape", action="store_true",
                    help="input is an events table; adapt to transcripts")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from sqlfeatureextraction_spark.checkpoint import CheckpointedRun
    from sqlfeatureextraction_spark.config import FeatureConfig
    from sqlfeatureextraction_spark.plans.pipeline import FeaturePipeline
    from sqlfeatureextraction_spark.vocab import with_oov_stats

    cfg = FeatureConfig(window_size_s=args.window)
    if args.events_shape:
        from sqlfeatureextraction_spark.synth import events_as_transcripts

        tx = events_as_transcripts(spark, os.path.dirname(args.input))
    else:
        tx = spark.read.parquet(args.input)

    t0 = time.time()
    pipe = FeaturePipeline(cfg).fit(tx, max_tokens=args.max_tokens)
    oov_obs = Observation("oov_metrics")
    tx_o = with_oov_stats(tx, pipe.vocab).observe(
        oov_obs,
        F.sum("n_oov").alias("total_oov"),
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("rows"),
    )

    def compute(part):
        return pipe.split(pipe.transform(part))

    if args.checkpoint:
        snapshot = args.snapshot_id or str(os.stat(args.input).st_mtime_ns)
        run = CheckpointedRun(
            args.checkpoint, n_buckets=args.buckets, snapshot_id=snapshot
        )
        run.run(tx, compute)
        feats = run.read_output(spark)
        metrics = run.metrics()
    else:
        feats = compute(tx)
        metrics = {}

    pipe.write(feats, args.output)
    n_out = spark.read.parquet(args.output).count()
    n_in = tx_o.count()  # the action that materializes the observation
    oov = oov_obs.get  # dict: total_oov / total_tokens / rows
    metrics.update(
        {
            "rows_in": n_in,
            "rows_out": n_out,
            "total_oov": int(oov["total_oov"] or 0),
            "total_tokens": int(oov["total_tokens"] or 0),
            "oov_rate": round(
                (oov["total_oov"] or 0) / max(oov["total_tokens"] or 0, 1), 6
            ),
            "wall_sec": round(time.time() - t0, 2),
            "vector_width": pipe.layout.width,
        }
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
