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
    ap.add_argument("--input", required=True,
                    help="transcripts parquet, events parquet, or a "
                         "snapshot-table root (sources/snaptable.py — "
                         "auto-detected)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--snapshot-id", default="",
                    help="pin a snapshot-table input to this snapshot "
                         "(time travel); also the checkpoint lineage id")
    ap.add_argument("--incremental-from", default=None, type=int,
                    help="refresh mode: recompute features only for "
                         "entities touched after this snapshot id "
                         "(requires a snapshot-table input and "
                         "--prev-features)")
    ap.add_argument("--prev-features", default=None,
                    help="the stored feature table to carry untouched "
                         "entities from in --incremental-from mode")
    ap.add_argument("--window", type=int, default=300)
    ap.add_argument("--max-tokens", type=int, default=4096)
    ap.add_argument("--save-vocab", default=None,
                    help="persist the fitted vocabulary dim table here")
    ap.add_argument("--load-vocab", default=None,
                    help="reuse a persisted vocabulary instead of "
                         "fitting (REQUIRED for --incremental-from: "
                         "carried and recomputed vectors must share "
                         "one layout)")
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

    from sqlfeatureextraction_spark.sources import snaptable as snap

    cfg = FeatureConfig(window_size_s=args.window)
    is_snap = snap.is_snap_table(args.input)
    if args.events_shape:
        from sqlfeatureextraction_spark.synth import events_as_transcripts

        tx = events_as_transcripts(spark, os.path.dirname(args.input))
    elif is_snap:
        tx = snap.read(
            spark, args.input,
            int(args.snapshot_id) if args.snapshot_id else None,
        )
    else:
        tx = spark.read.parquet(args.input)

    t0 = time.time()
    if args.incremental_from is not None and not args.load_vocab:
        raise SystemExit(
            "--incremental-from requires --load-vocab: the refresh is "
            "only exact when carried and recomputed features share the "
            "run that fitted the vocabulary"
        )
    if args.incremental_from is not None and args.checkpoint:
        raise SystemExit(
            "--incremental-from and --checkpoint are mutually "
            "exclusive: the refresh leg is not bucket-checkpointed "
            "(it is already delta-sized; re-run it on failure)"
        )
    if args.load_vocab:
        from sqlfeatureextraction_spark.vocab import Vocabulary

        pipe = FeaturePipeline(cfg)
        pipe.vocab = Vocabulary.from_df(spark.read.parquet(args.load_vocab))
        pipe.layout = pipe.vocab.layout(
            n_grans=len(cfg.granularities_s)
        )
    else:
        pipe = FeaturePipeline(cfg).fit(tx, max_tokens=args.max_tokens)
    if args.save_vocab:
        pipe.vocab.to_df(spark).write.mode("overwrite").parquet(
            args.save_vocab
        )
    if args.incremental_from is not None:
        # OOV accounting over the DELTA only — tokenizing the whole
        # table here would re-pay the full-table pass the incremental
        # mode exists to avoid (rows_in then means delta rows)
        obs_src = snap.incremental_read(
            spark, args.input, args.incremental_from,
            int(args.snapshot_id) if args.snapshot_id else None,
        )
    else:
        obs_src = tx
    oov_obs = Observation("oov_metrics")
    tx_o = with_oov_stats(obs_src, pipe.vocab).observe(
        oov_obs,
        F.sum("n_oov").alias("total_oov"),
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("rows"),
    )

    def compute(part):
        return pipe.split(pipe.transform(part))

    if args.incremental_from is not None:
        # touched-entity refresh: carry untouched entities from the
        # stored feature table, recompute only entities with rows
        # appended after --incremental-from (exact — see
        # operators/incremental.py)
        if not (is_snap and args.prev_features):
            raise SystemExit(
                "--incremental-from needs a snapshot-table input "
                "and --prev-features"
            )
        from sqlfeatureextraction_spark.operators.incremental import (
            incremental_snapshot_update,
        )

        old_features = spark.read.parquet(args.prev_features)
        feats = incremental_snapshot_update(
            spark, args.input, args.incremental_from, old_features,
            compute,
            to_snapshot_id=(
                int(args.snapshot_id) if args.snapshot_id else None
            ),
        )
        metrics = {"mode": "incremental",
                   "from_snapshot": args.incremental_from}
    elif args.checkpoint:
        if args.snapshot_id:
            snapshot = args.snapshot_id
        elif is_snap:
            snapshot = str(snap.current_snapshot_id(args.input))
        else:
            snapshot = str(os.stat(args.input).st_mtime_ns)
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
