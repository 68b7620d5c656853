"""Scaling-efficiency evidence (north rule: ≥0.8 between N and 4N).

No real cluster in this sandbox, so the same end-to-end feature job is
run at two parallelism levels — local[8] and local[32] (N and 4N
cores) — on the same input, in SEPARATE JVMs (subprocess per level so
neither run inherits the other's warm caches unfairly; each level gets
its own warm-up pass inside the process).

Prints one JSON line and appends a row to BENCH_SCALING.md.

Usage: python scripts/scale_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO_ROOT"])
par = int(sys.argv[1]); sf_dir = sys.argv[2]; rep = int(sys.argv[3])
from pyspark.sql import functions as F
from sqlfeatureextraction_spark.session import get_spark
from sqlfeatureextraction_spark.config import FeatureConfig
from sqlfeatureextraction_spark.synth import events_as_transcripts
from sqlfeatureextraction_spark.vocab import fit_vocabulary
from sqlfeatureextraction_spark.operators.vectorize import with_turn_features
from sqlfeatureextraction_spark.operators.pit_window import window_features_builtin

spark = get_spark("scale", parallelism=par, shuffle_partitions=par)
cfg = FeatureConfig()

def job():
    tx = events_as_transcripts(spark, sf_dir)
    if rep > 1:
        # replicate conversations (disjoint conv ids, same timelines) so
        # the job is throughput-bound, not fixed-overhead-bound
        tx = tx.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).withColumn(
            "conv_id", F.concat_ws("_", "conv_id", F.col("_r"))
        ).drop("_r").repartition(par * 4, "conv_id")
    vocab = fit_vocabulary(tx, max_tokens=256)
    vec, layout = with_turn_features(tx, vocab, cfg)
    vec = vec.cache()  # same as FeaturePipeline: feeds window pass + join
    try:
        return window_features_builtin(vec, vocab, cfg, layout).count()
    finally:
        vec.unpersist()

n = job()  # warm-up (JVM JIT, parquet footers, Arrow init)
t0 = time.perf_counter(); n = job(); dt = time.perf_counter() - t0
print(json.dumps({"parallelism": par, "rows": n, "sec": round(dt, 3),
                  "rows_per_sec": round(n / dt, 1)}))
"""


def run_level(par: int, sf_dir: str, rep: int) -> dict:
    env = dict(os.environ, REPO_ROOT=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(par), sf_dir, str(rep)],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    lo = run_level(8, sf_dir, rep)
    hi = run_level(32, sf_dir, rep)
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / 4
    result = {
        "metric": "scaling efficiency N→4N (local[8] vs local[32])",
        "sf_dir": sf_dir,
        "replication": rep,
        "local8": lo,
        "local32": hi,
        "efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_SCALING.md"), "a") as f:
        f.write(
            f"| {sf_dir} | {lo['rows_per_sec']} | {hi['rows_per_sec']} "
            f"| {round(eff, 3)} |\n"
        )


if __name__ == "__main__":
    main()
