"""Scaling evidence for the transcript→SFT-pairs pipeline family.

Same methodology as scale_bench.py (north rule ≥0.8 between N and 4N):
the identical job — merge_consecutive_turns → pair_prompt_response →
token gate → exact pair dedup → count — runs at two parallelism
levels on the same pre-materialized parquet, fresh JVM per level,
bench.py's fixed-work steal sentinel certifying clean reps, medians
reported.

Usage: python scripts/sft_scale_bench.py [sf_dir] [rep] [n_lo] [n_hi] [reps]
       defaults: /root/testdata/sf0.01  1000  2  8  5
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

PREP = r"""
import os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
sf_dir, rep, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from pyspark.sql import functions as F
from sqlfeatureextraction_spark.session import get_spark
from sqlfeatureextraction_spark.synth import events_as_transcripts
spark = get_spark("sft_prep")
tx = events_as_transcripts(spark, sf_dir)
# the adapter labels every turn "user"; derive the 4-role rotation the
# driver rows use so merge/pair have real work to do
roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"),
                F.lit("system"))
tx = tx.withColumn(
    "role",
    F.element_at(roles, (F.pmod(F.col("turn_idx"), F.lit(4)) + 1).cast("int")),
)
tx = tx.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))).withColumn(
    "conv_id", F.concat_ws("_", "conv_id", "_r")).drop("_r")
tx.repartition(64, "conv_id").write.mode("overwrite").parquet(out)
print("PREPARED", spark.read.parquet(out).count())
"""

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO_ROOT"])
par, path, reps = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])

from bench import _calibrate
from pyspark.sql import Window
from pyspark.sql import functions as F
from sqlfeatureextraction_spark.session import get_spark
from sqlfeatureextraction_spark.operators.sessionize import (
    merge_consecutive_turns, pair_prompt_response)

spark = get_spark("sft_scale", parallelism=par, shuffle_partitions=par)

def job():
    tx = spark.read.parquet(path)
    merged = merge_consecutive_turns(tx, conv_col="conv_id",
                                     order_cols=("turn_idx",))
    pairs = pair_prompt_response(merged, conv_col="conv_id",
                                 order_cols=("seg_idx",))
    n_tok = F.size(F.split(F.trim(F.col("response_text")), r"\s+"))
    gated = pairs.where(n_tok >= 2)
    w = Window.partitionBy("prompt_text", "response_text").orderBy(
        "conv_id", "seg_idx")
    return (gated.withColumn("_rn", F.row_number().over(w))
                 .where(F.col("_rn") == 1).count())

n = job()  # warm-up
cap = int(os.environ.get("SCALE_MAX_REPS", str(max(reps * 3, reps + 3))))
times, brackets, cals = [], [], [_calibrate()]
clean = []
for i in range(cap):
    t0 = time.perf_counter(); n = job(); dt = time.perf_counter() - t0
    times.append(dt)
    cals.append(_calibrate())
    brackets.append((cals[-2], cals[-1], dt))
    best_cal = min(cals)
    clean = [t for a, b, t in brackets
             if a < 1.5 * best_cal and b < 1.5 * best_cal]
    is_clean = (brackets[-1][0] < 1.5 * best_cal
                and brackets[-1][1] < 1.5 * best_cal)
    print(json.dumps({"rep": i, "rows": n, "sec": round(dt, 3),
                      "cal": [cals[-2], cals[-1]], "clean": is_clean}))
    sys.stdout.flush()
    if len(clean) >= reps:
        break
basis = clean if clean else times
med = sorted(basis)[len(basis) // 2]
best = min(basis)
print(json.dumps({"parallelism": par, "rows": n,
                  "sec_median": round(med, 3), "sec_min": round(best, 3),
                  "all_secs": [round(t, 1) for t in times],
                  "clean_secs": [round(t, 1) for t in clean],
                  "rows_per_sec_median": round(n / med, 1),
                  "rows_per_sec_min": round(n / best, 1)}))
sys.stdout.flush()
try:
    spark.stop()
except Exception:
    pass
os._exit(0)
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, REPO_ROOT=root)
    path = f"/tmp/sft_scale_input_{rep}"
    if not os.path.exists(path):
        subprocess.run(
            [sys.executable, "-c", PREP, sf_dir, str(rep), path],
            env=env,
            check=True,
        )
    out = {}
    for par in (n_lo, n_hi):
        r = subprocess.run(
            [sys.executable, "-c", CHILD, str(par), path, str(reps)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        lines = [
            json.loads(x)
            for x in r.stdout.splitlines()
            if x.startswith("{")
        ]
        out[par] = lines[-1]
        print(json.dumps(out[par]))
    lo, hi = out[n_lo], out[n_hi]
    for stat in ("sec_median", "sec_min"):
        eff = (lo[stat] / hi[stat]) / (n_hi / n_lo)
        print(
            json.dumps(
                {
                    "pair": f"local[{n_lo}]->local[{n_hi}]",
                    "basis": stat,
                    "speedup": round(lo[stat] / hi[stat], 3),
                    "efficiency": round(eff, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
