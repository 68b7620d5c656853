"""Scale evidence for curation.exact_rank_prefix: the range-pass
global rank+prefix-sum vs the naive single-task unpartitioned Window,
plus the N->4N scaling pair on the primitive itself.

Methodology matches scale_bench.py: fresh JVM per level, identical
input parquet, bench.py's steal sentinel, min/median over reps.

Usage: python scripts/rank_prefix_bench.py [sf_dir] [rep] [reps]
       defaults: /root/testdata/sf0.01  100  3
(sf0.01 events = 100k rows; rep=100 -> 10M-row ranked table)
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
spark = get_spark("rp_prep")
ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
    "event_id", "value")
ev = ev.withColumn(
    "_r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
).select(
    (F.col("event_id") * rep + F.col("_r")).alias("k"),
    F.coalesce("value", F.lit(0.0)).alias("v"),
)
ev.repartition(64).write.mode("overwrite").parquet(out)
print("PREPARED", spark.read.parquet(out).count())
"""

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO_ROOT"])
par, path, reps, mode = (
    int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), sys.argv[4])

from bench import _calibrate
from pyspark.sql import Window
from pyspark.sql import functions as F
from sqlfeatureextraction_spark.session import get_spark
from sqlfeatureextraction_spark.operators.curation import (
    exact_rank_prefix)

spark = get_spark("rp_scale", parallelism=par, shuffle_partitions=par)

def job():
    df = spark.read.parquet(path)
    if mode == "primitive":
        out = exact_rank_prefix(df, ["k"], ["v"])
    else:  # naive: single-task unpartitioned Window
        w = Window.orderBy("k")
        ws = w.rowsBetween(Window.unboundedPreceding, 0)
        out = df.withColumn("rank", F.row_number().over(w)).withColumn(
            "cum_v", F.sum("v").over(ws))
    r = out.agg(
        F.count("*"), F.sum("rank"), F.round(F.sum("cum_v"), 2)
    ).collect()[0]
    return tuple(r)

job()  # warm
res = []
for _ in range(reps):
    cal0 = _calibrate()
    t = time.monotonic()
    chk = job()
    dt = time.monotonic() - t
    cal1 = _calibrate()
    res.append({"s": round(dt, 3), "cal": round(max(cal0, cal1), 4),
                "check": list(chk)})
print("RESULT " + json.dumps({"par": par, "mode": mode, "reps": res}))
"""


def run(script, args):
    env = dict(os.environ, REPO_ROOT=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    p = subprocess.run(
        [sys.executable, "-c", script, *map(str, args)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith(("PREPARED", "RESULT")):
            return line
    print(p.stdout[-3000:], p.stderr[-3000:])
    raise SystemExit(f"child failed rc={p.returncode}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    path = "/tmp/rank_prefix_bench_input"
    print(run(PREP, [sf_dir, rep, path]))
    out = {}
    for par, mode in ((8, "naive"), (2, "primitive"), (8, "primitive")):
        line = run(CHILD, [par, path, reps, mode])
        out[f"{mode}@{par}"] = json.loads(line[len("RESULT "):])
        print(line)
    lo = min(r["s"] for r in out["primitive@2"]["reps"])
    hi = min(r["s"] for r in out["primitive@8"]["reps"])
    nv = min(r["s"] for r in out["naive@8"]["reps"])
    print(json.dumps({
        "primitive_min_2": lo, "primitive_min_8": hi,
        "naive_min_8": nv,
        "speedup_vs_naive_8": round(nv / hi, 2),
        "efficiency_2_to_8": round(lo / (4 * hi), 3),
    }))


if __name__ == "__main__":
    main()
