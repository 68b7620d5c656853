"""W9 lead-chain hot-conversation benchmark: ONE conversation holds
ALL rows (the round-3 scale-watch item).

The local pandas path (`reorganize_sessions`) processes the whole
conversation in a single applyInPandas task — vectorized, but one task
pins both the time and the memory of the full group.  The distributed
path (`reorganize_sessions_distributed`) computes the hop map as a
bucketed forward as-of (≈64k distinct seconds per bucket, spread over
the cluster) and materializes chains with per-level joins — no task
ever sees more than one bucket.

Data: synthetic single-conversation timeline, strictly increasing
deterministic timestamps (gap 7..13 s), so both paths see identical
input without a driver-side generation step.  Each path runs in its
own subprocess with a wall cap.

Usage: python scripts/reorganize_skew_bench.py [n_rows] [cap_seconds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import sys, time, os
sys.path.insert(0, os.environ["REPO_ROOT"])
path_name, n_rows = sys.argv[1], int(sys.argv[2])
from pyspark.sql import functions as F
from sqlfeatureextraction_spark.session import get_spark
from sqlfeatureextraction_spark.operators.reorganize import (
    reorganize_sessions,
    reorganize_sessions_distributed,
)
spark = get_spark("reorg_skew")
df = spark.range(n_rows, numPartitions=64).select(
    F.lit("hot").alias("conv_id"),
    F.timestamp_seconds(
        F.lit(1704067200)
        + F.col("id") * 7
        + F.pmod(F.col("id") * 2654435761, F.lit(7))
    ).alias("ts"),
)
fn = (
    reorganize_sessions
    if path_name == "local"
    else reorganize_sessions_distributed
)
t = time.perf_counter()
cnt = fn(df, window_s=7200, max_hops=8).count()
print(f"RESULT {path_name} {n_rows} {cnt} {round(time.perf_counter()-t,2)}")
"""


def run_path(name: str, n_rows: int, cap: int) -> dict:
    env = dict(
        os.environ,
        REPO_ROOT=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", CHILD, name, str(n_rows)],
            capture_output=True,
            text=True,
            env=env,
            timeout=cap,
        )
        for ln in out.stdout.splitlines():
            if ln.startswith("RESULT"):
                _, _, n, cnt, sec = ln.split()
                return {"sec": float(sec), "rows": int(n), "out_rows": int(cnt)}
        return {"error": out.stderr[-500:]}
    except subprocess.TimeoutExpired:
        return {"sec": None, "note": f">{cap}s (killed)"}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 900
    dist = run_path("distributed", n_rows, cap)
    local = run_path("local", n_rows, cap)
    result = {
        "scenario": "single conversation holds 100% of rows (W9 lead-chain)",
        "n_rows": n_rows,
        "distributed_hopmap": dist,
        "local_single_task": local,
    }
    if dist.get("sec") and local.get("sec"):
        result["dist_over_local"] = round(dist["sec"] / local["sec"], 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
