"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries": {name: sec},
"sf", plus throughput extras}.

Set BENCH_PARALLELISM to override the core count (used by
scripts/scale_bench.py to measure N-vs-4N scaling efficiency).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas-UDF type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def _cpu_stat():
    """First /proc/stat line as ints (user..steal) or None."""
    try:
        return [int(x) for x in open("/proc/stat").readline().split()[1:9]]
    except Exception:  # non-Linux
        return None


def _calibrate() -> float:
    """Fixed single-thread work unit (seconds) — a host-noise sentinel:
    on a quiet box this is stable to a few percent; CPU-steal bursts
    show up directly as inflation here."""
    import numpy as np

    a = np.arange(1_500_000, dtype=np.float64)
    t0 = time.perf_counter()
    for _ in range(40):
        a = np.sqrt(a * 1.000001 + 1.0)
    return round(time.perf_counter() - t0, 4)


HEADLINE = [
    "transcript_window_features",  # flagship end-to-end pipeline
    "pit_window_sum",
    "sessionize",
    "asof_last_match",
    "topk_per_group",
    "backfill_spine",
    "group_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(
        os.environ.get(
            "BENCH_PARALLELISM", os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
    )
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as E
    from sqlfeatureextraction_spark.session import get_spark

    spark = get_spark("bench", parallelism=cpus, shuffle_partitions=cpus)

    qs = E.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    # warm the JVM/parquet footer caches with a trivial action, and
    # the Python/Arrow worker pool (fork + numpy/pandas import per
    # core) with a no-op pandas UDF — otherwise the first measured
    # Arrow stage pays ~1-2 s of pool spawn that is session setup,
    # not query work
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _warm(v: pd.Series) -> pd.Series:
        return v * 1.0

    spark.range(
        cpus * 4, numPartitions=cpus
    ).select(_warm(F.col("id").cast("double"))).count()

    # best-of-3 per query, reps ROUND-ROBIN (rep 1 of every query,
    # then rep 2, ...): this VM shows bursty CPU steal (a fixed
    # single-thread numpy matmul swings +-40% run-to-run; /proc/stat
    # records ~3% average steal with multi-minute bursts), and a
    # 32-task stage is gated by its SLOWEST task, so single reps swing
    # 2-6x.  Back-to-back reps of one query all land inside the same
    # burst; round-robin separates a query's reps by minutes so the
    # min over reps actually dodges it.  Steal%% over the bench window
    # and a fixed-work calibration are recorded in the JSON so a
    # contaminated record is identifiable.
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # 10 passes ≈ +40 s over the old 6-pass cap, but multi-minute
    # steal bursts (measured on this host) can cover 6 back-to-back
    # passes entirely — the extra passes are what let the min dodge a
    # burst that spans the whole early window
    max_passes = int(os.environ.get("BENCH_MAX_PASSES", "10"))
    stat0 = _cpu_stat()
    cals = [_calibrate()]
    brackets: list[tuple[float, float]] = []
    clean_passes = 0
    passes = 0
    while passes < max_passes:
        for name in HEADLINE:
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if dt < timings.get(name, float("inf")):
                timings[name] = dt
            rows[name] = n
        cals.append(_calibrate())
        passes += 1
        brackets.append((cals[-2], cals[-1]))
        # a pass whose bracketing calibrations are both within 1.5x of
        # the best calibration seen ran on a quiet host; keep passing
        # (up to the cap) until `reps` passes were clean.  EVERY pass
        # is re-certified against the GLOBAL min each iteration: if a
        # steal burst covers the first passes, they self-certify
        # against the inflated min-so-far, but the first quiet pass
        # drops the global min and DE-certifies them, so the loop
        # keeps going until `reps` passes are clean under the final
        # min (or the cap is hit — clean_passes in the JSON then says
        # so).  Inflation can only slow a pass, so taking the min of
        # timings over all passes, clean or not, stays sound.
        best_cal = min(cals)
        clean_passes = sum(
            1
            for a, b in brackets
            if a < 1.5 * best_cal and b < 1.5 * best_cal
        )
        if clean_passes >= reps:
            break
    timings = {k: round(v, 3) for k, v in timings.items()}
    stat1 = _cpu_stat()
    steal_pct = None
    if stat0 and stat1:
        d = [y - x for x, y in zip(stat0, stat1)]
        steal_pct = round(100.0 * d[7] / max(sum(d), 1), 2)

    total = round(sum(timings.values()), 3)
    n_turns = rows.get("pit_window_sum", 0)
    flagship_s = timings.get("transcript_window_features", float("nan"))
    out = {
        "metric": "end-to-end feature-pipeline wall time (headline queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "parallelism": cpus,
        "reps_per_query": passes,
        "clean_passes": clean_passes,
        "timing": "min over round-robin passes (host-noise mitigation)",
        "host_noise": {
            "steal_pct_bench_window": steal_pct,
            "fixed_work_cal_sec": cals,
        },
        "rows": rows,
        "turns_per_sec": round(n_turns / flagship_s, 1) if flagship_s else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
