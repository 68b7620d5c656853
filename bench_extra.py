"""Extra benchmarks for optimization work (guide §1) — NOT the driver
contract; bench.py stays the frozen measurement surface.

Modes (first arg):
  noop [sf_dir] [names...]   time each query via the noop sink
                             (computes every column, guide §1.4),
                             min over $REPS (default 3) reps
  count [sf_dir] [names...]  time via .count() exactly as bench.py does
  all [sf_dir]               time EVERY queries() entry once via noop
                             (checklist sweep; prints name,sec,rows)
  plans [sf_dir] [out_dir] [names...]
                             dump .explain("formatted") per query

Each query is labeled via setJobDescription for UI-free attribution.
"""

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas-UDF type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "transcript_window_features",
    "pit_window_sum",
    "sessionize",
    "asof_last_match",
    "topk_per_group",
    "backfill_spine",
    "group_agg",
]


def _spark():
    from sqlfeatureextraction_spark.session import get_spark

    cpus = int(os.environ.get("BENCH_PARALLELISM", os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark = get_spark("bench_extra", parallelism=cpus, shuffle_partitions=cpus)
    return spark


def _warm(spark, sf_dir):
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    @F.pandas_udf("double")
    def _w(v: pd.Series) -> pd.Series:
        return v * 1.0

    n = spark.sparkContext.defaultParallelism
    spark.range(n * 4, numPartitions=n).select(_w(F.col("id").cast("double"))).count()


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "noop"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import __spark_entry__ as E

    qs = E.queries()
    spark = _spark()
    _warm(spark, sf_dir)
    reps = int(os.environ.get("REPS", "3"))

    if mode == "plans":
        out_dir = sys.argv[3]
        names = sys.argv[4:] or HEADLINE
        os.makedirs(out_dir, exist_ok=True)
        suffix = os.environ.get("PLAN_SUFFIX", "before")
        for name in names:
            df = qs[name](spark, sf_dir)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {out_dir}/{name}_{suffix}.txt")
        return

    if mode == "all":
        skip = {"stream_windowed_counts", "stream_stateful_counter"}
        out = {}
        for name in qs:
            if name in skip:
                continue
            spark.sparkContext.setJobDescription(f"all:{name}")
            t0 = time.perf_counter()
            try:
                _noop(qs[name](spark, sf_dir))
                dt = round(time.perf_counter() - t0, 3)
                out[name] = dt
                print(f"{name}\t{dt}", flush=True)
            except Exception as e:  # keep sweeping
                print(f"{name}\tERR {type(e).__name__}: {e}", flush=True)
        print(json.dumps(out))
        return

    names = sys.argv[3:] or HEADLINE
    timings: dict[str, float] = {}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"{mode}:{name}")
            t0 = time.perf_counter()
            if mode == "count":
                qs[name](spark, sf_dir).count()
            else:
                _noop(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            timings[name] = min(dt, timings.get(name, float("inf")))
    timings = {k: round(v, 3) for k, v in timings.items()}
    print(json.dumps({"mode": mode, "sf_dir": sf_dir, "reps": reps, "queries": timings, "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
