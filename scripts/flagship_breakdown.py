"""Stage-level breakdown of the flagship pipeline at a given sf_dir
(guide §1: isolate each expensive piece with the noop sink).

Usage: python scripts/flagship_breakdown.py [sf_dir] [reps]
"""

import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas-UDF type hints)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sqlfeatureextraction_spark.config import FeatureConfig
from sqlfeatureextraction_spark.operators.pit_window import (
    window_feature_scalars,
    window_features_builtin,
)
from sqlfeatureextraction_spark.operators.vectorize import (
    with_turn_features,
    with_turn_scalars,
)
from sqlfeatureextraction_spark.session import get_spark
from sqlfeatureextraction_spark.synth import events_as_transcripts
from sqlfeatureextraction_spark.vocab import fit_vocabulary


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("flagship_breakdown", parallelism=cpus, shuffle_partitions=cpus)
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    @F.pandas_udf("double")
    def _w(v: pd.Series) -> pd.Series:
        return v * 1.0

    spark.range(cpus * 4, numPartitions=cpus).select(
        _w(F.col("id").cast("double"))
    ).count()

    cfg = FeatureConfig()
    best: dict[str, float] = {}

    def t(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best[name] = min(dt, best.get(name, float("inf")))

    for _ in range(reps):
        tx = events_as_transcripts(spark, sf_dir)
        t("fit_vocabulary", lambda: fit_vocabulary(tx, max_tokens=256))
        vocab = fit_vocabulary(tx, max_tokens=256)

        # new narrow path, piecewise
        t("vec_s build (sparse+sums encode)", lambda: noop(with_turn_scalars(tx, vocab, cfg)[0]))
        vec_s, layout = with_turn_scalars(tx, vocab, cfg)
        t("new full (window_feature_scalars)", lambda: noop(window_feature_scalars(vec_s, vocab, cfg, layout)))

        # old path, piecewise (fresh plan each rep; unpersist to avoid
        # cross-rep cache reuse so the COLD cost is measured)
        vec_d, layout_d = with_turn_features(tx, vocab, cfg)
        vec_c = vec_d.cache()
        t("old vec build+cache (dense encode)", lambda: noop(vec_c))
        t("old full WARM (cache built)", lambda: noop(
            window_features_builtin(vec_c, vocab, cfg, layout_d, scalars_only=True)))
        vec_c.unpersist(blocking=True)

    for k, v in best.items():
        print(f"{k:45s} {v:7.3f}")


if __name__ == "__main__":
    main()
