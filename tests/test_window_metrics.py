"""A7 windowed cost metrics + S7 metric sink."""

import glob
import json

from pyspark.sql import functions as F

from sqlfeatureextraction_spark.config import FeatureConfig
from sqlfeatureextraction_spark.operators.windows import (
    metrics_summary,
    window_cost_metrics,
)
from sqlfeatureextraction_spark.sources.io import write_metrics


def test_window_cost_metrics_and_sink(spark, tmp_path):
    rows = [
        ("c1", "2024-01-01 00:00:30", 10),
        ("c1", "2024-01-01 00:01:30", 20),
        ("c1", "2024-01-01 00:10:00", 5),  # gap → empty windows between
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts string, cost long")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    cfg = FeatureConfig(window_size_s=120, slide_s=60)
    m = window_cost_metrics(df, cfg, cost_col="cost").toPandas()
    m = m.set_index("window_start_sec").sort_index()

    # spine is dense from floor(min/60)*60 to ceil(max/60)*60
    assert m.index.min() == 1704067200  # floor(00:00:30 / 60) * 60
    assert m.index.max() == 1704067800  # ceil(00:10:00 / 60) * 60
    # start 1704067200 → (00:00, 00:02]: rows at 00:00:30 and 00:01:30
    assert m.loc[1704067200, "n_turns"] == 2
    assert m.loc[1704067200, "total_cost"] == 30
    # start 00:09 → (00:09, 00:11]: the 00:10:00 row
    assert m.loc[1704067740, "n_turns"] == 1
    assert m.loc[1704067740, "total_cost"] == 5
    # right-closed: the 00:10:00 row is NOT in the window starting at
    # its own timestamp
    assert m.loc[1704067800, "n_turns"] == 0
    # the dead zone between 00:03 and 00:08 is empty but present
    assert bool(m.loc[1704067200 + 300, "is_empty"])
    assert m.loc[1704067200 + 300, "n_turns"] == 0

    s = metrics_summary(
        window_cost_metrics(df, cfg, cost_col="cost")
    ).first()
    assert s["n_windows"] == len(m)
    assert s["n_empty"] == int(m["is_empty"].sum())
    assert s["total_cost"] == int(m["total_cost"].sum())

    out = str(tmp_path / "metrics")
    write_metrics(metrics_summary(window_cost_metrics(df, cfg, cost_col="cost")), out)
    files = glob.glob(out + "/*.json")
    assert files
    rec = json.loads(open(files[0]).read().splitlines()[0])
    assert rec["n_windows"] == s["n_windows"]
