"""Per-group rank normalization (percent_rank / cume_dist)."""


def test_percent_rank_matches_definition(spark):
    from sqlfeatureextraction_spark.operators.stats import (
        with_group_percent_rank,
    )

    rows = [
        ("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 40.0),
        ("b", 5.0),                      # single-row group
        ("c", 1.0), ("c", None), ("c", 2.0),
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = sorted(
        (r.grp, r.v, r.pct_rank, r.cdf)
        for r in with_group_percent_rank(df, "grp", "v").collect()
    )
    assert got == sorted(
        [
            ("a", 10.0, 0.0, 0.25),
            ("a", 20.0, round(1 / 3, 6), 0.75),
            ("a", 20.0, round(1 / 3, 6), 0.75),
            ("a", 40.0, 1.0, 1.0),
            ("b", 5.0, 0.0, 1.0),
            ("c", 1.0, 0.0, 0.5),
            ("c", 2.0, 1.0, 1.0),
        ]
    )
