"""Temperature-based mixture reweighting."""


def test_mixture_weights_matches_math(spark):
    from sqlfeatureextraction_spark.operators.curation import (
        mixture_temperature_weights,
    )

    rows = (
        [("a", 10) for _ in range(80)]
        + [("b", 10) for _ in range(15)]
        + [("c", 10) for _ in range(5)]
    )
    df = spark.createDataFrame(rows, "source string, n_tok int")
    got = {
        r.source: r
        for r in mixture_temperature_weights(
            df, size_col="n_tok", alpha=0.5
        ).collect()
    }
    shares = {"a": 0.8, "b": 0.15, "c": 0.05}
    z = sum(v**0.5 for v in shares.values())
    for s, sh in shares.items():
        r = got[s]
        assert abs(r.share - sh) < 1e-9
        assert abs(r.weight - sh**0.5 / z) < 2e-6
        assert abs(r.oversample_factor - (sh**0.5 / z) / sh) < 2e-6
    # alpha=0.5 flattens: small domain oversampled, big undersampled
    assert got["c"].oversample_factor > 1 > got["a"].oversample_factor
    # weights sum to 1
    assert abs(sum(r.weight for r in got.values()) - 1.0) < 1e-5


def test_mixture_weights_alpha_limits(spark):
    from sqlfeatureextraction_spark.operators.curation import (
        mixture_temperature_weights,
    )

    df = spark.createDataFrame(
        [("a",)] * 9 + [("b",)], "source string"
    )
    prop = {
        r.source: r.weight
        for r in mixture_temperature_weights(df, alpha=1.0).collect()
    }
    unif = {
        r.source: r.weight
        for r in mixture_temperature_weights(df, alpha=0.0).collect()
    }
    assert abs(prop["a"] - 0.9) < 1e-9 and abs(prop["b"] - 0.1) < 1e-9
    assert abs(unif["a"] - 0.5) < 1e-9 and abs(unif["b"] - 0.5) < 1e-9
