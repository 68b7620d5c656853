"""End-to-end spine: vocab fit → per-turn vectors → point-in-time window
features, Spark vs the independent pandas oracle, numpy.allclose at
every (conv_id, ts).  (SURVEY §7.1 minimum slice.)"""

import numpy as np
import pandas as pd

from oracle import pandas_oracle as O
from sqlfeatureextraction_spark.config import FeatureConfig
from sqlfeatureextraction_spark.operators.pit_window import window_features_builtin
from sqlfeatureextraction_spark.operators.vectorize import with_turn_features
from sqlfeatureextraction_spark.vocab import Vocabulary, fit_vocabulary

CFG = FeatureConfig()


def test_vocab_fit_matches_oracle(transcripts_df, transcripts_pdf):
    v = fit_vocabulary(transcripts_df)
    tokens, roles, tools = O.fit_vocab(transcripts_pdf)
    assert v.tokens == tokens
    assert v.roles == roles
    assert v.tools == tools


def test_vocab_roundtrip_df(spark, transcripts_df):
    v = fit_vocabulary(transcripts_df)
    v2 = Vocabulary.from_df(v.to_df(spark))
    assert v2 == v


def test_turn_vectors_match_oracle(transcripts_df, transcripts_pdf):
    v = fit_vocabulary(transcripts_df)
    vec_df, layout = with_turn_features(transcripts_df, v, CFG)
    got = (
        vec_df.select("conv_id", "turn_idx", "lag_sec", "features")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = O.turn_vectors(transcripts_pdf, *O.fit_vocab(transcripts_pdf))
    exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    assert len(got) == len(exp)
    assert layout.width == len(exp["vector"].iloc[0])
    # lag parity (nulls on first turns)
    pd.testing.assert_series_equal(
        got["lag_sec"].astype("float64"),
        exp["lag_sec"].astype("float64"),
        check_names=False,
    )
    got_mat = np.vstack(got["features"].to_numpy())
    exp_mat = np.vstack(exp["vector"].to_numpy())
    assert np.allclose(got_mat, exp_mat)


def test_layout_widths_pinned(transcripts_df):
    v = fit_vocabulary(transcripts_df)
    layout = v.layout()
    assert [s.name for s in layout.segments] == [
        "time",
        "role",
        "tool",
        "bow",
        "lag",
    ]
    assert layout.seg("time").width == 31
    assert layout.seg("lag").width == 9
    assert layout.seg("role").width == len(v.roles)
    assert layout.seg("tool").width == len(v.tools)
    assert layout.seg("bow").width == len(v.tokens)
    assert layout.width == 31 + len(v.roles) + len(v.tools) + len(v.tokens) + 9


def test_window_features_match_oracle(transcripts_df, transcripts_pdf):
    v = fit_vocabulary(transcripts_df)
    vec_df, layout = with_turn_features(transcripts_df, v, CFG)
    wf = window_features_builtin(vec_df, v, CFG, layout)
    got = (
        wf.toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )

    tokens, roles, tools = O.fit_vocab(transcripts_pdf)
    tv = O.turn_vectors(transcripts_pdf, tokens, roles, tools)
    exp = O.window_features(
        tv, tools, window_s=CFG.window_size_s,
        top_k=CFG.top_k_entities, top_n=CFG.top_n_members,
    ).sort_values(["conv_id", "ts"]).reset_index(drop=True)

    assert len(got) == len(exp), (len(got), len(exp))
    assert (got["conv_id"] == exp["conv_id"]).all()
    got_mat = np.vstack(got["window_features"].to_numpy())
    exp_mat = np.vstack(exp["window_features"].to_numpy())
    assert got_mat.shape == exp_mat.shape
    bad = ~np.isclose(got_mat, exp_mat).all(axis=1)
    assert not bad.any(), got.loc[bad, ["conv_id", "ts"]].head(10).to_string()


def test_zero_leakage_window_features(transcripts_df, transcripts_pdf):
    """Recompute on a time-truncated input: features at (conv_id, ts)
    must be identical when all rows with ts' > ts are removed
    (north-rule zero-leakage invariant)."""
    v = fit_vocabulary(transcripts_df)
    vec_df, layout = with_turn_features(transcripts_df, v, CFG)
    full = window_features_builtin(vec_df, v, CFG, layout).toPandas()

    cutoff = transcripts_pdf["ts"].quantile(0.5)
    trunc_pdf = transcripts_pdf[transcripts_pdf["ts"] <= cutoff]
    trunc_df = transcripts_df.where(f"ts <= timestamp'{cutoff}'")
    vec_t, _ = with_turn_features(trunc_df, v, CFG)
    trunc = window_features_builtin(vec_t, v, CFG, layout).toPandas()

    merged = full.merge(
        trunc, on=["conv_id", "ts"], suffixes=("_full", "_trunc")
    )
    assert len(merged) == len(trunc)
    for _, r in merged.iterrows():
        assert np.allclose(r["window_features_full"], r["window_features_trunc"])
