"""Conversation-level exact dedup (ordered-text fingerprints)."""

import hashlib

from pyspark.sql import functions as F


def _fp(texts):
    return hashlib.md5(chr(31).join(texts).encode()).hexdigest()


def _with_dup_convs(pdf):
    dup = pdf[pdf["conv_id"].isin(pdf["conv_id"].unique()[:3])].copy()
    dup["conv_id"] = "zz_" + dup["conv_id"]
    import pandas as pd

    return pd.concat([pdf, dup], ignore_index=True)


def test_dedup_conversations_matches_python_replay(spark, transcripts_pdf):
    from sqlfeatureextraction_spark.operators.dedup import (
        dedup_conversations,
    )

    pdf = _with_dup_convs(transcripts_pdf)
    df = spark.createDataFrame(
        pdf[["conv_id", "turn_idx", "text"]],
        "conv_id string, turn_idx int, text string",
    )
    got = {
        r["conv_id"]: (r["fp"], r["n_turns"], r["dup_rank"], r["keep"])
        for r in dedup_conversations(df).collect()
    }
    # python replay
    ref_fp = {}
    for conv, grp in pdf.groupby("conv_id"):
        grp = grp.sort_values("turn_idx", kind="stable")
        ref_fp[conv] = (
            _fp([t or "" for t in grp["text"]]),
            len(grp),
        )
    assert {c: (v[0], v[1]) for c, v in got.items()} == ref_fp
    # each duplicated conversation shares its original's fp; the
    # original (lower id) keeps, the zz_ copy drops
    for conv in list(transcripts_pdf["conv_id"].unique()[:3]):
        assert got[conv][0] == got["zz_" + conv][0]
        assert got[conv][3] is True and got["zz_" + conv][3] is False
    # non-duplicated conversations all keep
    dup_set = {c for c in got if c.startswith("zz_")} | {
        c[3:] for c in got if c.startswith("zz_")
    }
    assert all(v[3] for c, v in got.items() if c not in dup_set)


def test_dedup_conversations_order_sensitivity(spark):
    from sqlfeatureextraction_spark.operators.dedup import (
        dedup_conversations,
    )

    rows = [
        ("a", 0, "x"), ("a", 1, "y"),
        ("b", 0, "y"), ("b", 1, "x"),  # same bag, different order
        ("c", 0, "x"), ("c", 1, "y"),  # true dup of a
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    got = {r["conv_id"]: r for r in dedup_conversations(df).collect()}
    assert got["a"]["fp"] == got["c"]["fp"] != got["b"]["fp"]
    assert got["a"]["keep"] and got["b"]["keep"] and not got["c"]["keep"]


def test_dedup_conversations_plan_no_python(spark, transcripts_df):
    from sqlfeatureextraction_spark.operators.dedup import (
        dedup_conversations,
    )

    plan = dedup_conversations(transcripts_df)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
