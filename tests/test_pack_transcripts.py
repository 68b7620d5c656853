"""Transcript -> training-example packing manifest (loss-mask spans)."""


def _ref_spans(pdf, sep="\n", train=("assistant",)):
    out = {}
    for conv, grp in pdf.groupby("conv_id"):
        grp = grp.sort_values("turn_idx", kind="stable")
        pos = 0
        for r in grp.itertuples():
            piece = len(f"{r.role}: ") + len(r.text or "")
            out[(conv, r.turn_idx)] = (
                r.role,
                pos,
                pos + piece,
                r.role in train,
            )
            pos += piece + len(sep)
    return out


def test_pack_transcript_spans_matches_string_build(
    spark, transcripts_pdf, transcripts_df
):
    from sqlfeatureextraction_spark.operators.sessionize import (
        pack_transcript_spans,
    )

    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["role"],
            r["start_char"],
            r["end_char"],
            r["train_on"],
        )
        for r in pack_transcript_spans(transcripts_df).collect()
    }
    assert got == _ref_spans(transcripts_pdf)

    # spans really index the rendered conversation: rebuild one hot
    # conversation's packed string and slice every span out of it
    conv = transcripts_pdf["conv_id"].iloc[0]
    grp = transcripts_pdf[transcripts_pdf["conv_id"] == conv].sort_values(
        "turn_idx", kind="stable"
    )
    packed = "\n".join(
        f"{r.role}: {r.text or ''}" for r in grp.itertuples()
    )
    for r in grp.itertuples():
        role, s, e, _ = got[(conv, r.turn_idx)]
        assert packed[s:e] == f"{role}: {r.text or ''}"


def test_pack_transcript_spans_mask_roles(spark, transcripts_df):
    from pyspark.sql import functions as F

    from sqlfeatureextraction_spark.operators.sessionize import (
        pack_transcript_spans,
    )

    spans = pack_transcript_spans(
        transcripts_df, train_roles=("assistant", "tool")
    )
    bad = spans.where(
        F.col("train_on") != F.col("role").isin("assistant", "tool")
    ).count()
    assert bad == 0
    # contiguity: next start == prev end + len(sep) within each conv
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = spans.withColumn(
        "nxt", F.lead("start_char").over(w)
    ).where(
        F.col("nxt").isNotNull()
        & (F.col("nxt") != F.col("end_char") + 1)
    )
    assert gaps.count() == 0
