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


def _ref_pairs(pdf, prompt="user", response="assistant"):
    out = []
    for conv, grp in pdf.groupby("conv_id"):
        grp = grp.sort_values("turn_idx", kind="stable")
        last_p = None
        for r in grp.itertuples():
            if r.role == prompt:
                last_p = (r.turn_idx, r.text or "", r.ts)
            elif r.role == response and last_p is not None:
                lat = int(r.ts.timestamp()) - int(last_p[2].timestamp())
                out.append(
                    (conv, r.turn_idx, last_p[0], last_p[1],
                     r.text or "", lat)
                )
    return sorted(out)


def test_pair_prompt_response_matches_replay(
    spark, transcripts_pdf, transcripts_df
):
    from sqlfeatureextraction_spark.operators.sessionize import (
        pair_prompt_response,
    )

    got = sorted(
        tuple(r)
        for r in pair_prompt_response(
            transcripts_df, ts_col="ts"
        ).collect()
    )
    ref = _ref_pairs(transcripts_pdf)
    assert got == ref
    assert len(got) > 50  # the fixture has plenty of assistant turns


def test_pair_prompt_response_skips_interleaved_tools(spark):
    from sqlfeatureextraction_spark.operators.sessionize import (
        pair_prompt_response,
    )

    rows = [
        ("c", 0, "user", "q1"),
        ("c", 1, "tool", "t"),
        ("c", 2, "assistant", "a1"),   # pairs with q1 across the tool turn
        ("c", 3, "assistant", "a2"),   # ALSO pairs with q1 (still nearest)
        ("d", 0, "assistant", "orphan"),  # no preceding prompt: dropped
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["prompt_idx"], r["prompt_text"])
        for r in pair_prompt_response(df).collect()
    }
    assert got == {("c", 2): (0, "q1"), ("c", 3): (0, "q1")}
