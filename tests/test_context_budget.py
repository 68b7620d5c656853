"""Context-window assembly under a token budget (SFT history builder)."""

from pyspark.sql import functions as F


def _ntok(s):
    return max(1, len((s or "").split()))


def _brute(pdf, budget):
    """Backwards greedy scan per anchor — the definitional loop."""
    out = {}
    for conv, grp in pdf.groupby("conv_id"):
        grp = grp.sort_values("turn_idx")
        rows = [(int(r.turn_idx), _ntok(r.text)) for r in grp.itertuples()]
        for i, (idx_i, _) in enumerate(rows):
            total, turns, start = 0, 0, None
            for j in range(i - 1, -1, -1):
                if total + rows[j][1] > budget:
                    break
                total += rows[j][1]
                turns += 1
                start = rows[j][0]
            out[(conv, idx_i)] = (turns, total, start)
    return out


def test_context_budget_matches_brute(spark, transcripts_pdf):
    from sqlfeatureextraction_spark.operators.sessionize import (
        assemble_context_budget,
    )

    pdf = transcripts_pdf[["conv_id", "turn_idx", "text"]]
    df = spark.createDataFrame(
        pdf, "conv_id string, turn_idx int, text string"
    )
    for budget in (0, 7, 40, 10_000):
        got = {
            (r.conv_id, r.turn_idx): (
                r.ctx_turns,
                r.ctx_tokens,
                r.ctx_start_idx,
            )
            for r in assemble_context_budget(df, budget).collect()
        }
        want = _brute(pdf, budget)
        assert got == want, f"budget={budget}"


def test_context_budget_token_charge_floor(spark):
    from sqlfeatureextraction_spark.operators.sessionize import (
        assemble_context_budget,
    )

    df = spark.createDataFrame(
        [("c", 0, ""), ("c", 1, None), ("c", 2, "a b c")],
        "conv_id string, turn_idx int, text string",
    )
    rows = {
        r.turn_idx: r
        for r in assemble_context_budget(df, budget_tokens=2).collect()
    }
    # empty/None turns are charged 1 token each, so both fit in budget 2
    assert rows[2].ctx_turns == 2
    assert rows[2].ctx_tokens == 2
    assert rows[2].ctx_start_idx == 0
    assert rows[0].ctx_turns == 0 and rows[0].ctx_start_idx is None
    assert rows[0].n_tokens == 1 and rows[2].n_tokens == 3
