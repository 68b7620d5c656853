"""Fenced code-block extraction (code-mining step)."""

import re

PAT = re.compile(r"```([a-zA-Z0-9_+\-]*)\r?\n(.*?)```", re.S)


def _brute(doc_id, text):
    out = []
    for i, m in enumerate(PAT.finditer(text or "")):
        code = re.sub(r"\n$", "", m.group(2))
        out.append(
            (doc_id, i, m.group(1), code, len(code), len(code.split("\n")))
        )
    return out


def test_code_blocks_match_re_replay(spark, transcripts_pdf):
    from sqlfeatureextraction_spark.operators.textstats import (
        extract_code_blocks,
    )

    # synthesize markdown with 0/1/2 fences per row from the fixture
    pdf = transcripts_pdf[["conv_id", "turn_idx", "text"]].copy()
    pdf["doc_id"] = range(len(pdf))

    def mk(r):
        t = r.text or ""
        k = r.doc_id % 4
        if k == 0:
            return f"intro\n```python\n{t[:40]}\n```\ntail"
        if k == 1:
            return f"a\n```\n{t[:10]}\n``` mid\n```js\n{t[10:30]}```"
        if k == 2:
            return "no fences " + t[:20] + " ``` unclosed\n"
        return t

    pdf["md"] = [mk(r) for r in pdf.itertuples()]
    df = spark.createDataFrame(
        pdf[["doc_id", "md"]], "doc_id long, md string"
    )
    got = sorted(
        tuple(r)
        for r in extract_code_blocks(
            df, text_col="md", id_cols=("doc_id",)
        ).collect()
    )
    want = sorted(
        t
        for r in pdf.itertuples()
        for t in _brute(r.doc_id, r.md)
    )
    assert got == want
    # half the rows carry 1 or 2 fences -> at least 0.5 blocks/doc
    assert len(got) >= len(pdf) // 2


def test_code_blocks_edges(spark):
    from sqlfeatureextraction_spark.operators.textstats import (
        extract_code_blocks,
    )

    cases = [
        (0, "```py\nx\n```"),          # trailing \n stripped
        (1, "```py\nx```"),            # no trailing \n to strip
        (2, "``` \nx\n```"),           # space after fence: not a match
        (3, "```\n\n```"),             # empty body -> one empty line
        (4, None),                     # NULL text -> no rows
        (5, "```a\n1\n``````b\n2\n```"),  # adjacent fences stay separate
    ]
    df = spark.createDataFrame(cases, "doc_id int, md string")
    rows = sorted(
        (r.doc_id, r.block_idx, r.lang, r.code, r.code_lines)
        for r in extract_code_blocks(
            df, text_col="md", id_cols=("doc_id",)
        ).collect()
    )
    assert rows == [
        (0, 0, "py", "x", 1),
        (1, 0, "py", "x", 1),
        (3, 0, "", "", 1),
        (5, 0, "a", "1", 1),
        (5, 1, "b", "2", 1),
    ]
