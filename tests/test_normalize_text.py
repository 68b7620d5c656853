"""Pre-dedup text canonicalization."""

import re


def _norm(s):
    s = s or ""
    s = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", s)
    s = s.translate(str.maketrans("‘’“”–—", "''\"\"--"))
    s = s.lower()
    s = re.sub(r"\s+", " ", s)
    return s.strip()


def test_normalize_matches_python(spark, transcripts_pdf):
    from sqlfeatureextraction_spark.operators.textstats import (
        with_normalized_text,
    )

    cases = [
        (0, "  Hello\t\tWorld \n"),
        (1, "‘quoted’ “smart” – dash—em"),
        (2, "CTRL\x00\x07chars\x1fgone"),
        (3, None),
        (4, "MiXeD   CaSe"),
    ] + [
        (10 + i, t)
        for i, t in enumerate(transcripts_pdf["text"].head(50))
    ]
    df = spark.createDataFrame(cases, "id int, text string")
    got = {r.id: r.norm_text for r in with_normalized_text(df).collect()}
    for i, t in cases:
        assert got[i] == _norm(t), (i, t)
    assert got[0] == "hello world"
    assert got[1] == "'quoted' \"smart\" - dash-em"
    assert got[2] == "ctrlchars" + "gone"
    assert got[3] == ""
