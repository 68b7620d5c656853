"""P12/P13/J2/J3 + MINC layout vs hand-computed expectations."""

import pytest
from pyspark.sql import functions as F

from sqlfeatureextraction_spark.functions import sqlencode as SE
from sqlfeatureextraction_spark.functions.sqlfragments import SEL_PRED_OPS


@pytest.fixture(scope="module")
def vocab():
    return SE.SqlSchemaVocab(
        tables=("tbl", "zoo"),
        columns={"tbl": ("x", "y"), "zoo": ("z", "x2")},
        col_types={
            "tbl.x": "bigint",
            "tbl.y": "string",
            "zoo.z": "bigint",
            "zoo.x2": "bigint",
        },
        join_pairs={"tbl,zoo": ("x,z", "y,x2")},
        range_bins={
            "tbl.x": (("1", "10"), ("11", "20")),
            "tbl.y": (("alpha", "mike"), ("nike", "zulu")),
        },
    )


def _vec(spark, vocab, sql):
    df = spark.createDataFrame([(sql,)], "sql string")
    out, layout = SE.encode_minc(df, "sql", vocab)
    v = out.select("minc_features").first()[0]
    return list(v), layout


def seg_bits(v, layout, name):
    s = layout.seg(name)
    return [i for i in range(s.width) if v[s.offset + i] == 1.0]


def test_layout_widths(vocab):
    layout = vocab.layout()
    # 4 qtype + 2 tables + 10 col segments * 4 cols + 1 limit +
    # 2 join pairs + 4*7 selops + 4 range bins
    assert layout.seg("qtype").width == 4
    assert layout.seg("tables").width == 2
    for seg in ("projection", "avg", "count", "selection", "having"):
        assert layout.seg(seg).width == 4
    assert layout.seg("limit").width == 1
    assert layout.seg("join").width == 2
    assert layout.seg("selops").width == 4 * len(SEL_PRED_OPS)
    assert layout.seg("rangebins").width == 4
    assert layout.width == 4 + 2 + 40 + 1 + 2 + 28 + 4


def test_alias_resolution_sets_owner_bit(spark, vocab):
    """P13 acceptance: SELECT a.x FROM tbl a sets the tbl.x bit."""
    v, layout = _vec(spark, vocab, "SELECT a.x FROM tbl a")
    assert seg_bits(v, layout, "projection") == [0]  # tbl.x is bit 0
    assert seg_bits(v, layout, "tables") == [0]
    assert seg_bits(v, layout, "qtype") == [0]


def test_bare_column_single_table_and_owner_map(spark, vocab):
    v, layout = _vec(spark, vocab, "SELECT y FROM tbl WHERE x = 5")
    assert seg_bits(v, layout, "projection") == [1]  # tbl.y
    assert seg_bits(v, layout, "selection") == [0]  # tbl.x
    # two tables → bare col resolves through the owner map
    v2, layout = _vec(
        spark, vocab, "SELECT z FROM tbl JOIN zoo ON tbl.x = zoo.z"
    )
    assert seg_bits(v2, layout, "projection") == [2]  # zoo.z


def test_join_pair_canonicalization(spark, vocab):
    """J2: both orders of the predicate give the same canonical bit."""
    a, layout = _vec(
        spark, vocab, "SELECT a.x FROM tbl a JOIN zoo b ON a.x = b.z"
    )
    b, _ = _vec(
        spark, vocab, "SELECT a.x FROM tbl a JOIN zoo b ON b.z = a.x"
    )
    assert seg_bits(a, layout, "join") == seg_bits(b, layout, "join") == [0]


def test_in_subquery_rewrite(spark, vocab):
    """J3: x IN (SELECT z FROM zoo) contributes the (tbl.x, zoo.z)
    join-pair bit."""
    v, layout = _vec(
        spark, vocab, "SELECT y FROM tbl WHERE x IN (SELECT z FROM zoo)"
    )
    assert seg_bits(v, layout, "join") == [0]


def test_range_bins_int_string_like(spark, vocab):
    layout = vocab.layout()
    # integer path (F6 gate + numeric compare): 15 → bin 1 of tbl.x
    v, _ = _vec(spark, vocab, "SELECT y FROM tbl WHERE x >= 15")
    assert seg_bits(v, layout, "rangebins") == [1]
    # string compareTo path: 'golf' ∈ [alpha, mike] → bin 0 of tbl.y
    v, _ = _vec(spark, vocab, "SELECT y FROM tbl WHERE y = 'golf'")
    assert seg_bits(v, layout, "rangebins") == [2]
    # LIKE %substring% path: 'ulu' ⊂ 'zulu' (hi of bin 1 of tbl.y)
    v, _ = _vec(spark, vocab, "SELECT y FROM tbl WHERE y LIKE '%ulu%'")
    assert seg_bits(v, layout, "rangebins") == [3]
    # no matching bin → no bit
    v, _ = _vec(spark, vocab, "SELECT y FROM tbl WHERE x = 999")
    assert seg_bits(v, layout, "rangebins") == []


def test_selops_positions(spark, vocab):
    layout = vocab.layout()
    v, _ = _vec(
        spark, vocab, "SELECT y FROM tbl WHERE x >= 15 AND y LIKE '%u%'"
    )
    # tbl.x col 0, op '>=' idx 3; tbl.y col 1, op like idx 6
    assert seg_bits(v, layout, "selops") == [3, 1 * 7 + 6]


def test_query_types_and_limit(spark, vocab):
    v, layout = _vec(spark, vocab, "UPDATE tbl SET y = 'q' WHERE x = 3")
    assert seg_bits(v, layout, "qtype") == [1]
    assert seg_bits(v, layout, "tables") == [0]
    v, _ = _vec(spark, vocab, "DELETE FROM tbl WHERE x = 3")
    assert seg_bits(v, layout, "qtype") == [3]
    v, _ = _vec(spark, vocab, "SELECT y FROM tbl LIMIT 5")
    assert seg_bits(v, layout, "limit") == [0]
    v, _ = _vec(spark, vocab, "SELECT y FROM tbl")
    assert seg_bits(v, layout, "limit") == []


def test_having_count_segments(spark, vocab):
    v, layout = _vec(
        spark,
        vocab,
        "SELECT y, count(x) FROM tbl GROUP BY y "
        "HAVING count(x) > 2 ORDER BY y LIMIT 1",
    )
    assert seg_bits(v, layout, "count") == [0]  # tbl.x
    assert seg_bits(v, layout, "having") == [0]
    assert seg_bits(v, layout, "groupby") == [1]
    assert seg_bits(v, layout, "orderby") == [1]


def test_f6_f12(spark):
    df = spark.createDataFrame(
        [("12",), ("-3",), ("1.5",), ("x",), (None,)], "s string"
    )
    got = [
        r[0]
        for r in df.select(SE.is_integer_str(F.col("s"))).collect()
    ]
    assert got == [True, True, False, False, None]
    g = spark.createDataFrame(
        [(604800,), (86400,), (90000,), (3600,), (59,), (None,)],
        "sec long",
    )
    got = [
        r[0]
        for r in g.select(SE.granularity_to_iso_period(F.col("sec"))).collect()
    ]
    assert got == ["P7D", "P1D", "P1D", "PT1H", "PT1M", "P1D"]
