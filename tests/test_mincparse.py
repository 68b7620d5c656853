"""MINC AST front end (functions/mincparse.py) vs the regex front end
(functions/sqlencode.py): bit-identical where their semantics coincide,
and the documented depth differences asserted explicitly."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sqlfeatureextraction_spark.functions.mincparse import (
    encode_minc_ast,
    parse_minc_query,
)
from sqlfeatureextraction_spark.functions.sqlencode import (
    encode_minc,
    fit_sql_schema_vocab,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vocab(spark):
    return fit_sql_schema_vocab(
        spark,
        SF,
        bin_specs={"orders.o_custkey": 8, "orders.o_orderpriority": 3},
    )


def _vectors(spark, vocab, sqls):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(sqls)], ["i", "sql"])
    a, _ = encode_minc(df, "sql", vocab)
    b, _ = encode_minc_ast(df, "sql", vocab)
    am = {r["i"]: np.asarray(r["minc_features"]) for r in a.collect()}
    bm = {r["i"]: np.asarray(r["minc_features"]) for r in b.collect()}
    return am, bm


def test_ast_equals_regex_on_flat_queries(spark, vocab):
    """On flat (subquery-free) SQL the two front ends must agree
    bit-for-bit — same layout, same resolution, same bins."""
    sqls = [
        "SELECT o.o_orderkey, o.o_totalprice FROM orders o WHERE"
        " o.o_custkey >= 42 AND o.o_orderpriority LIKE '%high%'"
        " GROUP BY o.o_orderkey, o.o_totalprice ORDER BY o.o_totalprice"
        " LIMIT 10",
        "UPDATE orders SET o_orderstatus = 'f' WHERE o_custkey = 77",
        "DELETE FROM orders WHERE o_custkey <= 9 AND"
        " o_orderpriority = '1-urgent'",
        "SELECT c.c_name, avg(o.o_totalprice) FROM customer c JOIN"
        " orders o ON c.c_custkey = o.o_custkey GROUP BY c.c_name",
    ]
    am, bm = _vectors(spark, vocab, sqls)
    for i in range(len(sqls)):
        assert np.array_equal(am[i], bm[i]), f"query {i}"


def test_ast_beats_regex_on_comma_from_list(spark, vocab):
    """`FROM a x, b y` (the dominant multi-table syntax in the
    reference's own BusTracker corpus, enc/MinWindowQueryIntent
    .java:44-46): the regex table extractor only captures the first
    table after FROM, so the second table's bit, its alias resolution
    and the join pair are all lost; the AST path gets all of them."""
    sql = (
        "SELECT c.c_name FROM customer c, orders o"
        " WHERE c.c_custkey = o.o_custkey"
    )
    am, bm = _vectors(spark, vocab, [sql])
    lay = vocab.layout()
    tabs = lay.seg("tables")
    assert am[0][tabs.offset : tabs.offset + tabs.width].sum() == 1
    assert bm[0][tabs.offset : tabs.offset + tabs.width].sum() == 2
    jn = lay.seg("join")
    assert am[0][jn.offset : jn.offset + jn.width].sum() == 0
    assert bm[0][jn.offset : jn.offset + jn.width].sum() == 1


def test_ast_beats_regex_on_in_subquery(spark, vocab):
    """The regex layer's WHERE span swallows the IN-subquery's text, so
    its SELECTION set contains the subquery's identifiers; the AST path
    rewrites IN into a join predicate and keeps selection clean — the
    depth gap VERDICT r2 described, asserted as an actual bit
    difference."""
    sql = (
        "SELECT c.c_name FROM customer c JOIN orders o ON"
        " c.c_custkey = o.o_custkey WHERE o.o_orderkey IN"
        " (SELECT l.l_orderkey FROM lineitem l)"
    )
    am, bm = _vectors(spark, vocab, [sql])
    lay = vocab.layout()
    sel = lay.seg("selection")
    a_sel = am[0][sel.offset : sel.offset + sel.width]
    b_sel = bm[0][sel.offset : sel.offset + sel.width]
    assert a_sel.sum() > 0  # regex: subquery ids leak into selection
    assert b_sel.sum() == 0  # AST: IN became a join pair, nothing else
    jn = lay.seg("join")
    assert (
        bm[0][jn.offset : jn.offset + jn.width].sum()
        == am[0][jn.offset : jn.offset + jn.width].sum()
        == 2
    )


def test_nested_from_alias_pushdown(vocab):
    st = parse_minc_query(
        "SELECT x.c_name FROM (SELECT c_name FROM customer WHERE"
        " c_acctbal > 1) x WHERE x.c_custkey <= 5"
    )
    assert st.alias_map == {"x": "customer"}
    assert st.tables == ["customer"]
    assert "c_acctbal" in st.selection and "x.c_custkey" in st.selection


def test_exists_and_scalar_subquery_accumulate(vocab):
    st = parse_minc_query(
        "SELECT o_orderkey, (SELECT max(c_acctbal) FROM customer WHERE"
        " c_nationkey = 3) FROM orders WHERE EXISTS (SELECT l_orderkey"
        " FROM lineitem WHERE l_tax < 1)"
    )
    assert st.tables == ["orders", "customer", "lineitem"]
    assert st.aggs["max"] == {"c_acctbal"}
    assert {"c_nationkey", "l_tax"} <= st.selection
    assert ("l_tax", "<", "1") in st.sel_preds


def test_ambiguous_bare_column_parity_mode():
    """Pins BOTH resolution modes on an ambiguous bare SELECT column
    (present in two current-level tables).  Default = engine first-wins
    (one bit, the owner table); ambiguous_multi = reference addToColSet
    walk (enc/SQLParser.java:652-668): one bit per EVERY current-level
    table containing the name.  WHERE columns stay first-wins in both
    modes — the reference adds those raw with downstream owner
    resolution."""
    from sqlfeatureextraction_spark.functions.mincparse import (
        minc_state_vector,
    )
    from sqlfeatureextraction_spark.functions.sqlencode import SqlSchemaVocab

    voc = SqlSchemaVocab(
        tables=("t1", "t2"),
        columns={"t1": ("id", "val"), "t2": ("id", "name")},
        col_types={
            "t1.id": "int",
            "t1.val": "int",
            "t2.id": "int",
            "t2.name": "string",
        },
        join_pairs={},
        range_bins={},
    )
    sql = "SELECT id, name FROM t1 a, t2 b WHERE val = 3"
    lay = voc.layout()
    cb = voc.col_bit

    def seg_bits(v, seg_name):
        seg = lay.seg(seg_name)
        sv = v[seg.offset : seg.offset + seg.width]
        return {fc for fc, b in cb.items() if sv[b] == 1.0}

    v_default = minc_state_vector(parse_minc_query(sql), voc)
    v_parity = minc_state_vector(
        parse_minc_query(sql, vocab=voc, ambiguous_multi=True), voc
    )
    # first-wins: ambiguous 'id' resolves to its owner t1 only
    assert seg_bits(v_default, "projection") == {"t1.id", "t2.name"}
    # reference walk: 'id' sets a bit per containing current-level table
    assert seg_bits(v_parity, "projection") == {"t1.id", "t2.id", "t2.name"}
    for v in (v_default, v_parity):
        assert seg_bits(v, "selection") == {"t1.val"}


def test_ambiguous_multi_requires_vocab():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vocab"):
        parse_minc_query("SELECT 1", ambiguous_multi=True)


def test_in_list_expansion(vocab):
    st = parse_minc_query(
        "SELECT o_orderkey FROM orders WHERE o_orderpriority IN"
        " ('1-a', '2-b') AND o_custkey NOT IN (4, 5)"
    )
    preds = set(st.sel_preds)
    assert ("o_orderpriority", "=", "1-a") in preds
    assert ("o_orderpriority", "=", "2-b") in preds
    assert ("o_custkey", "<>", "4") in preds
    assert ("o_custkey", "<>", "5") in preds
