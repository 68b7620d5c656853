"""Property-based tests (hypothesis) for the two pure-Python SQL
front ends: the ClickHouse-walk parser (functions/apmencode.parse_ch_query,
reference ch/ClickhouseSQLParser.java) and the JSQLParser-walk parser
(functions/mincparse.parse_minc_query, reference enc/SQLParser.java).

Three layers:

  1. constructive oracle — a grammar generator builds a random SELECT
     together with its expected fragment state; both parsers must
     extract exactly that state.  This is differential testing with a
     known ground truth, hundreds of random cases per run.
  2. pinned intentional divergences — the reference's two stacks do NOT
     agree on WITH bodies (CH grammar parses-but-never-reads the
     withClause, ch/ClickhouseSQLParser.java:86-133; JSQLParser walks
     every WithItem, enc/SQLParser.java:892-897) or on the equals-skip
     quirk (extractedColumnExpr returns on "equals" nodes,
     ch/ClickhouseSQLParser.java:141-238).  Those divergences are
     asserted, not papered over.
  3. totality/determinism fuzz — both parsers are best-effort
     (reference swallows parse failures): arbitrary text must never
     raise and must parse identically twice.  This is the property that
     matters at 10^12 rows: one uncaught exception inside the Arrow
     batch kills the Spark task.

No SparkSession anywhere here — the parsers are the per-row payload
that runs INSIDE Arrow batches; their properties are testable at
Python speed.
"""

from __future__ import annotations

from dataclasses import asdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sqlfeatureextraction_spark.functions.apmencode import parse_ch_query
from sqlfeatureextraction_spark.functions.mincparse import parse_minc_query

COLS = ["c_a", "c_b", "c_c", "c_d", "c_e"]
TABLES = ["t_users", "t_orders", "t_items"]
AGGS = ["sum", "max", "min", "avg"]
# '=' deliberately separate: the CH walk skips equals nodes entirely
NONEQ_OPS = [">", "<", ">=", "<="]

SETTINGS = settings(
    max_examples=150,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _kw(draw, word: str) -> str:
    """Randomly case a keyword (the cleaners lowercase everything)."""
    if draw(st.booleans()):
        return word.upper()
    return word


@st.composite
def simple_select(draw):
    """A SELECT from the shared grammar subset + its expected state."""
    tab = draw(st.sampled_from(TABLES))
    qualified = draw(st.booleans())
    proj_cols = draw(
        st.lists(st.sampled_from(COLS), min_size=1, max_size=4, unique=True)
    )
    agg_items = draw(
        st.lists(
            st.tuples(st.sampled_from(AGGS), st.sampled_from(COLS)),
            max_size=3,
            unique=True,
        )
    )
    preds = draw(
        st.lists(
            st.tuples(
                st.sampled_from(COLS),
                st.sampled_from(NONEQ_OPS),
                st.integers(0, 99),
            ),
            max_size=3,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    gb = draw(st.lists(st.sampled_from(COLS), max_size=2, unique=True))
    ob = draw(
        st.lists(
            st.tuples(
                st.sampled_from(COLS), st.sampled_from(["", " asc", " desc"])
            ),
            max_size=2,
            unique_by=lambda t: t[0],
        )
    )
    limit = draw(st.one_of(st.none(), st.integers(1, 999)))

    items = list(proj_cols) + [f"{a}({c})" for a, c in agg_items]
    sql = f"{_kw(draw, 'select')} {', '.join(items)} "
    sql += f"{_kw(draw, 'from')} {'db.' if qualified else ''}{tab}"
    if preds:
        conj = f" {_kw(draw, 'and')} ".join(
            f"{c} {op} {v}" for c, op, v in preds
        )
        sql += f" {_kw(draw, 'where')} {conj}"
    if gb:
        sql += f" {_kw(draw, 'group')} {_kw(draw, 'by')} {', '.join(gb)}"
    if ob:
        sql += (
            f" {_kw(draw, 'order')} {_kw(draw, 'by')} "
            + ", ".join(f"{c}{sfx}" for c, sfx in ob)
        )
    if limit is not None:
        sql += f" {_kw(draw, 'limit')} {limit}"

    expected = {
        "tables": [tab],
        "projection": set(proj_cols) | {c for _, c in agg_items},
        "where": {c for c, _, _ in preds},
        "groupby": set(gb),
        "orderby": {c for c, _ in ob},
        "aggs": {
            a: {c for aa, c in agg_items if aa == a} for a in AGGS
        },
        "sel_preds": sorted((c, op, str(v)) for c, op, v in preds),
        "limit": limit is not None,
    }
    return sql, expected


@given(simple_select())
@SETTINGS
def test_constructive_oracle_both_front_ends(case):
    sql, exp = case
    ch = parse_ch_query(sql)
    assert ch.ok
    assert ch.tables == exp["tables"]
    assert ch.projection == exp["projection"]
    assert ch.where == exp["where"]
    assert ch.groupby == exp["groupby"]
    assert ch.orderby == exp["orderby"]
    assert {a: ch.aggs[a] for a in AGGS} == exp["aggs"]
    assert sorted(ch.sel_preds) == exp["sel_preds"]

    mc = parse_minc_query(sql)
    assert mc.qtype == 0
    assert mc.tables == exp["tables"]
    assert mc.projection == exp["projection"]
    assert mc.selection == exp["where"]
    assert mc.groupby == exp["groupby"]
    assert mc.orderby == exp["orderby"]
    assert {a: mc.aggs[a] for a in AGGS} == exp["aggs"]
    assert sorted(mc.sel_preds) == exp["sel_preds"]
    assert mc.limit is exp["limit"]


@given(
    st.lists(simple_select(), min_size=2, max_size=3),
    st.sampled_from([" union ", " union all ", " UNION ALL "]),
)
@SETTINGS
def test_union_accumulates_across_branches(cases, glue):
    """D8: every UNION branch accumulates into one state (reference
    flattens SelectUnionQuery, ch/ClickhouseSQLParser.java:79-84 /
    enc/SQLParser.java per-PlainSelect walk).  LIMIT lives on the last
    branch only so the text stays well-formed."""
    # strip limit/order from all but the last branch (union syntax)
    texts = []
    for i, (sql, _) in enumerate(cases):
        low = sql.lower()
        if i < len(cases) - 1:
            for kw in (" limit ", " order "):
                at = low.find(kw)
                if at >= 0:
                    sql, low = sql[:at], low[:at]
        texts.append(sql)
    sql = glue.join(texts)

    exp_tables = list(
        dict.fromkeys(t for _, e in cases for t in e["tables"])
    )
    exp_proj = set().union(*(e["projection"] for _, e in cases))
    for parser in (parse_ch_query, parse_minc_query):
        got = parser(sql)
        assert got.tables == exp_tables
        assert got.projection == exp_proj


@given(simple_select(), st.lists(simple_select(), min_size=1, max_size=2))
@SETTINGS
def test_with_bodies_pinned_divergence(main_case, cte_cases):
    """The documented front-end divergence on WITH: the CH grammar
    never reads the withClause (bodies contribute NOTHING), while the
    JSQLParser walk accumulates every WithItem body BEFORE the main
    statement (enc/SQLParser.java:892-897)."""
    main_sql, _ = main_case
    ctes = ", ".join(
        f"cte_{i} as ({sql})" for i, (sql, _) in enumerate(cte_cases)
    )
    sql = f"with {ctes} {main_sql}"

    ch_with, ch_main = parse_ch_query(sql), parse_ch_query(main_sql)
    assert ch_with.tables == ch_main.tables
    assert ch_with.projection == ch_main.projection
    assert ch_with.where == ch_main.where

    mc = parse_minc_query(sql)
    exp_tables = list(
        dict.fromkeys(
            [t for _, e in cte_cases for t in e["tables"]]
            + parse_minc_query(main_sql).tables
        )
    )
    assert mc.tables == exp_tables
    exp_proj = set().union(
        *(e["projection"] for _, e in cte_cases)
    ) | parse_minc_query(main_sql).projection
    assert mc.projection == exp_proj


@given(st.sampled_from(COLS), st.integers(0, 99))
@SETTINGS
def test_equals_skip_pinned_divergence(col, val):
    """CH extractedColumnExpr returns on equals nodes (the column never
    reaches the where set); the JSQLParser walk keeps it as a selection
    column.  Both capture the (col, '=', const) sel-pred."""
    sql = f"select c_a from t_users where {col} = {val}"
    ch, mc = parse_ch_query(sql), parse_minc_query(sql)
    assert ch.where == set()
    assert mc.selection == {col}
    assert ch.sel_preds == [(col, "=", str(val))]
    assert mc.sel_preds == [(col, "=", str(val))]


def _state_key(obj):
    d = asdict(obj)
    d.pop("multi_resolver", None)
    return repr(sorted((k, repr(v)) for k, v in d.items()))


@given(st.text(max_size=200))
@SETTINGS
def test_fuzz_total_and_deterministic(text):
    """Arbitrary text: never raises (the Arrow-batch survival property)
    and parses identically twice."""
    a, b = parse_ch_query(text), parse_ch_query(text)
    assert _state_key(a) == _state_key(b)
    m, n = parse_minc_query(text), parse_minc_query(text)
    assert _state_key(m) == _state_key(n)


def _tiny_vocab():
    from sqlfeatureextraction_spark.functions.sqlencode import SqlSchemaVocab

    return SqlSchemaVocab(
        tables=("t_items", "t_orders", "t_users"),
        columns={
            "t_items": ("c_c", "c_d"),
            "t_orders": ("c_b", "c_c"),
            "t_users": ("c_a", "c_b"),
        },
        col_types={},
        join_pairs={},
        range_bins={},
    )


@given(simple_select())
@SETTINGS
def test_minc_bit_scatter_constructive_oracle(case):
    """Bit-level constructive oracle: scatter the parsed state through
    minc_state_vector and compare against a vector built directly from
    the generated query parts — independently exercising owner
    resolution (single-FROM fast path), the per-segment col_bit
    placement, the limit bit and the (col, op) sel-pred grid.  Columns
    absent from the FROM table's schema must leave their bits unset
    (the reference swallows lookup misses,
    enc/APMFragmentIntent.java:303-305)."""
    import numpy as np

    from sqlfeatureextraction_spark.functions.mincparse import (
        minc_state_vector,
    )
    from sqlfeatureextraction_spark.functions.sqlfragments import (
        SEL_PRED_OPS,
    )

    sql, exp = case
    vocab = _tiny_vocab()
    layout = vocab.layout()
    tab = exp["tables"][0]
    cols = set(vocab.columns[tab])
    col_bit = vocab.col_bit

    expected = np.zeros(layout.width)
    expected[layout.seg("qtype").offset] = 1.0  # select
    expected[layout.seg("tables").offset + vocab.tables.index(tab)] = 1.0

    def put(names, seg):
        off = layout.seg(seg).offset
        for n in names:
            if n in cols:
                expected[off + col_bit[f"{tab}.{n}"]] = 1.0

    put(exp["projection"], "projection")
    for agg in ("avg", "min", "max", "sum"):
        put(exp["aggs"][agg], agg)
    put(exp["where"], "selection")
    put(exp["groupby"], "groupby")
    put(exp["orderby"], "orderby")
    if exp["limit"]:
        expected[layout.seg("limit").offset] = 1.0
    ops_off = layout.seg("selops").offset
    for col, op, const in exp["sel_preds"]:
        if col in cols:
            b = col_bit[f"{tab}.{col}"]
            expected[
                ops_off + b * len(SEL_PRED_OPS) + SEL_PRED_OPS.index(op)
            ] = 1.0

    got = minc_state_vector(parse_minc_query(sql), vocab)
    assert np.array_equal(got, expected)


@given(
    st.lists(
        st.sampled_from(
            list("()*,.=<>!'\"`%+-/;")
            + ["select", "from", "where", "with", "as", "in",
               "union", "join", "on", "group by", "order by",
               "between", "and", "or", "not", "exists",
               "limit", "count", "sum(", "t_users", "c_a", "7", " "]
        ),
        max_size=40,
    ).map(" ".join)
)
@SETTINGS
def test_fuzz_sql_shaped_total(text):
    """SQL-keyword-dense fuzz: maximizes parser code-path coverage while
    staying total — these strings reach the clause splitters and the
    recursive descent, unlike uniform-random text."""
    parse_ch_query(text)
    parse_minc_query(text)
