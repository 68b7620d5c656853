"""MINC AST parser over the reference's OWN regression queries.

The query texts below are assembled verbatim from the string literals
in enc/MinWindowQueryIntent.java (main query :44-46, queryBatchs
:63-96, trailing simple query :95) — the BusTracker workload the
reference's MINC encoder was built for.  No encoded golden vectors
exist for them in the reference repo (the BusTracker vocabulary files
are not published), so the assertions pin STRUCTURAL extraction facts
hand-derived from the verified walk semantics: tables with aliases
from comma FROM lists and LEFT/RIGHT JOIN chains, join predicates from
ON conjuncts and column=column WHERE conjuncts, selection predicates
with constants, BETWEEN/arithmetic handling, IN-list expansion,
FROM-subquery recursion, and tolerance of the corpus's own
``...LIMIT 1`` / ``1ORDER BY`` concatenation typo (:71 — JSQLParser
would reject it; best-effort extraction still recovers the clauses).
"""

from sqlfeatureextraction_spark.functions.mincparse import parse_minc_query

Q_MAIN = (
    "SELECT distinct a.agency_id FROM m_agency a, m_calendar c, m_trip t"
    " WHERE c.agency_id = a.agency_id AND t.agency_id = a.agency_id AND"
    " a.avl_agency_name =  '8\\b8164b0b579a1a3cde19a106c8e1fca8' AND"
    " t.trip_id =  '33\\94f574661cc4d7d3c40a333a0509fd4f' AND"
    " c.start_date <= 1480475749583 AND c.end_date+1 >= 1480475749583"
)

Q_STOP = (
    "SELECT s.stop_id AS stop_id, s.stop_name, s.stop_lat, s.stop_lon,"
    " ceiling((h_distance(0.0,0.0,s.stop_lat,s.stop_lon)/1.29)/60)"
    " AS walk_time  FROM m_stop s  WHERE s.stop_lat BETWEEN (1-2) AND"
    " (3+4)  AND s.agency_id = 5  AND s.stop_lon BETWEEN (6-7) AND"
    " (8+9)  ORDER BY (((s.stop_lat-(10))+(s.stop_lon-(11))))"
)

Q_MESSAGES = (
    "SELECT id, message_title, message, destination_screen, stamp FROM"
    " m_messages WHERE (device = 1 OR device IS NULL) AND (agency_id ="
    " 2 OR agency_id IS NULL) AND (device_id = 3 OR device_id IS NULL)"
    " AND (app_version = 4 OR app_version IS NULL) AND (NOW() >="
    " start_date OR start_date IS NULL) AND (NOW() < end_date OR"
    " end_date IS NULL) AND (trigger_cond = 5 OR trigger_cond IS NULL)"
    " AND (SELECT COUNT(*) FROM m_popup_user_log WHERE device_id = 6"
    " AND date_trunc( '3\\1533bfb25649bd25dd740b47c19b84e4', stamp) ="
    " 3) < 1ORDER BY num_conditions DESC LIMIT 1"
)

Q_NOTES = (
    "select nm.trip_id,nm.id AS message_id, nm.message, nm.timestamp,"
    " nm.category,a.firstname AS first_name, a.lastname AS last_name"
    " from dv_notes_message nm, dv_account a, (SELECT dvNotes.trip_id,"
    " MAX(dvNotes.timestamp) AS maximum FROM dv_notes_message dvNotes"
    " WHERE dvNotes.agency_id IN (select c.agency_id from m_agency c,"
    " m_agency d where c.agency_id_id=d.agency_id_id and d.agency_id=1)"
    " AND dvNotes.trip_id IN ( '35\\89ad84e1a460f2041220847c65206b20',"
    " '33\\9a6cce223e3aa56cfc2128721095071b') AND dvNotes.category="
    " '4\\2da45b72d28efeb9a3954206d2ae2fa6' GROUP BY dvNotes.trip_id)"
    " as nmmax WHERE nm.deleted IS NULL AND a.id=nm.user_id AND"
    " nm.trip_id= nmmax.trip_id AND nm.timestamp = nmmax.maximum AND"
    " nm.agency_id IN (select c.agency_id from m_agency c, m_agency d"
    " where c.agency_id_id=d.agency_id_id and d.agency_id=2)"
)

Q_JOINCHAIN = (
    "select st.trip_id, st.stop_sequence, st.estimate_source,"
    " st.fullness, st.departure_time_hour, st.departure_time_minute,"
    " s.stop_lat, s.stop_lon, t.direction_id, t.route_id,"
    " route.route_short_name from m_stop AS s RIGHT JOIN m_stop_time AS"
    " st  ON st.agency_id = s.agency_id AND st.stop_id = s.stop_id LEFT"
    " JOIN m_trip AS t ON t.agency_id = st.agency_id AND t.trip_id ="
    " st.trip_id LEFT JOIN m_route AS route ON t.agency_id ="
    " route.agency_id AND t.route_id = route.route_id WHERE"
    " st.estimate_source in ( '10\\2d9d369aa6dcb27617fe409b5cac85ca',"
    " '14\\dbcdf91e0b5531167767adab3b850514') AND st.agency_id = 1"
    " order by st.stop_sequence"
)

Q_SIMPLE = "SELECT a.agency_timezone FROM m_agency a WHERE a.agency_id = 80"


def test_main_query_comma_from_and_join_preds():
    st = parse_minc_query(Q_MAIN)
    assert st.tables == ["m_agency", "m_calendar", "m_trip"]
    assert st.alias_map == {
        "a": "m_agency", "c": "m_calendar", "t": "m_trip"
    }
    assert st.projection == {"a.agency_id"}
    assert ("c.agency_id", "a.agency_id") in st.join_pairs
    assert ("t.agency_id", "a.agency_id") in st.join_pairs
    preds = {(c, o) for c, o, _ in st.sel_preds}
    assert ("a.avl_agency_name", "=") in preds
    assert ("t.trip_id", "=") in preds
    assert ("c.start_date", "<=") in preds
    # c.end_date+1 >= const: arithmetic left side → selection column,
    # NO op/const capture (processSelectWithConstants recursion)
    assert "c.end_date" in st.selection
    assert ("c.end_date", ">=") not in preds


def test_stop_query_between_arithmetic():
    st = parse_minc_query(Q_STOP)
    assert st.tables == ["m_stop"]
    # BETWEEN yields its left column only, no op/const
    assert {"s.stop_lat", "s.stop_lon"} <= st.selection
    assert ("s.agency_id", "=", "5") in st.sel_preds
    # function args reach projection; ORDER BY arithmetic decomposes
    assert {"s.stop_lat", "s.stop_lon", "s.stop_id"} <= st.projection
    assert {"s.stop_lat", "s.stop_lon"} <= st.orderby


def test_messages_query_scalar_subquery_and_typo():
    st = parse_minc_query(Q_MESSAGES)
    assert st.tables == ["m_messages", "m_popup_user_log"]
    # the scalar subquery's fragments accumulate
    assert ("device_id", "=", "6") in st.sel_preds
    # IS NULL branches map to (=, null)
    assert ("device", "=", "null") in st.sel_preds
    # the reference corpus's '1ORDER BY' typo: the clause is still
    # recovered (best-effort), as is LIMIT
    assert "num_conditions" in st.orderby
    assert st.limit


def test_notes_query_nested_from_subquery():
    st = parse_minc_query(Q_NOTES)
    assert st.tables[:3] == ["dv_notes_message", "dv_account", "m_agency"]
    # FROM-subquery alias pushdown: nmmax → first inner table
    assert st.alias_map["nmmax"] == "dv_notes_message"
    assert ("a.id", "nm.user_id") in st.join_pairs
    assert ("nm.trip_id", "nmmax.trip_id") in st.join_pairs
    # IN-subquery inside the FROM-subselect: rewritten join pred; the
    # projection item is already alias-qualified (c → m_agency), so the
    # qualifier is kept and resolves through the alias map
    assert ("dvnotes.agency_id", "c.agency_id") in st.join_pairs
    assert st.alias_map["c"] == "m_agency"
    # IN-list expands per constant
    consts = {
        c for col, o, c in st.sel_preds if col == "dvnotes.trip_id"
    }
    assert len(consts) == 2
    assert st.aggs["max"] == {"dvnotes.timestamp"}
    assert "dvnotes.trip_id" in st.groupby


def test_joinchain_query():
    st = parse_minc_query(Q_JOINCHAIN)
    assert st.tables == ["m_stop", "m_stop_time", "m_trip", "m_route"]
    assert st.alias_map["route"] == "m_route"
    assert ("st.agency_id", "s.agency_id") in st.join_pairs
    assert ("t.trip_id", "st.trip_id") in st.join_pairs
    assert ("t.route_id", "route.route_id") in st.join_pairs
    assert ("st.agency_id", "=", "1") in st.sel_preds
    ops = {
        (c, o) for c, o, _ in st.sel_preds if c == "st.estimate_source"
    }
    assert ops == {("st.estimate_source", "=")}
    assert "st.stop_sequence" in st.orderby


def test_simple_query():
    st = parse_minc_query(Q_SIMPLE)
    assert st.tables == ["m_agency"]
    assert st.projection == {"a.agency_timezone"}
    assert ("a.agency_id", "=", "80") in st.sel_preds


def test_with_items_accumulate():
    """createQueryVector walks every WithItem's select body BEFORE the
    main body (enc/SQLParser.java:892-897): CTE fragments accumulate
    into the same sets; the CTE name gets NO alias registration, so the
    main body's ``FROM cte_name`` consumes 'recent' as an opaque
    table."""
    from sqlfeatureextraction_spark.functions.sqlencode import QUERY_TYPES

    sql = (
        "WITH recent AS (SELECT a.agency_id FROM m_agency a WHERE"
        " a.agency_id = 7), top_trips (tid) AS (SELECT t.trip_id FROM"
        " m_trip t WHERE t.agency_id = 9 ORDER BY t.trip_id LIMIT 5)"
        " SELECT r.agency_id FROM recent r WHERE r.agency_id = 80"
    )
    st = parse_minc_query(sql)
    # JSQLParser parses WITH-SELECT as a Select statement
    assert st.qtype == QUERY_TYPES.index("select")
    # WithItem bodies first (declaration order), then the main FROM item
    assert st.tables == ["m_agency", "m_trip", "recent"]
    assert ("a.agency_id", "=", "7") in st.sel_preds
    assert ("t.agency_id", "=", "9") in st.sel_preds
    assert "t.trip_id" in st.orderby
    assert st.limit  # the CTE body's LIMIT sets the shared flag
    assert {"a.agency_id", "t.trip_id", "r.agency_id"} <= st.projection
    # main body runs after: its alias registers against the CTE NAME
    # (not the inner table — the reference never maps CTE names)
    assert st.alias_map.get("r") == "recent"
    assert "recent" not in {st.alias_map.get("recent")} - {None}
    assert ("r.agency_id", "=", "80") in st.sel_preds


def test_with_union_cte_body():
    """A UNION inside a CTE body accumulates every branch
    (executeSelect :877-886 under the WithItem walk)."""
    sql = (
        "WITH u AS (SELECT a.agency_id FROM m_agency a UNION SELECT"
        " t.trip_id FROM m_trip t) SELECT x.agency_id FROM u x"
    )
    st = parse_minc_query(sql)
    assert st.tables == ["m_agency", "m_trip", "u"]
    assert {"a.agency_id", "t.trip_id"} <= st.projection


def test_with_nonselect_main_is_gated():
    """WITH + non-select main: JSQLParser rejects it; the swallowed
    parse failure leaves an empty state."""
    st = parse_minc_query("WITH x AS (SELECT 1) DELETE FROM m_agency")
    assert st.qtype == -1
    assert st.tables == []
