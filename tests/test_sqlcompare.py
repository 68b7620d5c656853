"""Where-clause diff + date rewrite + GLOBAL-join rewrite pins.

Pinned on the reference's own test queries:
test/sql/clickhouse/visitor/TestComparator.java:12-47 (the cached/
current dashboard pair) and TestRewriter.java:13-45 (the three join
rewrite cases).  Expected values are what the Java visitors produce
on those inputs (WhereClauseComparator.java:24-199,
RewrittenDateSqlBuilder.java:14-27, GlobalJoinAstRewriter.java:11-32).
"""

from sqlfeatureextraction_spark.functions.sqlcompare import (
    ComparedResult,
    compare_where_clauses,
    rewrite_cached_date_sql,
    rewrite_global_joins,
)

# TestComparator.java:13-22 — the query whose results sit in cache
CACHED_SQL = """SELECT toStartOfDay(toDateTime(date)) AS __timestamp,
       count(DISTINCT id) AS id_count
FROM my_db.my_table
WHERE ftime >= toDate('2021-10-02')
  AND ftime <= toDate('2021-11-02')
  AND feature1 = 1
  AND feature2 = 8
GROUP BY toStartOfDay(toDateTime(date))
ORDER BY id_count DESC
LIMIT 50000"""

# TestComparator.java:24-33 — the incoming query, shifted by one day
CURRENT_SQL = CACHED_SQL.replace("2021-10-02", "2021-10-03").replace(
    "2021-11-02", "2021-11-03"
)


def test_reference_pair_diff():
    """The TestComparator pair: same structure, dates one day apart —
    not identical, but every difference is a date literal, with the
    per-side bounds the Java comparator accumulates."""
    cr = compare_where_clauses(CURRENT_SQL, CACHED_SQL)
    assert cr.totally_the_same is False
    assert cr.only_date_different is True
    assert cr.date_range_extendable is True
    assert cr.first_value_lower_bound == "2021-10-03"
    assert cr.first_value_upper_bound == "2021-11-03"
    assert cr.second_value_lower_bound == "2021-10-02"
    assert cr.second_value_upper_bound == "2021-11-02"


def test_reference_pair_rewrite():
    """RewrittenDateSqlBuilder on the pair: the cached query's range
    becomes [cached_hi, current_hi] — the increment the cache lacks
    (cached lower -> cached upper, cached upper -> current upper,
    both in one pass so the swapped value is never re-examined)."""
    cr = compare_where_clauses(CURRENT_SQL, CACHED_SQL)
    out = rewrite_cached_date_sql(CACHED_SQL, cr)
    assert "toDate('2021-11-02')" in out
    assert "toDate('2021-11-03')" in out
    assert "2021-10-02" not in out
    # everything outside the two date literals is byte-identical
    assert out == CACHED_SQL.replace("2021-10-02", "2021-11-02").replace(
        "2021-11-02')\n  AND ftime <= toDate('2021-11-02",
        "2021-11-02')\n  AND ftime <= toDate('2021-11-03",
    )


def test_identical_queries():
    cr = compare_where_clauses(CACHED_SQL, CACHED_SQL)
    assert cr.totally_the_same is True
    assert cr.only_date_different is True
    assert cr.date_range_extendable is False
    # rewrite is a no-op when nothing differs
    assert rewrite_cached_date_sql(CACHED_SQL, cr) == CACHED_SQL


def test_non_date_difference_poisons_only_date():
    cur = CURRENT_SQL.replace("feature1 = 1", "feature1 = 2")
    cr = compare_where_clauses(cur, CACHED_SQL)
    assert cr.totally_the_same is False
    assert cr.only_date_different is False
    assert cr.date_range_extendable is False
    assert rewrite_cached_date_sql(CACHED_SQL, cr) == CACHED_SQL


def test_structural_difference_poisons_only_date():
    cur = CURRENT_SQL.replace("feature1 = 1", "feature9 = 1")
    cr = compare_where_clauses(cur, CACHED_SQL)
    assert cr.totally_the_same is False
    assert cr.only_date_different is False


def test_no_where_both_sides():
    cr = compare_where_clauses(
        "SELECT * FROM t", "SELECT * FROM t"
    )
    assert cr.totally_the_same is True


def test_where_on_one_side_only():
    cr = compare_where_clauses(
        "SELECT * FROM t WHERE a = 1", "SELECT * FROM t"
    )
    assert cr.totally_the_same is False
    assert cr.only_date_different is False


def test_rewrite_noop_without_extendability():
    assert (
        rewrite_cached_date_sql(CACHED_SQL, ComparedResult())
        == CACHED_SQL
    )


# ------------------------------------------------- GLOBAL join rewrite

# TestRewriter.java:16
REWRITER_SQL_1 = (
    "SELECT t1.id, count(1) as total_count FROM my_db1.table1 t1 "
    "LEFT JOIN my_db2.table2 t2 ON t1.id = t2.id GROUP BY t1.id"
)


def test_global_join_added_and_flagged():
    out, missing = rewrite_global_joins(REWRITER_SQL_1)
    assert "GLOBAL LEFT JOIN my_db2.table2" in out
    assert missing is True
    # only the join operator changed
    assert out == REWRITER_SQL_1.replace(
        "LEFT JOIN", "GLOBAL LEFT JOIN"
    )


def test_global_join_idempotent():
    once, _ = rewrite_global_joins(REWRITER_SQL_1)
    twice, missing = rewrite_global_joins(once)
    assert twice == once
    assert missing is False  # already GLOBAL everywhere


def test_global_in_predicate_untouched():
    # TestRewriter.java:29/39 — GLOBAL IN is not a join operator
    sql = "SELECT * FROM t WHERE uid global in (SELECT uid FROM t2)"
    out, missing = rewrite_global_joins(sql)
    assert out == sql
    assert missing is False


def test_inner_and_right_joins():
    sql = "SELECT * FROM a INNER JOIN b ON a.x = b.x RIGHT JOIN c ON b.y = c.y"
    out, missing = rewrite_global_joins(sql)
    assert "GLOBAL INNER JOIN b" in out and "GLOBAL RIGHT JOIN c" in out
    assert missing is True


def test_left_outer_join_normalizes():
    out, missing = rewrite_global_joins("SELECT * FROM a LEFT OUTER JOIN b ON a.x = b.x")
    assert "GLOBAL LEFT JOIN b" in out
    assert missing is True


def test_join_inside_string_literal_untouched():
    sql = "SELECT 'a left join b' AS s FROM t INNER JOIN u ON t.x = u.x"
    out, _ = rewrite_global_joins(sql)
    assert "'a left join b'" in out
    assert "GLOBAL INNER JOIN u" in out


def test_where_diff_udf_roundtrip(spark):
    from sqlfeatureextraction_spark.functions.sqlcompare import (
        global_join_rewrite_udf,
        where_diff_udf,
    )

    df = spark.createDataFrame(
        [(CURRENT_SQL, CACHED_SQL), (CACHED_SQL, CACHED_SQL)],
        "current string, cached string",
    )
    r = (
        df.select(where_diff_udf()("current", "cached").alias("d"))
        .select("d.*")
        .collect()
    )
    assert r[0].date_range_extendable is True
    assert "2021-11-03" in r[0].rewritten_sql
    assert r[1].totally_the_same is True and r[1].rewritten_sql is None

    g = (
        spark.createDataFrame([(REWRITER_SQL_1,)], "sql string")
        .select(global_join_rewrite_udf()("sql").alias("g"))
        .select("g.*")
        .collect()[0]
    )
    assert g.without_global_keyword is True
    assert "GLOBAL LEFT JOIN" in g.rewritten
