"""SURVEY §4.1's Regularization→Catalyst mapping, demonstrated.

The reference normalizes queries with a hand-written rewrite package
(sql/Regularization/, ~4k LoC) before feature extraction.  SURVEY
§4.1 maps each rewriter onto a built-in Catalyst optimizer rule
instead of porting it; these tests RUN the reference classes'
documented example shapes through Catalyst and assert the optimized
logical plan exhibits the claimed simplification:

  * TautologyRegularizer (reg/TautologyRegularizer.java:48-53 class
    doc: "detects and removes all tautologies and contradictions and
    shrink boolean expressions accordingly") →
    ConstantFolding + BooleanSimplification + PruneFilters;
  * UNIONPULLer (reg/UNIONPULLer.java:28-32 class doc: "pull out all
    UNION operations hidden in nested sub-queries e.g.
    SELECT * FROM (A UNION B)") → CombineUnions;
  * ExpressionRegularizer's IN→OR-of-equalities and constant
    elimination (reg/ExpressionRegularizer.java:1-12) →
    OptimizeIn + ConstantFolding.

Plans are inspected AFTER optimization (queryExecution.optimizedPlan),
over a parquet-backed table so ConvertToLocalRelation cannot
trivially collapse the whole query.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ev(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df.createOrReplaceTempView("reg_events")
    return df


def _opt(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_tautology_conjunct_removed(spark, ev):
    """WHERE value > 0 AND 1 = 1 — the tautological conjunct must not
    survive optimization (TautologyRegularizer's tautology case)."""
    p = _opt(
        spark.sql(
            "SELECT event_id FROM reg_events WHERE value > 0 AND 1 = 1"
        )
    )
    assert "1 = 1" not in p and "= 1)" not in p
    assert "value" in p  # the real predicate remains


def test_contradiction_prunes_to_empty(spark, ev):
    """WHERE value > 0 AND 1 > 2 — a contradiction eliminates the
    whole subtree (TautologyRegularizer's contradiction case):
    PruneFilters replaces scan+filter with an empty LocalRelation."""
    p = _opt(
        spark.sql(
            "SELECT event_id FROM reg_events WHERE value > 0 AND 1 > 2"
        )
    )
    assert "LocalRelation <empty>" in p
    assert "Relation" in p and "parquet" not in p.lower()


def test_or_tautology_drops_filter(spark, ev):
    """WHERE value > 0 OR 1 = 1 — an OR-tautology absorbs the whole
    filter; the optimized plan must have no Filter at all."""
    p = _opt(
        spark.sql(
            "SELECT event_id FROM reg_events WHERE value > 0 OR 1 = 1"
        )
    )
    assert "Filter" not in p


def test_nested_unions_flatten(spark, ev):
    """(A UNION ALL B) UNION ALL C and SELECT * FROM (A UNION ALL B)
    — CombineUnions flattens every nested/pulled-up union into ONE
    Union node (UNIONPULLer's pull-up), regardless of subquery
    nesting."""
    q = """
        SELECT * FROM (
          SELECT event_id FROM reg_events WHERE event_id % 3 = 0
          UNION ALL
          SELECT event_id FROM reg_events WHERE event_id % 3 = 1
        ) u
        UNION ALL
        SELECT event_id FROM reg_events WHERE event_id % 3 = 2
    """
    p = _opt(spark.sql(q))
    assert p.count("Union") == 1  # one flattened node, not a tree
    assert p.count("Relation") == 3  # all three branches beneath it


def test_union_pullup_from_subquery_with_outer_filter(spark, ev):
    """SELECT * FROM (A UNION ALL B) WHERE pred — the outer predicate
    pushes THROUGH the pulled-up union into both branches
    (PushProjectionThroughUnion + filter pushdown), which is the
    plan-level payoff UNIONPULLer's normalization exists to enable."""
    q = """
        SELECT * FROM (
          SELECT event_id, value FROM reg_events WHERE event_id % 2 = 0
          UNION ALL
          SELECT event_id, value FROM reg_events WHERE event_id % 2 = 1
        ) u WHERE value > 10
    """
    p = _opt(spark.sql(q))
    assert p.count("Union") == 1
    # the value predicate appears in BOTH branches, below the union
    assert p.count("value") >= 2
    union_pos = p.index("Union")
    assert "value" in p[union_pos:]


def test_singleton_in_becomes_equality(spark, ev):
    """x IN (5) — OptimizeIn rewrites a singleton IN-list to an
    equality (ExpressionRegularizer's IN→OR-of-equalities, collapsed
    further by Catalyst)."""
    p = _opt(
        spark.sql(
            "SELECT event_id FROM reg_events WHERE event_id IN (5)"
        )
    )
    assert " IN " not in p
    assert "= 5" in p


def test_constant_arithmetic_folds(spark, ev):
    """x > 1 + 2 + 3 — ConstantFolding evaluates literal arithmetic
    before execution (ExpressionRegularizer's constant elimination)."""
    p = _opt(
        spark.sql(
            "SELECT event_id FROM reg_events WHERE event_id > 1 + 2 + 3"
        )
    )
    assert "1 + 2" not in p
    assert "> 6" in p
