"""Forbidden-node audit of the COMMITTED plan dump (plans_dump.txt).

test_plans.py pins live plan shapes at fixture scale; this file
additionally audits the checked-in, normalized dump that
scripts/dump_plans.py regenerates each round — so a plan-shape
regression (a reintroduced cartesian product, a global single-task
window) is visible both as a red test AND as a reviewable diff of the
committed artifact.
"""

import os
import re

import pytest

DUMP = os.path.join(os.path.dirname(os.path.dirname(__file__)), "plans_dump.txt")

# the one declared exact all-pairs baseline (its LSH variant is the
# corpus-scale path) — same contract as test_plans.DECLARED_ALL_PAIRS
DECLARED_ALL_PAIRS = {"embedding_neardup"}

# sections where a BroadcastNestedLoopJoin is a broadcast-of-a-scalar
# cross join (a 1-row total/threshold frame joined onto every row —
# build side bounded by construction, never data-sized)
SCALAR_BROADCAST_CROSS = {
    "vocab_coverage",
    "pmi_collocations",
    "kl_drift",
    "llr_keywords",
    "benford",
    "weighted_quantiles",
    "ks_test",
    "ann_topk",
    "hybrid_rrf",
    "apm_window_backfill",
}


@pytest.fixture(scope="module")
def sections():
    assert os.path.exists(DUMP), (
        "plans_dump.txt missing — regenerate with "
        "`python scripts/dump_plans.py` and commit it"
    )
    txt = open(DUMP).read()
    parts = re.split(r"={20} (\S+) ={20}\n", txt)
    out = dict(zip(parts[1::2], parts[2::2]))
    assert len(out) > 100, "dump looks truncated"
    return out


def test_dump_has_no_errors(sections):
    bad = [n for n, b in sections.items() if b.startswith("ERROR:")]
    assert not bad, bad


def test_no_cartesian_product(sections):
    bad = [
        n
        for n, b in sections.items()
        if "CartesianProduct" in b and n not in DECLARED_ALL_PAIRS
    ]
    assert not bad, bad


def test_no_unpartitioned_window_behind_single_partition_exchange(
    sections,
):
    """A Window co-resident with an Exchange SinglePartition in the
    same query is the global single-task window shape (the canonical
    100-TB failure mode VERDICT r4 flagged in zipf_slope) — banned
    everywhere; bounded-frame windows in this engine all ride
    partitioned exchanges or post-limit frames."""
    bad = [
        n
        for n, b in sections.items()
        if "Exchange SinglePartition" in b and re.search(r"\bWindow\b", b)
    ]
    assert not bad, bad


def test_nested_loop_joins_only_scalar_broadcast(sections):
    bad = [
        n
        for n, b in sections.items()
        if "BroadcastNestedLoopJoin" in b
        and n not in SCALAR_BROADCAST_CROSS | DECLARED_ALL_PAIRS
    ]
    assert not bad, bad
