"""Model-based property test for the snapshot table: random programs
of append / rollback / expire are applied to a real table AND to a
pure-Python model of Iceberg's snapshot semantics; after every
operation the table's visible state must match the model.

State is checked WITHOUT Spark reads: each live snapshot's visible row
count is recomputed from the parquet footers of planned_files(), so a
program step costs milliseconds and hypothesis can explore dozens of
programs.  (Value-level read equality is covered by tests/
test_snaptable.py; this suite hunts metadata/lineage bugs — lost
updates, wrong flatten/re-parent on expire, bad file diffs.)
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sqlfeatureextraction_spark.sources import snaptable


@pytest.fixture(scope="module")
def chunks(spark):
    """Five tiny cached DataFrames with distinct row counts 1..5."""
    dfs = []
    for k in range(5):
        df = spark.range(k + 1).selectExpr(
            "cast(id as string) as conv_id", "cast(id as int) as turn_idx"
        ).cache()
        df.count()
        dfs.append(df)
    return dfs


def _footer_rows(root: str, sid: int | None) -> int:
    return sum(
        pq.ParquetFile(os.path.join(root, "data", f)).metadata.num_rows
        for f in snaptable.planned_files(root, sid)
    )


class Model:
    """Chains of append events; each event has a row count."""

    def __init__(self):
        self.chain: dict[int, list[tuple[int, int]]] = {}  # sid -> events
        self.current: int | None = None

    def live(self) -> list[int]:
        return sorted(self.chain)

    def rows(self, sid: int) -> int:
        return sum(n for _, n in self.chain[sid])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(data=st.data())
def test_random_programs_match_model(data, chunks, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snapprog") / "tbl")
    m = Model()
    ev = 0
    n_ops = data.draw(st.integers(min_value=2, max_value=7), label="n_ops")
    for step in range(n_ops):
        choices = ["append"]
        if m.live():
            choices += ["rollback", "expire", "compact"]
        op = data.draw(st.sampled_from(choices), label=f"op{step}")
        if op == "append":
            k = data.draw(st.integers(0, len(chunks) - 1), label="chunk")
            sid = snaptable.append(chunks[k], root)
            parent_events = m.chain.get(m.current, []) if m.current else []
            assert sid not in m.chain, "snapshot id collision"
            m.chain[sid] = parent_events + [(ev, k + 1)]
            ev += 1
            m.current = sid
        elif op == "compact":
            spark = chunks[0].sparkSession
            sid = snaptable.compact(spark, root, n_files=1)
            assert sid not in m.chain, "snapshot id collision"
            # the model's compaction: one merged event holding the
            # whole visible row count (replace semantics: the chain
            # restarts here)
            m.chain[sid] = [(ev, m.rows(m.current))]
            ev += 1
            m.current = sid
        elif op == "rollback":
            sid = data.draw(st.sampled_from(m.live()), label="rb_to")
            snaptable.rollback(root, sid)
            m.current = sid
        else:  # expire
            keep = set(
                data.draw(
                    st.lists(st.sampled_from(m.live()), unique=True),
                    label="keep",
                )
            )
            keep.add(m.current)
            snaptable.expire_snapshots(root, keep=sorted(keep))
            m.chain = {s: c for s, c in m.chain.items() if s in keep}
        # --- invariants after every op ---
        real_ids = {s["snapshot-id"] for s in snaptable.snapshots(root)}
        assert real_ids == set(m.live())
        assert snaptable.current_snapshot_id(root) == m.current
        for sid in m.live():
            assert _footer_rows(root, sid) == m.rows(sid), (
                f"step {step}: snapshot {sid} visible rows diverged"
            )
        # incremental diff on a random valid ancestor pair
        anc_pairs = [
            (a, b)
            for a in m.live()
            for b in m.live()
            if [e for e, _ in m.chain[a]]
            == [e for e, _ in m.chain[b]][: len(m.chain[a])]
        ]
        if anc_pairs:
            a, b = data.draw(st.sampled_from(anc_pairs), label="pair")
            meta = snaptable._load_meta(root)
            base = set(snaptable._files_of(meta, a))
            diff = [
                f for f in snaptable._files_of(meta, b) if f not in base
            ]
            got = sum(
                pq.ParquetFile(
                    os.path.join(root, "data", f)
                ).metadata.num_rows
                for f in diff
            )
            assert got == m.rows(b) - m.rows(a)
