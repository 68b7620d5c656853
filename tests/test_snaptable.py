"""Snapshot-table layer (sources/snaptable.py): append / time-travel /
incremental / rollback / commit-conflict semantics."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sqlfeatureextraction_spark.sources import snaptable
from sqlfeatureextraction_spark.sources.io import read_transcripts
from sqlfeatureextraction_spark.synth import make_transcripts_pdf


@pytest.fixture(scope="module")
def turns(spark):
    pdf = make_transcripts_pdf(n_convs=20, seed=7)
    return spark.createDataFrame(pdf)


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("conv_id", "turn_idx").collect()
    )


def test_append_read_time_travel(spark, turns, tmp_path):
    root = str(tmp_path / "tbl")
    a = turns.where(F.col("turn_idx") % 2 == 0)
    b = turns.where(F.col("turn_idx") % 2 == 1)
    s1 = snaptable.append(a, root)
    s2 = snaptable.append(b, root)
    assert snaptable.current_snapshot_id(root) == s2
    # current read = union of both appends
    assert _rows(snaptable.read(spark, root)) == _rows(turns)
    # time-travel to s1 = first append only
    assert _rows(snaptable.read(spark, root, s1)) == _rows(a)
    # snapshot log: parent chain + summaries
    snaps = snaptable.snapshots(root)
    assert [s["snapshot-id"] for s in snaps] == [s1, s2]
    assert snaps[0]["parent-snapshot-id"] is None
    assert snaps[1]["parent-snapshot-id"] == s1
    assert snaps[0]["summary"]["added-records"] == a.count()
    assert snaps[1]["summary"]["total-records"] == turns.count()


def test_incremental_read(spark, turns, tmp_path):
    root = str(tmp_path / "tbl")
    a = turns.where(F.col("turn_idx") == 0)
    b = turns.where(F.col("turn_idx") == 1)
    c = turns.where(F.col("turn_idx") == 2)
    s1 = snaptable.append(a, root)
    s2 = snaptable.append(b, root)
    s3 = snaptable.append(c, root)
    # (s1, s3] = appends 2 and 3
    got = snaptable.incremental_read(spark, root, s1)
    assert _rows(got) == _rows(b.unionByName(c))
    # bounded (s1, s2]
    got = snaptable.incremental_read(spark, root, s1, s2)
    assert _rows(got) == _rows(b)
    # (s3, current] = empty, with the table schema
    got = snaptable.incremental_read(spark, root, s3)
    assert got.count() == 0
    assert got.schema == turns.schema


def test_rollback_then_reappend(spark, turns, tmp_path):
    root = str(tmp_path / "tbl")
    a = turns.where(F.col("turn_idx") == 0)
    b = turns.where(F.col("turn_idx") == 1)
    s1 = snaptable.append(a, root)
    s2 = snaptable.append(b, root)
    snaptable.rollback(root, s1)
    assert snaptable.current_snapshot_id(root) == s1
    assert _rows(snaptable.read(spark, root)) == _rows(a)
    # later snapshot stays readable by id (files are immutable)
    assert _rows(snaptable.read(spark, root, s2)) == _rows(
        a.unionByName(b)
    )
    # appending after rollback branches off s1
    c = turns.where(F.col("turn_idx") == 2)
    s3 = snaptable.append(c, root)
    snaps = {s["snapshot-id"]: s for s in snaptable.snapshots(root)}
    assert snaps[s3]["parent-snapshot-id"] == s1
    assert _rows(snaptable.read(spark, root)) == _rows(a.unionByName(c))
    # s2 is a sibling branch, not an ancestor of s3 — an "incremental
    # read from s2" is not an append diff and must be rejected
    with pytest.raises(ValueError, match="ancestor"):
        snaptable.incremental_read(spark, root, s2, s3)
    # while s1 → s3 is a real append chain
    got = snaptable.incremental_read(spark, root, s1, s3)
    assert _rows(got) == _rows(c)


def test_schema_mismatch_rejected(spark, turns, tmp_path):
    root = str(tmp_path / "tbl")
    snaptable.append(turns, root)
    with pytest.raises(ValueError, match="schema"):
        snaptable.append(turns.drop("tool"), root)


def test_deterministic_snapshot_ids(spark, turns, tmp_path):
    """Identical append sequences produce identical snapshot ids —
    content-addressed, so oracles can pin time-travel by value."""
    a = turns.where(F.col("turn_idx") == 0).coalesce(2)
    ids = []
    for d in ("t1", "t2"):
        root = str(tmp_path / d)
        ids.append(snaptable.append(a, root))
    assert ids[0] == ids[1]


def test_commit_conflict_retries_on_winner(spark, turns, tmp_path):
    """A stale writer (its observed version was overtaken) must retry
    on top of the winner, not clobber it — simulated by pre-committing
    the next metadata version out from under an appender."""
    root = str(tmp_path / "tbl")
    a = turns.where(F.col("turn_idx") == 0)
    s1 = snaptable.append(a, root)
    # simulate a racing metadata-only commit: bump the version manually
    meta = snaptable._load_meta(root)
    snaptable._commit(root, meta, snaptable._current_version(root))
    # the appender sees the bumped version and still lands cleanly
    b = turns.where(F.col("turn_idx") == 1)
    s2 = snaptable.append(b, root)
    assert snaptable.current_snapshot_id(root) == s2
    assert _rows(snaptable.read(spark, root)) == _rows(a.unionByName(b))
    assert snaptable._current_version(root) == 3
    # metadata referenced by every version resolves to existing files
    for s in snaptable.snapshots(root):
        for e in s["manifest"]:
            assert os.path.exists(os.path.join(root, "data", e["file"]))


def test_stale_hint_is_advisory(spark, turns, tmp_path):
    root = str(tmp_path / "tbl")
    snaptable.append(turns.where(F.col("turn_idx") == 0), root)
    snaptable.append(turns.where(F.col("turn_idx") == 1), root)
    hint = os.path.join(root, "metadata", "version-hint.text")
    with open(hint, "w") as f:
        f.write("1")  # stale
    assert snaptable._current_version(root) == 2
    assert _rows(snaptable.read(spark, root)) == _rows(
        turns.where(F.col("turn_idx") <= 1)
    )


def test_read_transcripts_detects_snap_root(spark, turns, tmp_path):
    root = str(tmp_path / "tbl")
    a = turns.where(F.col("turn_idx") == 0)
    s1 = snaptable.append(a, root)
    snaptable.append(turns.where(F.col("turn_idx") == 1), root)
    assert _rows(read_transcripts(spark, root, snapshot_id=s1)) == _rows(a)
    # plain parquet dirs still read as before
    pq = str(tmp_path / "plain")
    a.write.mode("overwrite").parquet(pq)
    assert _rows(read_transcripts(spark, pq)) == _rows(a)


def test_stats_pruning(spark, turns, tmp_path):
    """File-level min/max pruning: appends partitioned by turn_idx give
    disjoint per-file bounds; a turn_idx range prune plans only the
    overlapping files, and the pruned read + residual filter equals the
    plain filtered read."""
    root = str(tmp_path / "tbl")
    for k in range(4):
        snaptable.append(turns.where(F.col("turn_idx") % 4 == k)
                         .coalesce(1), root)
    all_files = snaptable.planned_files(root)
    assert len(all_files) == 4
    planned = snaptable.planned_files(root, prune={"turn_idx": (0, 0)})
    assert len(planned) == 1  # only the %4==0 file can hold turn_idx 0
    got = snaptable.read(spark, root, prune={"turn_idx": (0, 0)}).where(
        F.col("turn_idx") == 0
    )
    want = snaptable.read(spark, root).where(F.col("turn_idx") == 0)
    assert _rows(got) == _rows(want)
    # timestamp bounds: prune on ts using a datetime bound
    lo = turns.agg(F.min("ts")).first()[0]
    planned = snaptable.planned_files(root, prune={"ts": (None, lo)})
    rows = snaptable.read(spark, root, prune={"ts": (None, lo)}).where(
        F.col("ts") <= F.lit(lo)
    )
    assert rows.count() == turns.where(F.col("ts") <= F.lit(lo)).count()
    # a column with no stats never prunes (conservative keep-all)
    assert snaptable.planned_files(
        root, prune={"no_such_col": (0, 0)}
    ) == all_files


def test_expire_snapshots(spark, turns, tmp_path):
    root = str(tmp_path / "tbl")
    a = turns.where(F.col("turn_idx") == 0)
    b = turns.where(F.col("turn_idx") == 1)
    c = turns.where(F.col("turn_idx") == 2)
    s1 = snaptable.append(a, root)
    s2 = snaptable.append(b, root)
    snaptable.rollback(root, s1)
    s3 = snaptable.append(c, root)  # s2 now an orphaned branch
    removed = snaptable.expire_snapshots(root, keep=[s3])
    # s2's own file is unreachable from s3 and must be gone; s1's file
    # is still reachable (s3's flattened chain) and must survive
    assert removed, "expected the orphaned branch's files removed"
    for f in removed:
        assert not os.path.exists(os.path.join(root, "data", f))
    assert _rows(snaptable.read(spark, root)) == _rows(a.unionByName(c))
    assert _rows(snaptable.read(spark, root, s3)) == _rows(
        a.unionByName(c)
    )
    with pytest.raises(KeyError):
        snaptable.read(spark, root, s2)
    # sequence numbers stay monotonic: a post-expiry append must not
    # collide with surviving file names
    s4 = snaptable.append(b, root)
    assert _rows(snaptable.read(spark, root, s4)) == _rows(turns.where(
        F.col("turn_idx") <= 2
    ))


def test_expire_preserves_kept_lineage(spark, turns, tmp_path):
    """Expiring a MIDDLE snapshot re-parents its kept descendant to the
    nearest kept ancestor — incremental reads between two kept
    snapshots must survive retention."""
    root = str(tmp_path / "tbl")
    a = turns.where(F.col("turn_idx") == 0)
    b = turns.where(F.col("turn_idx") == 1)
    c = turns.where(F.col("turn_idx") == 2)
    s1 = snaptable.append(a, root)
    s2 = snaptable.append(b, root)
    s3 = snaptable.append(c, root)
    removed = snaptable.expire_snapshots(root, keep=[s1, s3])
    # s2's files are still reachable through s3's flattened manifest
    assert removed == []
    assert _rows(snaptable.read(spark, root, s3)) == _rows(
        a.unionByName(b).unionByName(c)
    )
    got = snaptable.incremental_read(spark, root, s1, s3)
    assert _rows(got) == _rows(b.unionByName(c))
    snaps = {s["snapshot-id"]: s for s in snaptable.snapshots(root)}
    assert snaps[s3]["parent-snapshot-id"] == s1


def test_dead_writer_orphan_recovery(spark, turns, tmp_path):
    """A writer that died between publishing data files and committing
    metadata must not brick the table: the next append detects the
    stable unreferenced blocker and switches to collision-free names;
    remove_orphans (with age guard) reclaims the orphan."""
    root = str(tmp_path / "tbl")
    a = turns.where(F.col("turn_idx") == 0)
    s1 = snaptable.append(a, root)
    # simulate the dead writer: an unreferenced file squatting on the
    # NEXT sequence's name
    data_dir = os.path.join(root, "data")
    existing = next(f for f in os.listdir(data_dir)
                    if f.endswith(".parquet"))
    orphan = "snap00002-00000.parquet"
    os.link(os.path.join(data_dir, existing),
            os.path.join(data_dir, orphan))
    b = turns.where(F.col("turn_idx") == 1)
    s2 = snaptable.append(b, root)  # must succeed despite the squatter
    assert _rows(snaptable.read(spark, root, s2)) == _rows(
        a.unionByName(b)
    )
    # age guard: a young orphan is NOT deleted (could be a live append)
    assert snaptable.remove_orphans(root, older_than_s=3600) == []
    assert snaptable.remove_orphans(root, older_than_s=-1.0) == [orphan]
    assert not os.path.exists(os.path.join(data_dir, orphan))
    assert _rows(snaptable.read(spark, root)) == _rows(a.unionByName(b))


def test_string_bound_widening_edge():
    long = "x" * 40
    hi = snaptable._json_safe(long, is_max=True)
    assert hi is not None and hi > long[:32] and len(hi) == 32
    assert snaptable._json_safe(long, is_max=False) == long[:32]
    # un-widenable max (every char is U+10FFFF): no bound, not a crash
    assert snaptable._json_safe("\U0010ffff" * 40, is_max=True) is None


def test_plain_parquet_rejects_snapshot_pin(spark, turns, tmp_path):
    pq = str(tmp_path / "plain")
    turns.limit(5).write.mode("overwrite").parquet(pq)
    with pytest.raises(ValueError, match="snapshot"):
        read_transcripts(spark, pq, snapshot_id=123)


def test_compact(spark, turns, tmp_path):
    """Small-file compaction: a sort-ordered replace snapshot with the
    same rows; time travel to pre-compaction survives; incremental
    reads refuse to cross the boundary; expire reclaims the small
    files."""
    root = str(tmp_path / "tbl")
    sids = [
        snaptable.append(
            turns.where(F.col("turn_idx") == k).coalesce(2), root
        )
        for k in range(3)
    ]
    pre = turns.where(F.col("turn_idx") <= 2)
    assert len(snaptable.planned_files(root)) == 6
    sc = snaptable.compact(spark, root, n_files=1,
                           sort_by=["conv_id", "turn_idx"])
    assert len(snaptable.planned_files(root)) == 1
    assert _rows(snaptable.read(spark, root)) == _rows(pre)
    # pre-compaction snapshots still time-travel
    assert _rows(snaptable.read(spark, root, sids[1])) == _rows(
        turns.where(F.col("turn_idx") <= 1)
    )
    # incremental across the boundary refuses; from the compaction on
    # it works
    s4 = snaptable.append(turns.where(F.col("turn_idx") == 3), root)
    with pytest.raises(ValueError, match="replace/compaction"):
        snaptable.incremental_read(spark, root, sids[0], s4)
    got = snaptable.incremental_read(spark, root, sc, s4)
    assert _rows(got) == _rows(turns.where(F.col("turn_idx") == 3))
    # a replace validated against a stale parent must not land
    with pytest.raises(RuntimeError, match="concurrent"):
        snaptable.append(pre, root, operation="replace",
                         expect_parent=sids[2])
    # retention: dropping the pre-compaction snapshots reclaims their
    # six small files; the compacted file and the new append survive
    removed = snaptable.expire_snapshots(root, keep=[sc, s4])
    assert len(removed) == 6
    assert _rows(snaptable.read(spark, root, sc)) == _rows(pre)
    assert _rows(snaptable.read(spark, root, s4)) == _rows(
        turns.where(F.col("turn_idx") <= 3)
    )
    # total-records summary reflects the visible chain, not the sum of
    # every snapshot ever committed
    by_id = {s["snapshot-id"]: s for s in snaptable.snapshots(root)}
    assert by_id[s4]["summary"]["total-records"] == \
        turns.where(F.col("turn_idx") <= 3).count()


def test_expire_across_compaction_keeps_reads_correct(spark, turns,
                                                      tmp_path):
    """Dropping a middle COMPACTION between two kept snapshots must not
    resurrect pre-compaction files into the descendant's read."""
    root = str(tmp_path / "tbl")
    a = turns.where(F.col("turn_idx") == 0)
    b = turns.where(F.col("turn_idx") == 1)
    s1 = snaptable.append(a, root)
    sc = snaptable.compact(spark, root, n_files=1)
    s3 = snaptable.append(b, root)
    snaptable.expire_snapshots(root, keep=[s1, s3])
    assert _rows(snaptable.read(spark, root, s3)) == _rows(
        a.unionByName(b)
    )
    assert _rows(snaptable.read(spark, root, s1)) == _rows(a)
    with pytest.raises(KeyError):
        snaptable.read(spark, root, sc)
    # the flattened descendant is self-contained (replace semantics),
    # so an incremental read across it still refuses
    with pytest.raises(ValueError, match="replace/compaction"):
        snaptable.incremental_read(spark, root, s1, s3)


def test_concurrent_appenders_no_lost_update(spark, turns, tmp_path):
    """Four threads race appends into one table: every append must land
    (optimistic retries), the final chain must contain all four
    snapshots, and the current table must hold every appended row — the
    lost-update scenario the captured-version commit protocol exists to
    prevent."""
    from concurrent.futures import ThreadPoolExecutor

    root = str(tmp_path / "tbl")
    parts = [turns.where(F.col("turn_idx") == k).cache() for k in range(4)]
    for p in parts:
        p.count()

    with ThreadPoolExecutor(max_workers=4) as ex:
        sids = list(
            ex.map(lambda df: snaptable.append(df, root, retries=25), parts)
        )
    assert len(set(sids)) == 4
    assert {s["snapshot-id"] for s in snaptable.snapshots(root)} == set(sids)
    want = turns.where(F.col("turn_idx") <= 3)
    assert _rows(snaptable.read(spark, root)) == _rows(want)
    # the chain is linear: exactly one root, each parent is a snapshot
    snaps = snaptable.snapshots(root)
    parents = [s["parent-snapshot-id"] for s in snaps]
    assert parents.count(None) == 1
    assert set(p for p in parents if p is not None) <= set(sids)


def test_checkpoint_lineage_carries_snapshot_id(spark, turns, tmp_path):
    """CheckpointedRun's manifest records the table's real snapshot id;
    re-running against a NEW snapshot recomputes (ids differ)."""
    from sqlfeatureextraction_spark.checkpoint import CheckpointedRun

    root = str(tmp_path / "tbl")
    ck = str(tmp_path / "ckpt")
    s1 = snaptable.append(turns.where(F.col("turn_idx") == 0), root)

    def compute(df):
        return df.groupBy("conv_id").agg(F.count("*").alias("n"))

    cp = CheckpointedRun(ck, n_buckets=2, snapshot_id=str(s1))
    cp.run_all(snaptable.read(spark, root), compute, key_col="conv_id")
    recs = [json.loads(ln) for ln in open(cp.manifest_path)]
    assert {r["snapshot_id"] for r in recs} == {str(s1)}
    s2 = snaptable.append(turns.where(F.col("turn_idx") == 1), root)
    cp2 = CheckpointedRun(ck, n_buckets=2, snapshot_id=str(s2))
    assert cp2.read_manifest() == {}  # nothing done for the new snapshot


def test_partitioned_append_and_partition_pruning(spark, turns, tmp_path):
    """Hidden partitioning: day(ts) + identity(role) transforms record
    partition tuples in the manifest; partition_where prunes files
    exactly and metadata-only; data files keep source columns only."""
    root = str(tmp_path / "tbl")
    spec = [("day", "ts"), "role"]
    s1 = snaptable.append(turns, root, partition_by=spec)
    # every manifest entry carries a full partition tuple
    snaps = snaptable.snapshots(root)
    assert all(
        set(e["partition"]) == {"day(ts)", "role"}
        for e in snaps[0]["manifest"]
    )
    # reads reproduce the table; schema has NO transform columns
    got = snaptable.read(spark, root)
    assert _rows(got) == _rows(turns)
    assert set(got.columns) == set(turns.columns)
    # exact partition pruning: pick a provably NONEMPTY (day, 'user')
    # cell so the strict-subset assert below has teeth
    days = sorted(
        r[0]
        for r in turns.where(F.col("role") == "user")
        .select(F.date_format("ts", "yyyy-MM-dd"))
        .distinct()
        .collect()
    )
    day = days[0]
    want = turns.where(
        (F.date_format("ts", "yyyy-MM-dd") == day) & (F.col("role") == "user")
    )
    got = snaptable.read(
        spark, root, partition_where={"day(ts)": day, "role": "user"}
    )
    assert _rows(got) == _rows(want)
    # the plan shrank: pruned file list is a strict subset
    all_files = snaptable.planned_files(root)
    pruned = snaptable.planned_files(
        root, partition_where={"day(ts)": day, "role": "user"}
    )
    assert 0 < len(pruned) < len(all_files)
    # list-valued predicate
    got2 = snaptable.read(
        spark, root, partition_where={"day(ts)": days[:2]}
    )
    want2 = turns.where(F.date_format("ts", "yyyy-MM-dd").isin(days[:2]))
    assert _rows(got2) == _rows(want2)
    # spec mismatch on a later append is rejected
    with pytest.raises(ValueError, match="partition spec"):
        snaptable.append(turns, root)
    with pytest.raises(ValueError, match="partition spec"):
        snaptable.append(turns, root, partition_by=[("day", "ts")])
    # matching spec appends fine and tuples keep pruning
    extra = turns.where(F.col("turn_idx") == 0)
    snaptable.append(extra, root, partition_by=spec, retries=25)
    got3 = snaptable.read(
        spark, root, partition_where={"day(ts)": day, "role": "user"}
    )
    want3 = want.unionByName(
        extra.where(
            (F.date_format("ts", "yyyy-MM-dd") == day)
            & (F.col("role") == "user")
        )
    )
    assert _rows(got3) == _rows(want3)
    assert s1 in {s["snapshot-id"] for s in snaptable.snapshots(root)}


def test_partitioned_compaction_keeps_spec_and_pruning(spark, turns, tmp_path):
    """compact() on a partitioned table re-derives the transform values
    (hidden partitioning) — the replace snapshot keeps the spec, and
    partition pruning still works across the compaction."""
    root = str(tmp_path / "tbl")
    spec = [("bucket", "conv_id", 4)]
    for k in range(3):
        snaptable.append(
            turns.where(F.col("turn_idx") == k), root, partition_by=spec
        )
    before = _rows(snaptable.read(spark, root))
    snaptable.compact(spark, root, n_files=2)
    assert _rows(snaptable.read(spark, root)) == before
    snaps = snaptable.snapshots(root)
    assert snaps[-1]["operation"] == "replace"
    assert all("partition" in e for e in snaps[-1]["manifest"])
    # pruning to one bucket returns exactly that bucket's rows
    got = snaptable.read(
        spark, root, partition_where={"bucket4(conv_id)": "2"}
    )
    want = turns.where(
        (F.pmod(F.xxhash64("conv_id"), F.lit(4)) == 2)
        & (F.col("turn_idx") <= 2)
    )
    assert _rows(got) == _rows(want)


def test_schema_evolution_add_column(spark, turns, tmp_path):
    """Add-column evolution: an append with an extra column widens the
    table schema; old files read as null in the new column; explicit
    time-travel to the pre-evolution snapshot keeps the narrow schema;
    drops and type changes are rejected."""
    root = str(tmp_path / "tbl")
    a = turns.where(F.col("turn_idx") == 0)
    b = turns.where(F.col("turn_idx") == 1).withColumn(
        "quality", F.length("text").cast("double")
    )
    s1 = snaptable.append(a, root)
    s2 = snaptable.append(b, root)
    cur = snaptable.read(spark, root)
    assert "quality" in cur.columns
    # old rows surface null; new rows carry their values
    nulls = cur.where(F.col("quality").isNull())
    assert _rows(nulls) == _rows(a)
    vals = {
        (r["conv_id"], r["turn_idx"]): r["quality"]
        for r in cur.where(F.col("quality").isNotNull()).collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): float(len(r["text"] or ""))
        for r in b.collect()
    }
    assert vals == want
    # time-travel to s1: narrow schema
    old = snaptable.read(spark, root, s1)
    assert "quality" not in old.columns and _rows(old) == _rows(a)
    # incremental read to the evolved snapshot: wide schema
    inc = snaptable.incremental_read(spark, root, s1, s2)
    assert "quality" in inc.columns and _rows(inc) == _rows(b)
    # the added column is recorded nullable in table metadata
    import json as _json

    meta_schema = _json.loads(
        snaptable._load_meta(root)["schema"]
    )
    fq = [f for f in meta_schema["fields"] if f["name"] == "quality"]
    assert fq and fq[0]["nullable"] is True
    # dropping a column is rejected
    with pytest.raises(ValueError, match="drops table columns"):
        snaptable.append(a.drop("text"), root)
    # changing a type is rejected
    with pytest.raises(ValueError, match="changes the type"):
        snaptable.append(
            b.withColumn("quality", F.col("quality").cast("string")), root
        )
    # appends now carry the wide schema; compaction across the
    # evolution rewrites cleanly and keeps values
    snaptable.append(
        turns.where(F.col("turn_idx") == 2).withColumn(
            "quality", F.lit(None).cast("double")
        ),
        root,
    )
    snaptable.compact(spark, root, n_files=1)
    after = snaptable.read(spark, root)
    assert after.where(F.col("quality").isNotNull()).count() == b.count()
    assert _rows(after) == _rows(turns.where(F.col("turn_idx") <= 2))
