"""Per-partition checkpointing with lineage manifest + idempotent resume.

Reference analog: per-thread output files plus resume-by-line-offset
(`MINC_START_LINE_NUM`, input/ApmJavaConfig.txt:10,
enc/APMFragmentIntent.java:856-864, 1099-1135) — resumable only within
one process, no integrity check.  Here the unit of work is a
**partition bucket** of the entity key space:

  bucket = pmod(xxhash64(conv_id), n_buckets)

Each bucket's output is written to ``<root>/data/bucket=<i>/`` and
recorded in a manifest row (bucket id, input snapshot id, row counts
in/out, sha256 digest of the sorted output, status).  Resume lists the
manifest, skips buckets already `done` for the same snapshot id, and
recomputes the rest — output is byte-identical to an uninterrupted run
because (a) bucket assignment is a pure hash of conv_id, (b) all
engine operators define total orders, and (c) the digest pins it.

At cluster scale each bucket is a normal Spark job over a hash-bucket
filter that prunes at the scan (predicate pushdown on the persisted
bucket column when the input is bucketed/partitioned by it).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors.exceptions.captured import AnalysisException

MANIFEST = "manifest.jsonl"

# digest of an empty result (NULL sums, count 0) — what _digest returns
# when the DataFrame has no rows
_EMPTY_DIGEST = hashlib.sha256(b"None|None|0").hexdigest()[:32]


def bucket_of(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _digest(df: DataFrame) -> tuple[str, int]:
    """Order-insensitive sha256 of the result: per-row xxhash64 over all
    columns, summed as unsigned via two associative accumulators.
    Distributed — no driver-side sort/collect."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    # modular reduction + decimal accumulators: no ANSI overflow at any
    # row count (decimal(38,0) sums of < 2^31 terms hold ~1e28 rows)
    p1, p2 = 2147483647, 2147483629
    dec = "decimal(38,0)"
    agg = df.agg(
        F.sum(F.pmod(h, F.lit(p1)).cast(dec)).alias("s"),
        F.sum(F.pmod(h, F.lit(p2)).cast(dec)).alias("s2"),
        F.count("*").alias("n"),
    ).first()
    payload = f"{agg['s']}|{agg['s2']}|{agg['n']}"
    return hashlib.sha256(payload.encode()).hexdigest()[:32], agg["n"]


class CheckpointedRun:
    def __init__(self, root: str, n_buckets: int = 16, snapshot_id: str = ""):
        self.root = root
        self.n_buckets = n_buckets
        self.snapshot_id = snapshot_id
        os.makedirs(root, exist_ok=True)

    # ----------------------------------------------------------- manifest

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def read_manifest(self) -> dict[int, dict]:
        done: dict[int, dict] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    rec = json.loads(line)
                    if (
                        rec["status"] == "done"
                        and rec["snapshot_id"] == self.snapshot_id
                    ):
                        done[rec["bucket"]] = rec
        return done

    def _append(self, rec: dict) -> None:
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    # --------------------------------------------------------------- run

    def run(
        self,
        transcripts: DataFrame,
        compute: Callable[[DataFrame], DataFrame],
        key_col: str = "conv_id",
        fail_after: int | None = None,
    ) -> int:
        """Compute per bucket, skipping completed ones.  `fail_after`
        aborts after N buckets (for kill-and-resume tests).  Returns the
        number of buckets computed this invocation."""
        from pyspark.sql import Observation

        done = self.read_manifest()
        computed = 0
        with_bucket = transcripts.withColumn(
            "_bucket", bucket_of(F.col(key_col), self.n_buckets)
        )
        for b in range(self.n_buckets):
            if b in done:
                continue
            if fail_after is not None and computed >= fail_after:
                raise RuntimeError(f"injected failure after {computed} buckets")
            # row_count_in via observe() on the compute plan — piggybacks
            # on the write job instead of a separate count() scan (the
            # input is read ONCE per bucket, not twice)
            obs = Observation()
            part_in = (
                with_bucket.where(F.col("_bucket") == b)
                .drop("_bucket")
                .observe(obs, F.count(F.lit(1)).alias("n_in"))
            )
            out = compute(part_in)
            out_path = os.path.join(self.root, "data", f"bucket={b}")
            out.write.mode("overwrite").parquet(out_path)
            n_in = obs.get["n_in"]
            spark = transcripts.sparkSession
            written = spark.read.parquet(out_path)
            digest, n_out = _digest(written)
            self._append(
                {
                    "bucket": b,
                    "snapshot_id": self.snapshot_id,
                    "row_count_in": n_in,
                    "row_count_out": n_out,
                    "digest": digest,
                    "status": "done",
                    "ts": time.time(),
                }
            )
            computed += 1
        return computed

    def run_all(
        self,
        transcripts: DataFrame,
        compute: Callable[[DataFrame], DataFrame],
        key_col: str = "conv_id",
    ) -> int:
        """Single-job variant: compute + write ALL pending buckets at
        once with ``partitionBy(bucket)`` (one scan of the input total,
        vs one per bucket in ``run``), then record per-bucket manifest
        rows from the written files.  Coarser failure granularity (the
        one job is all-or-nothing) but n_buckets× cheaper on input I/O
        — the right default when the input isn't pre-bucketed.
        Requires ``compute`` to preserve ``key_col`` in its output so
        the bucket column can be re-derived.  Output layout
        (``data/bucket=<i>/``) and per-bucket digests are identical to
        ``run``'s, so the two paths are interchangeable and resumable
        across each other."""
        done = self.read_manifest()
        pending = [b for b in range(self.n_buckets) if b not in done]
        if not pending:
            return 0
        with_bucket = transcripts.withColumn(
            "bucket", bucket_of(F.col(key_col), self.n_buckets)
        ).where(F.col("bucket").isin(pending))
        # per-bucket input counts: ONE small agg job over the pending
        # slice (vs one count job per bucket in the naive formulation)
        n_in = {
            r["bucket"]: r["n"]
            for r in with_bucket.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        out = compute(with_bucket.drop("bucket")).withColumn(
            "bucket", bucket_of(F.col(key_col), self.n_buckets)
        )
        data_root = os.path.join(self.root, "data")
        # a prior run may have crashed AFTER writing a bucket dir but
        # BEFORE appending its manifest row; if recomputation of that
        # bucket now yields zero rows, dynamic overwrite would never
        # touch the stale dir and its leftover data would be digested
        # as fresh — delete pending bucket dirs up front so only this
        # run's output can be read back (at cluster scale this is the
        # same pre-delete via the Hadoop FileSystem API)
        for b in pending:
            stale = os.path.join(data_root, f"bucket={b}")
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        # dynamic overwrite: only the pending bucket= dirs are replaced
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(data_root)
        )
        spark = transcripts.sparkSession
        for b in pending:
            bucket_dir = os.path.join(data_root, f"bucket={b}")
            try:
                written = spark.read.parquet(bucket_dir)
                digest, n_out = _digest(written)
            except AnalysisException:
                # an empty bucket produces no partition dir under dynamic
                # overwrite; record the same digest run() computes for an
                # empty result (sum aggs are NULL, count 0)
                digest, n_out = _EMPTY_DIGEST, 0
            self._append(
                {
                    "bucket": b,
                    "snapshot_id": self.snapshot_id,
                    "row_count_in": int(n_in.get(b, 0)),
                    "row_count_out": n_out,
                    "digest": digest,
                    "status": "done",
                    "ts": time.time(),
                }
            )
        return len(pending)

    def read_output(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "data"))

    def metrics(self) -> dict:
        done = self.read_manifest()
        return {
            "buckets_done": len(done),
            "rows_in": sum(r["row_count_in"] for r in done.values()),
            "rows_out": sum(r["row_count_out"] for r in done.values()),
        }
