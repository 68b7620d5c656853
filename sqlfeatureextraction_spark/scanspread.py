"""Scale-adaptive fix for effectively-serial parquet scans.

A parquet row group is atomic to the vectorized reader: a single-file,
single-row-group input scans as ONE working task no matter how many
splits ``spark.sql.files.minPartitionNum`` manufactures (the empty
splits finish instantly), so every pre-shuffle operator — partial
aggregation, tokenization, partial window-group-limit sorts — runs
single-threaded.  ``getNumPartitions()`` cannot detect this: it counts
splits, not row groups.

``spread_small_scan`` probes the actual row-group count from the scan's
input files (driver-side footer reads, O(ms)) and, ONLY when the scan
is both effectively narrow (< half the cores) and cheap to move
(< ``max_bytes`` on disk), inserts a deterministic hash repartition so
downstream per-row work parallelizes.  At real scale inputs have many
row groups (or are too big to move), the guard does not fire, and the
plan is untouched — the helper is a no-op exactly where an extra
exchange would hurt (guide §2.5: deterministic synthetic keys, never
round-robin over a re-computable scan).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def effective_scan_tasks(df: DataFrame) -> tuple[int, int] | None:
    """(row_groups, total_bytes) across the frame's parquet input
    files, or None when unknown (non-file source, remote FS, non-
    parquet).  Row groups bound true scan parallelism for columnar
    reads."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    try:
        import pyarrow.parquet as pq
    except Exception:
        return None
    groups = 0
    total = 0
    for uri in files:
        if not uri.startswith("file:"):
            return None
        path = uri[len("file:") :]
        while path.startswith("//"):
            path = path[1:]
        if not path.endswith(".parquet") or not os.path.exists(path):
            return None
        try:
            groups += pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            return None
        total += os.path.getsize(path)
    return groups, total


def spread_small_scan(
    df: DataFrame,
    key: Column | str,
    max_bytes: int = 2 << 30,
) -> DataFrame:
    """Hash-repartition ``df`` across the cores iff its scan is
    provably effectively-serial AND small enough that the extra narrow
    exchange is trivially cheaper than the serial work it unblocks.

    ``key`` must be a deterministic, high-cardinality expression
    (a unique id, or xxhash64 of one) so the spread is even and safe
    under task retries."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    # already spread (or cached post-spread) upstream: the row-group
    # probe only describes the file scan, not the repartition sitting
    # on top of it — don't pay a second exchange
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        if "Repartition" in plan or "InMemoryRelation" in plan:
            return df
    except Exception:
        pass
    probe = effective_scan_tasks(df)
    if probe is None:
        return df
    groups, total = probe
    if groups >= max(2, cores // 2) or total > max_bytes:
        return df
    key_col = F.col(key) if isinstance(key, str) else key
    return df.repartition(cores, key_col)
