"""PySpark-native point-in-time feature-engineering engine.

A from-scratch re-expression (NOT a port) of the capabilities of
liuxiaohui1221/SQLFeatureExtraction — a batch fragment-embedding
feature pipeline over timestamped event logs — generalized to Iceberg/
parquet tables of multi-turn agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Everything is declared with the DataFrame / Spark SQL API so Catalyst
picks the physical plan; Python appears only inside Arrow-vectorized
pandas UDFs (``applyInPandas`` / ``mapInPandas``), never per-row.

Subpackages
-----------
operators/   vectorize, point-in-time window, as-of join, windowed agg,
             sessionize, backfill, dedup, similarity, text stats
sources/     scans & sinks (parquet/TSV/encoded-line round-trip)
functions/   scalar column-function library (tokenize, time buckets, …)
plans/       end-to-end pipelines (fit + transform + split)
streaming/   Structured Streaming variants of the windowed aggregation
"""

__version__ = "0.1.0"

from sqlfeatureextraction_spark.config import FeatureConfig  # noqa: F401
