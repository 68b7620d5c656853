"""Local mimic of the driver's correctness gate.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet dir, compares row count, sorted schema and
an order-insensitive value hash (columns sorted by name, rows sorted,
floats canonicalized).

Usage: python scripts/check_correctness.py [sf_dir] [query_name ...]
(no names = all queries + the entry() smoke)
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == "float64":
            pdf[c] = pdf[c].round(6)
        # normalize nullable ints
        if str(pdf[c].dtype).startswith(("Int", "UInt")):
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def value_hash(pdf: pd.DataFrame) -> str:
    csv = pdf.to_csv(index=False, float_format="%.6g")
    return hashlib.sha256(csv.encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        # catches `check_correctness.py <query_name>` (sf_dir omitted)
        print(f"first argument must be a data dir, got {sf_dir!r}")
        return 1
    import __spark_entry__ as E
    from sqlfeatureextraction_spark.session import get_spark

    spark = get_spark("check_correctness", parallelism=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, oracles = E.queries(), E.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    n_fail = 0
    for name, fn in qs.items():
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {e}")
            n_fail += 1
            continue
        g, x = canon(got), canon(exp)
        ok_rows = len(g) == len(x)
        ok_cols = list(g.columns) == list(x.columns)
        hg, hx = value_hash(g), value_hash(x)
        status = "OK  " if (ok_rows and ok_cols and hg == hx) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(
            f"{status}  {name}: rows {len(g)}/{len(x)} cols "
            f"{list(g.columns) if not ok_cols else 'match'} hash "
            f"{'match' if hg == hx else f'{hg} != {hx}'}"
        )
        if hg != hx and ok_rows and ok_cols:
            diff = (g != x) & ~(g.isna() & x.isna())
            bad_rows = diff.any(axis=1)
            print(g[bad_rows].head(3))
            print(x[bad_rows].head(3))

    # smoke: entry()
    if not only:
        res = E.entry(spark)
        n = res.count()
        print(f"entry(): {n} rows, schema {res.schema.simpleString()}")
    print("ALL OK" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
