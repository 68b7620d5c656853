"""Cross-parallelism determinism audit of the driver queries.

The round driver's correctness gate compares Spark vs DuckDB in ITS
environment; a query whose output depends on partition-merge order
(double aggregation order, unstable tie-breaks) can pass any single
local run and still flip in a different environment — exactly the
round-4 failure mode.  This harness runs every ``queries()`` entry in
TWO separate Spark sessions at different parallelism / shuffle-
partition settings (different merge orders by construction) and
compares the same canonicalized value hash the gate mimic uses.  A
mismatch is an order-dependence bug even when both runs individually
match the oracle.

Usage: python scripts/check_determinism.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
par, sf_dir = int(sys.argv[1]), sys.argv[2]
names = sys.argv[3:]
import __spark_entry__ as E
sys.path.insert(0, os.path.join(os.environ["REPO_ROOT"], "scripts"))
from check_correctness import canon, value_hash
from sqlfeatureextraction_spark.session import get_spark
spark = get_spark("determinism", parallelism=par, shuffle_partitions=par)
qs = E.queries()
out = {}
for name in names:
    try:
        out[name] = value_hash(canon(qs[name](spark, sf_dir).toPandas()))
    except Exception as e:  # noqa: BLE001
        out[name] = f"ERR:{type(e).__name__}"
print("HASHES " + json.dumps(out))
"""


def run_level(par: int, sf_dir: str, names: list[str]) -> dict:
    env = dict(
        os.environ,
        REPO_ROOT=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    r = subprocess.run(
        [sys.executable, "-c", CHILD, str(par), sf_dir, *names],
        env=env,
        capture_output=True,
        text=True,
        check=False,
    )
    import json

    for ln in r.stdout.splitlines():
        if ln.startswith("HASHES "):
            return json.loads(ln[len("HASHES "):])
    raise RuntimeError(
        f"level {par} produced no hashes (rc={r.returncode}):\n"
        + r.stderr[-3000:]
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E

    names = sys.argv[2:] or [
        n
        for n in E.queries()
        # streaming rows replay a source dir written inside the
        # builder; two sessions would race on it — the batch-exact
        # streaming equivalences are covered by their own gate rows
        if not n.startswith("stream_")
    ]
    h8 = run_level(8, sf_dir, names)
    h32 = run_level(32, sf_dir, names)
    n_bad = 0
    for n in names:
        a, b = h8.get(n), h32.get(n)
        status = "OK  " if a == b and not str(a).startswith("ERR") else "FAIL"
        if status == "FAIL":
            n_bad += 1
            print(f"{status}  {n}: par8={a} par32={b}")
        else:
            print(f"{status}  {n}")
    print("ALL DETERMINISTIC" if n_bad == 0 else f"{n_bad} ORDER-DEPENDENT")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
