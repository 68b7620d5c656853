"""Dump formatted physical plans for EVERY driver query to a
normalized, diffable text file (plans_dump.txt — committed per round
so plan-shape regressions show up in review diffs), plus stdout for
the headline set.

Normalization: expression ids (#123), plan ids and codegen stage ids
are rewritten to stable placeholders so two runs of the same code
produce byte-identical dumps; only real plan-shape changes diff.

Usage: python scripts/dump_plans.py [sf_dir] [out_path]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# rows that execute a full streaming query inside the builder — the
# returned frame is a materialized local relation, no batch plan
SKIP = {"stream_windowed_counts", "stream_stateful_counter"}

HEADLINE = [
    "transcript_window_features",
    "transcript_wf_merge",
    "group_agg",
    "pit_window_sum",
    "asof_join_orders",
]


def normalize(plan: str) -> str:
    plan = re.sub(r"#\d+L?", "#N", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"\[id=#N\]", "[id=#N]", plan)
    plan = re.sub(r"WholeStageCodegen \(\d+\)", "WholeStageCodegen (N)", plan)
    plan = re.sub(r"Subquery subquery#N, \[id=#N\]", "Subquery", plan)
    # temp/checkpoint paths vary per run
    plan = re.sub(r"/tmp/[^\s,\]]+", "/tmp/...", plan)
    plan = re.sub(r"spark-[0-9a-f-]{36}", "spark-...", plan)
    return plan


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "plans_dump.txt"
    import __spark_entry__ as E
    from sqlfeatureextraction_spark.session import get_spark

    spark = get_spark("plans", parallelism=8, shuffle_partitions=8)
    sections = []
    for name, fn in E.queries().items():
        if name in SKIP:
            continue
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            plan = normalize(buf.getvalue())
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {type(e).__name__}: {e}\n"
        sections.append(f"{'=' * 20} {name} {'=' * 20}\n{plan}")
        if name in HEADLINE:
            print(sections[-1])
    with open(out_path, "w") as f:
        f.write("\n".join(sections))
    print(f"wrote {len(sections)} plans to {out_path}")


if __name__ == "__main__":
    main()
