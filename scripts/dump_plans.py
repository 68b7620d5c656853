"""Dump formatted physical plans for the headline operators (PLANS.md
evidence). Usage: python scripts/dump_plans.py [sf_dir]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as E
    from sqlfeatureextraction_spark.session import get_spark

    spark = get_spark("plans", parallelism=8, shuffle_partitions=8)
    for name in [
        "transcript_window_features",
        "transcript_wf_merge",
        "group_agg",
        "pit_window_sum",
        "asof_join_orders",
    ]:
        print(f"\n{'=' * 20} {name} {'=' * 20}")
        E.queries()[name](spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
