"""Vendor the APM golden-corpus fixture from the reference's own
artifacts (run once; output is committed).

Sources (all public, read-only):
  - test corpus: /root/reference/SQLFeatureExtraction/
      src/test/java/sql/clickhouse/queryintent_test.txt
      (5 lines `Session <id>, Query <epoch>; OrigQuery:<sql>;<bits>`;
      4911-bit window vectors, one malformed 26-bit line)
  - schema vocabulary: input/ApmColBitPos.txt (327 table.col -> bitpos
    entries, 11 tables)

The corpus vectors decode EXACTLY (verified bit-for-bit, see
tests/test_apm_golden.py) against the 3-table sub-vocabulary
{dwm_exception, dwm_request, dwm_user}: 16+41+38 = 95 columns with
dwm_request at global bit offset 16 — initially reverse-engineered as
the unique 3-table combination of the published schema matching the
observed bit positions, and since CONFIRMED identical to the
reference's own published 3-table config
(input/table/3/ApmColBitPos.txt, 95 entries — byte-for-byte the same
column/bit assignment).  The candidate-table (tablesIntent) order is
dwm_request:0, dwm_exception:1, dwm_user:2 — the hardcoded
candidateTopTables of APMWindowFragmentIntent.main's topTabN==3
branch (:521-527), which OVERRIDES the different order in
input/table/3/ApmTables.txt (dwm_exception:0) and is the one the
corpus Session ids and tablesIntent bits were generated with.
Window layout: tablesIntent(3) + 3 slots x topQueryN(2) x
queryIntent(818), queryIntent = time(31) + 8x95 col segments +
timeOffset(9) + timeRange(9) + granularity(9) = 818;
total 3 + 3*2*818 = 4911.
"""

import json
import os
import re

REF = "/root/reference/SQLFeatureExtraction"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

GOLDEN_TABLES = ["dwm_exception", "dwm_request", "dwm_user"]


def main() -> None:
    cols: dict[str, list[str]] = {}
    for ln in open(f"{REF}/input/ApmColBitPos.txt"):
        fc = ln.split(":")[0].strip()
        t, c = fc.split(".")
        if t in GOLDEN_TABLES:
            cols.setdefault(t, []).append(c)

    lines = []
    pat = re.compile(r"Session (\d+), Query (\d+); OrigQuery:(.*);([01]+)\s*$")
    for ln in open(
        f"{REF}/src/test/java/sql/clickhouse/queryintent_test.txt"
    ):
        m = pat.match(ln)
        assert m, ln[:80]
        lines.append(
            {
                "session": int(m.group(1)),
                "epoch": int(m.group(2)),
                "sql": m.group(3),
                "bits": m.group(4),
            }
        )

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "apm_golden.json"), "w") as f:
        json.dump(
            {
                "candidate_tables": ["dwm_request", "dwm_exception", "dwm_user"],
                "schema_columns": cols,
                "top_query_n": 2,
                "lines": lines,
            },
            f,
            indent=1,
        )
    widths = {t: len(c) for t, c in cols.items()}
    print("columns per table:", widths, "total", sum(widths.values()))
    print("lines:", [(l["epoch"], len(l["bits"])) for l in lines])


if __name__ == "__main__":
    main()
