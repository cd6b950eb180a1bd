"""Simulate the GRADING DRIVER's canonicalizer on catalog queries.

The r8 red row (`sim_pq_codebook`) was value-correct and green under
tools/check.py, yet failed externally: check.py's normalizer
stringifies object columns BEFORE sorting, while the driver lexsorts
the raw pandas frame — `sort_values` throws `TypeError: unhashable
type: 'list'` on array cells. This tool closes that gap: run catalog
queries at the given sf, convert to pandas, and apply the
driver-shaped canonicalization (column-name sort, then a raw
`sort_values` over all columns — NO type coercion). Any TypeError
here is a driver-red row waiting for the rotation.

Scope (VERDICT r9 #5): default is the FULL catalog at sf0.001, so no
future rotation can surface a driver-shaped output failure (any
non-sortable cell type, not just lists) the local gate can't see.
`--priority` restricts to the 50 DRIVER_PRIORITY rows — the r9
behavior — for a fast pre-rotation pass at sf0.01.

Usage: python tools/driver_canon_sim.py [--priority] [sf_dir] [query ...]
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
    priority_only = "--priority" in argv
    argv = [a for a in argv if a != "--priority"]
    sf_dir = (
        argv[0]
        if argv
        else ("/root/testdata/sf0.01" if priority_only else "/root/testdata/sf0.001")
    )
    names = argv[1:] or (
        list(DRIVER_PRIORITY) if priority_only else list(QUERIES)
    )
    spark = get_spark("canon_sim")
    spark.sparkContext.setLogLevel("ERROR")
    failures: dict[str, str] = {}
    for name in names:
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
    print(json.dumps({"n": len(names), "failures": failures}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
