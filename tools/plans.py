"""Physical-plan audit over the bench-flagged queries.

Prints one line per query: shuffle-exchange count, broadcast count,
whole-stage-codegen span count, scan pushdown evidence, and flags for
cartesian products / unpartitioned row-data windows — the numbers the
100 TB design review cares about. tests/test_plan_shapes.py pins the
critical ones; this tool regenerates the full table for PLANS.md.

Usage: python tools/plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stakehouse_etl_spark.queries.catalog import QUERIES  # noqa: E402
from stakehouse_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    print("| query | shuffles | broadcasts | pushdown | flags |")
    print("|---|---|---|---|---|")
    for name, q in QUERIES.items():
        if not q.bench:
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover - audit tool
            print(f"| {name} | ERROR: {type(e).__name__} | | | |")
            continue
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        n_bc = len(re.findall(r"BroadcastExchange", plan))
        pushed = "yes" if "PushedFilters: [" in plan and not re.search(
            r"PushedFilters: \[\]", plan
        ) else "-"
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        # unpartitioned window over row data shows as a Sort+Window with
        # a single-partition Exchange (SinglePartition)
        if "SinglePartition" in plan and "Window" in plan:
            flags.append("1-part-window?")
        print(
            f"| {name} | {n_ex} | {n_bc} | {pushed} | "
            f"{','.join(flags) or '-'} |"
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
