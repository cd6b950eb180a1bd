"""Headline benchmark suite.

Runs the bench-flagged catalog queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is forced through the noop sink (full plan runs, nothing
collected to the driver) — the honest way to time a distributed plan.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stakehouse_etl_spark.queries.catalog import QUERIES  # noqa: E402
from stakehouse_etl_spark.caches import release_tracked  # noqa: E402
from stakehouse_etl_spark.session import get_spark  # noqa: E402

# The seven queries of the FIRST recorded bench run (BASELINE.md) — the
# 2×-of-baseline bound is defined against this fixed set, so the
# headline value stays comparable as the bench-flagged catalog grows.
HEADLINE = (
    "w1_user_income",
    "w2_income_epoch_hourly",
    "j1_latest_order_per_customer",
    "j2_region_acctbal_rollup",
    "j3_order_lineitem_agg",
    "j9_asof_last_signup",
    "a1_pricing_summary",
)


def run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on a trivial plan so query 1 isn't charged for it.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # OS page-cache warmup: one cheap pass over each input table so the
    # first query touching a file isn't charged for cold reads the later
    # ones don't pay (BASELINE.md r1 recorded a 9 s warm-vs-cold gap on
    # the same suite). count() reads footers + pages without shuffling.
    import glob as _glob

    for p in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        try:
            spark.read.parquet(p).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        if not q.bench:
            continue
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # Release per-query persists (shingle tables etc.) so one
        # query's cache doesn't distort the next query's timing.
        release_tracked()
        spark.catalog.clearCache()

    headline = round(sum(timings.get(n, 0.0) for n in HEADLINE), 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_headline_wall_sec",
                "value": headline,
                "unit": "sec",
                "queries": timings,
                "suite_total_sec": total,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    run()
