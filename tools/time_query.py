"""Median-of-N timing for a subset of catalog queries (bench methodology).

Same session, noop sink, warmup run excluded, per-query median over
SPARK_GRAFT_TIME_RUNS (default 5). For A/B during optimization work —
the committed pin stays bench.py's job.

Usage: python tools/time_query.py <query> [query ...] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stakehouse_etl_spark.queries.catalog import QUERIES  # noqa: E402
from stakehouse_etl_spark.caches import release_tracked  # noqa: E402
from stakehouse_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    runs = int(os.environ.get("SPARK_GRAFT_TIME_RUNS", "5"))
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def one(name: str) -> float:
        spark.sparkContext.setJobDescription(f"time:{name}")
        t0 = time.time()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        release_tracked()
        return dt

    out = {}
    for name in names:
        one(name)  # warmup (codegen, page cache)
        samples = [one(name) for _ in range(runs)]
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "min": round(min(samples), 3),
            "max": round(max(samples), 3),
            "runs": [round(s, 3) for s in samples],
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({n: v["median"] for n, v in out.items()}))


if __name__ == "__main__":
    main()
