"""Serving-path load test — the locust analog (SURVEY §5.2).

The reference load-tests its /leaderboard endpoint with locust
(`reference/test/utils/load_testing.py:1-9`). The Spark-side analog:
fire a mixed request load (leaderboard top-k + cursor-paged reads —
the two serving shapes every endpoint reduces to) from N concurrent
threads against one SparkSession in FAIR-scheduler mode, and report
latency percentiles + QPS.

Usage: python tools/loadtest.py [sf_dir] [threads] [requests_per_thread]
Prints ONE JSON line:
  {"metric": "serving_load", "qps": ..., "p50_ms": ..., "p95_ms": ...,
   "p99_ms": ..., "n_requests": ..., "threads": ...}
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stakehouse_etl_spark.queries.catalog import QUERIES  # noqa: E402
from stakehouse_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_reqs = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    # FAIR mode must be set before the context starts — concurrent
    # requests then share executors instead of FIFO head-of-line
    # blocking (the serving-cluster configuration).
    spark = get_spark(
        "loadtest", extra_conf={"spark.scheduler.mode": "FAIR"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Request mix: leaderboard (W4 top-k) and cursor page (O2) — warm
    # once so the measurement excludes first-plan codegen.
    mix = [QUERIES["w4_top7_customers"].fn, QUERIES["o2_pagination"].fn]
    for fn in mix:
        fn(spark, sf_dir).collect()

    latencies: list[float] = []
    lock = threading.Lock()

    def worker(tid: int) -> None:
        for i in range(n_reqs):
            fn = mix[(tid + i) % len(mix)]
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            dt = (time.perf_counter() - t0) * 1000
            with lock:
                latencies.append(dt)

    t_start = time.perf_counter()
    threads = [
        threading.Thread(target=worker, args=(t,)) for t in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    latencies.sort()

    def pct(p: float) -> float:
        return round(latencies[min(len(latencies) - 1, int(p * len(latencies)))], 1)

    print(
        json.dumps(
            {
                "metric": "serving_load",
                "qps": round(len(latencies) / wall, 1),
                "p50_ms": pct(0.50),
                "p95_ms": pct(0.95),
                "p99_ms": pct(0.99),
                "n_requests": len(latencies),
                "threads": n_threads,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
