"""Empirical scale-ladder evidence.

Runs a set of headline queries at sf0.001 / sf0.01 / sf0.1 (100× data
growth end-to-end) and reports per-query wall time at each rung plus
the growth ratio sf0.1/sf0.01 (a 10× data step). A query whose time
grows far slower than data size is dominated by fixed scheduling
overhead at these scales; one whose growth ratio approaches or
exceeds the data ratio is the one to watch at 1000 executors — this
is the measurement the 100-TB design notes in PLANS.md lean on.

Usage: python tools/scaling.py [query ...]
Prints one JSON line: {"queries": {name: {"sf0.001": s, ...,
"ratio_10x": r}}, "rungs": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stakehouse_etl_spark.queries.catalog import QUERIES  # noqa: E402
from stakehouse_etl_spark.caches import release_tracked  # noqa: E402
from stakehouse_etl_spark.session import get_spark  # noqa: E402

RUNGS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DEFAULT = [
    "w1_user_income",
    "j3_order_lineitem_agg",
    "a1_pricing_summary",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "pipeline_corpus_clean",
    "tpch_q3_shipping_priority",
    "text_bm25_topk",
]


def main(argv: list[str]) -> int:
    names = argv or DEFAULT
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict[str, float]] = {}
    for sf_dir in RUNGS:
        key = os.path.basename(sf_dir)
        for name in names:
            q = QUERIES[name]
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out.setdefault(name, {})[key] = round(time.perf_counter() - t0, 3)
            release_tracked()
            spark.catalog.clearCache()
    for name, row in out.items():
        if row.get("sf0.01") and row.get("sf0.1"):
            row["ratio_10x"] = round(row["sf0.1"] / row["sf0.01"], 2)
    print(json.dumps({"queries": out, "rungs": RUNGS}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
