"""Workload counts for the span-dedup family (VERDICT r10 task 4).

The r10 refresh left one watch cell: ``dedup_span_inventory`` uniform
sf30 wall ratio 4.01 on a 3.0x data step. The r9 adjudication for
``corpus_span_scrub`` showed the SATURATED-vocabulary fixtures grow
the occ-row workload (positions whose gram is duplicated across >= 2
docs) faster than the data step — but that count was measured for the
scrub query's workload, not this one's. This tool pins THIS query's
workload terms per rung so the wall ratio can be judged against the
workload ratio instead of the raw data ratio:

  n_docs        documents
  n_tokens      total token positions (sum of len(toks))
  n_gram_rows   exploded positional k-gram rows (the shuffle input)
  n_dup_grams   distinct grams occurring in >= 2 distinct docs
  n_occ_rows    positions covered by a duplicated gram (island input)
  n_span_rows   merged maximal spans (island output)

Counts are computed with the query's own operators
(``_positional_grams`` / ``_merge_islands`` from queries/pipeline73)
so they measure the actual plan's row volumes, not a re-derivation.

Usage: python tools/span_workload.py [rung_dir ...]
  default: localdata/sf10 localdata/sf30. Prints ONE JSON line with
  per-rung counts and pairwise growth ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from stakehouse_etl_spark.io.sources import load_table  # noqa: E402
from stakehouse_etl_spark.queries.pipeline73 import (  # noqa: E402
    _merge_islands,
    _positional_grams,
)
from stakehouse_etl_spark.session import get_spark  # noqa: E402


def counts_for(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    t, g = _positional_grams(docs)
    t = t.persist()
    g = g.persist()
    try:
        rec = {
            "n_docs": t.count(),
            "n_tokens": t.agg(
                F.sum(F.size("toks")).cast("long")
            ).collect()[0][0],
            "n_gram_rows": g.count(),
        }
        dup = (
            g.groupBy("gram")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("gram")
        )
        rec["n_dup_grams"] = dup.count()
        occ = g.join(dup.hint("MERGE"), "gram").select("doc_id", "pos")
        occ = occ.persist()
        rec["n_occ_rows"] = occ.count()
        rec["n_span_rows"] = _merge_islands(occ).count()
        occ.unpersist()
        return rec
    finally:
        t.unpersist()
        g.unpersist()


def main(argv: list[str]) -> int:
    rungs = argv or [
        os.path.join(REPO, "localdata", "sf10"),
        os.path.join(REPO, "localdata", "sf30"),
    ]
    spark = get_spark("span_workload")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"rungs": {}}
    for rung in rungs:
        t0 = time.perf_counter()
        out["rungs"][os.path.basename(rung)] = counts_for(spark, rung)
        out["rungs"][os.path.basename(rung)]["count_wall_s"] = round(
            time.perf_counter() - t0, 1
        )
    names = [os.path.basename(r) for r in rungs]
    for a, b in zip(names, names[1:]):
        ra, rb = out["rungs"][a], out["rungs"][b]
        out[f"growth_{b}_over_{a}"] = {
            k: round(rb[k] / ra[k], 3)
            for k in (
                "n_docs",
                "n_tokens",
                "n_gram_rows",
                "n_dup_grams",
                "n_occ_rows",
                "n_span_rows",
            )
            if ra.get(k)
        }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
