"""Wave-40 invariants: SNM candidate linearity and Jaccard exactness,
HHI bounds, threshold-sweep monotonicity."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_snm_pairs_verified_and_bounded(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    wordsets = {
        r.doc_id: {w for w in r.text.split(" ") if w}
        for r in docs.itertuples()
    }
    out = QUERIES["dedup_snm_pairs"].fn(spark, SF).collect()
    assert out
    for r in out:
        sa, sb = wordsets[r["a"]], wordsets[r["b"]]
        common = len(sa & sb)
        union = len(sa | sb)
        assert r["n_common"] == common
        assert (r["size_a"], r["size_b"]) == (len(sa), len(sb))
        assert r["jaccard"] == common / union
        assert 2 * common >= union  # the >= 1/2 cutoff held exactly


def test_snm_candidate_budget_linear(spark):
    # The blocking stage must generate at most 2N candidate pairs.
    from stakehouse_etl_spark.io.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    n = docs.count()
    # Re-derive the candidate count with the same window recipe.
    from pyspark.sql import Window

    key = F.substring(F.regexp_replace(F.lower("text"), " ", ""), 1, 16)
    d = docs.select(
        "doc_id",
        key.alias("k"),
        F.substring(F.regexp_replace(F.lower("text"), " ", ""), 1, 4).alias("blk"),
    )
    win = Window.partitionBy("blk").orderBy("k", "doc_id")
    w = d.select(
        F.lead("doc_id", 1).over(win).alias("n1"),
        F.lead("doc_id", 2).over(win).alias("n2"),
    )
    n_cand = w.agg(
        (
            F.sum(F.col("n1").isNotNull().cast("long"))
            + F.sum(F.col("n2").isNotNull().cast("long"))
        ).alias("c")
    ).collect()[0]["c"]
    assert n_cand <= 2 * n


def test_hhi_bounds(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["a_hhi_concentration"].fn(spark, SF).collect()
    assert out
    for r in out:
        # 1/n <= HHI <= 1 for any distribution over n customers.
        assert 1.0 / r["n_cust"] <= r["hhi"] + 1e-9
        assert r["hhi"] <= 1.0
        assert r["sumsq"] <= r["total_kc"] * r["total_kc"]


def test_threshold_sweep_monotone(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["dedup_threshold_sweep"].fn(spark, SF).collect()
    assert [r["pct"] for r in out] == [50, 60, 70, 80, 90]
    counts = [r["n_pairs"] for r in out]
    # Raising the cutoff can only shrink the surviving set.
    assert counts == sorted(counts, reverse=True)
