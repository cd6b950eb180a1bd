"""Wave-53 invariants: P/R curve monotonicity and identities, filter
attribution conservation."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_pr_curve_monotone_identities(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = sorted(
        QUERIES["ml_pr_curve_at_k"].fn(spark, SF).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in out] == list(range(1, 11))
    tps = [r["tp"] for r in out]
    assert tps == sorted(tps)  # cumulative tp is non-decreasing
    for r in out:
        assert r["precision_at_k"] == r["tp"] / (r["k"] * 50)
        assert r["recall_at_k"] == r["tp"] / r["total_rel"]
        assert 0.0 <= r["precision_at_k"] <= 1.0
        assert 0.0 <= r["recall_at_k"] <= 1.0
    # recall is non-decreasing in k
    recs = [r["recall_at_k"] for r in out]
    assert recs == sorted(recs)


def test_filter_attribution_conserves_corpus(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    out = QUERIES["corpus_filter_attribution"].fn(spark, SF).collect()
    assert sum(r["n_docs"] for r in out) == len(docs)
    cells = {(r["pass_quality"], r["pass_dedup"]): r["n_docs"] for r in out}
    n_quality = sum(
        n for (q, _), n in cells.items() if q
    )
    assert n_quality == int((docs.n_chars >= 250).sum())
