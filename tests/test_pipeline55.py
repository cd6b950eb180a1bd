"""Wave-55 invariants: coverage-curve monotonicity and ground truth,
RFM quintile balance."""

from __future__ import annotations

from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_vocab_coverage_ground_truth(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    counts = Counter(w for t in docs.text for w in t.split(" ") if w)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    out = {r["vocab_size"]: r for r in QUERIES["corpus_vocab_coverage_curve"].fn(spark, SF).collect()}
    assert set(out) == {5, 10, 20, 30}
    prev = 0
    for m in (5, 10, 20, 30):
        covered = sum(c for _, c in ranked[:m])
        r = out[m]
        assert r["tokens_covered"] == covered
        assert r["tokens_total"] == total
        assert r["coverage"] == covered / total
        assert r["tokens_covered"] >= prev  # monotone in vocab size
        prev = r["tokens_covered"]


def test_rfm_quintiles_balanced(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    n_cust = orders.o_custkey.nunique()
    out = QUERIES["ts_rfm_segmentation"].fn(spark, SF).collect()
    assert sum(r["n_customers"] for r in out) == n_cust
    for axis in ("r_score", "f_score", "m_score"):
        marg = Counter()
        for r in out:
            marg[r[axis]] += r["n_customers"]
        assert set(marg) <= {1, 2, 3, 4, 5}
        # quintiles differ by at most 1 customer
        assert max(marg.values()) - min(marg.values()) <= 1
