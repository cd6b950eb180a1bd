"""Wave-62 invariants: F1 identities and confusion-cell conservation."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_f1_identities(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    out = QUERIES["ml_f1_per_class"].fn(spark, SF).collect()
    assert {r["lang"] for r in out} == set(docs.lang.unique())
    # TP+FN per class = class support; Σ(TP+FN) = corpus size
    assert sum(r["tp"] + r["fn"] for r in out) == len(docs)
    for r in out:
        assert r["tp"] + r["fn"] == int((docs.lang == r["lang"]).sum())
        if r["precision"] is not None and r["recall"] is not None:
            p, rc = r["precision"], r["recall"]
            if p + rc > 0:
                assert abs(r["f1"] - 2 * p * rc / (p + rc)) < 1e-12
            assert 0.0 <= r["f1"] <= 1.0
