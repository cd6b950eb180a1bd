"""Wave-59 invariants: histogram conservation, consistency audit
ground truth."""

from __future__ import annotations

from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cluster_histogram_conserves_docs(spark):
    import re

    from stakehouse_etl_spark.queries.catalog import QUERIES

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    fps = Counter(
        re.sub(r"\s+", " ", t.strip().lower()) for t in docs.text
    )
    sizes = Counter(fps.values())
    out = QUERIES["dedup_cluster_size_histogram"].fn(spark, SF).collect()
    assert {r["cluster_size"]: r["n_clusters"] for r in out} == dict(sizes)
    assert sum(r["n_docs_in_size"] for r in out) == len(docs)
    assert abs(sum(r["doc_share"] for r in out) - 1.0) < 1e-12


def test_crossfield_ground_truth(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    r = QUERIES["dq_crossfield_consistency"].fn(spark, SF).collect()[0]
    assert r["n_rows"] == len(docs)
    assert r["n_len_ok"] == int((docs.n_chars == docs.text.str.len()).sum())
    assert r["n_lang_ok"] == int(
        docs.lang.isin(["de", "en", "es", "fr", "zh"]).sum()
    )
    assert r["n_all_ok"] <= min(r["n_len_ok"], r["n_lang_ok"], r["n_nonempty"])
