"""Wave-42 invariants: BMP histogram conservation, stopword cutoff
exactness, weighted-median defining property."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_bmp_histogram_conserves_pixels(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    total_px = sum(
        (4 + int(i) % 5) * (3 + int(i) % 4) for i in docs.doc_id
    )
    out = QUERIES["mm_bmp_histogram"].fn(spark, SF).collect()
    assert {r["bin"] for r in out} <= set(range(16))
    for ch in ("r_cnt", "g_cnt", "b_cnt"):
        assert sum(r[ch] for r in out) == total_px  # every pixel lands once


def test_stopword_cutoff_exact(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n_docs = len(docs)
    df: dict[str, int] = {}
    for text in docs.text:
        for w in {w for w in text.split(" ") if w}:
            df[w] = df.get(w, 0) + 1
    out = QUERIES["text_stopword_discovery"].fn(spark, SF).collect()
    assert len(out) == len(df)
    for r in out:
        assert r["df"] == df[r["word"]]
        assert r["is_stop"] == (r["df"] * 100 >= n_docs * 60)
        assert math.isclose(r["df_ratio"], r["df"] / n_docs)


def test_weighted_median_defining_property(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li.assign(
        cents=(li.l_extendedprice * 100 + 0.5).apply(math.floor),
        w=(li.l_quantity + 0.5).apply(math.floor),
    )
    out = {r["rf"]: r for r in QUERIES["a_weighted_median"].fn(spark, SF).collect()}
    for rf, grp in li.groupby("l_returnflag"):
        r = out[rf]
        total = int(grp.w.sum())
        assert r["total_w"] == total
        m = r["median_cents"]
        below = int(grp[grp.cents < m].w.sum())
        at_or_below = int(grp[grp.cents <= m].w.sum())
        # defining property of the lower weighted median
        assert 2 * below < total <= 2 * at_or_below
