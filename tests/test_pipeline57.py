"""Wave-57 invariant: Kruskal-Wallis against scipy-free naive ranks."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"

_SEGS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def test_kruskal_wallis_matches_naive(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    m = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    cents = (m.o_totalprice * 100 + 0.5).apply(math.floor)
    df = pd.DataFrame({"v": cents, "g": m.c_mktsegment})
    ranks = df.v.rank(method="average")
    n = len(df)
    terms = 0.0
    for s in _SEGS:
        rs = ranks[df.g == s]
        terms += rs.sum() ** 2 / len(rs)
    h = 12.0 * terms / (n * (n + 1)) - 3 * (n + 1)
    ties = Counter(df.v)
    tie_sum = sum(t**3 - t for t in ties.values())
    h_c = h / (1 - tie_sum / (n**3 - n))
    r = QUERIES["ml_kruskal_wallis"].fn(spark, SF).collect()[0]
    assert r["n"] == n
    assert r["tie_sum"] == tie_sum
    assert sum(r[f"n_{s}"] for s in _SEGS) == n
    assert abs(r["h_corrected_micro"] / 1e6 - h_c) < 1e-4
    assert r["h_corrected_micro"] >= 0
