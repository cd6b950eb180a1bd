"""Wave-64 invariants: Adamic-Adar non-edges and weight ground truth,
Brier bounds vs always-base-rate."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

SF = "/root/testdata/sf0.001"


def _graph(docs_path=f"{SF}/lineitem.parquet"):
    li = pd.read_parquet(docs_path)[["l_orderkey", "l_partkey"]].drop_duplicates()
    baskets = defaultdict(set)
    for r in li.itertuples():
        baskets[int(r.l_orderkey)].add(int(r.l_partkey))
    pc = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                pc[(u, v)] += 1
    edges = {p for p, c in pc.items() if c >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return edges, adj


def test_adamic_adar_ground_truth(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    edges, adj = _graph()
    out = QUERIES["graph_adamic_adar"].fn(spark, SF).collect()
    assert out
    for r in out:
        x, y = r["x"], r["y"]
        assert x < y
        assert (x, y) not in edges  # candidate links only
        common = [z for z in adj[x] & adj[y] if len(adj[z]) >= 2]
        assert r["n_common"] == len(common)
        aa = sum(math.floor(1e6 / math.log(len(adj[z]))) for z in common)
        assert r["aa_micro"] == aa
    scores = [r["aa_micro"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_brier_beats_coin_and_matches_naive(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    m = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    m = m.assign(
        y=m.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(int),
        train=m.o_orderkey % 2 == 1,
    )
    rates = m[m.train].groupby("c_mktsegment").y.agg(["sum", "count"])
    test = m[~m.train]
    total = 0
    for r in test.itertuples():
        p = rates.loc[r.c_mktsegment, "sum"] / rates.loc[r.c_mktsegment, "count"]
        total += math.floor((p - r.y) ** 2 * 1e9)
    row = QUERIES["ml_brier_score"].fn(spark, SF).collect()[0]
    assert row["n_test"] == len(test)
    assert row["sum_se_nano"] == total
    assert 0.0 <= row["brier"] <= 0.25 + 1e-9  # no worse than p=0.5 coin
