"""Wave-51 invariants: nDCG bounds/identities, clustering-coefficient
ground truth by brute force."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"

_DISC = [1 / math.log2(r + 1) for r in range(1, 11)]


def test_ndcg_bounds_and_perfect_case(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["ml_ndcg_at_10"].fn(spark, SF).collect()
    assert len(out) == 50
    for r in out:
        assert 0 <= r["hits"] <= 10
        assert 0 <= r["ndcg_micro"] <= 1_000_000
        if r["hits"] == 0:
            assert r["dcg_micro"] == 0 and r["ndcg_micro"] == 0
        if r["hits"] == 10:
            # all hits => dcg == idcg => ndcg == 1 exactly
            assert r["ndcg_micro"] == 1_000_000
        # dcg bounded by the ideal prefix for the hit count
        ideal = sum(_DISC[: r["hits"]])
        assert r["dcg_micro"] <= math.floor(ideal * 1e6) + 1


def test_clustering_coeff_brute_force(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    from collections import defaultdict

    baskets = defaultdict(set)
    for r in li.itertuples():
        baskets[int(r.l_orderkey)].add(int(r.l_partkey))
    pair_cnt: dict[tuple[int, int], int] = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                pair_cnt[(u, v)] += 1
    edges = {p for p, c in pair_cnt.items() if c >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    out = QUERIES["graph_clustering_coeff"].fn(spark, SF).collect()
    for r in out:
        n = r["node"]
        nbrs = adj[n]
        assert r["degree"] == len(nbrs)
        tris = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and (min(a, b), max(a, b)) in edges
        )
        assert r["triangles"] == tris
        assert r["coeff"] == 2 * tris / (len(nbrs) * (len(nbrs) - 1))
        assert 0.0 <= r["coeff"] <= 1.0
