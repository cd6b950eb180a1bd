"""Wave-47 invariants: Shapley efficiency property, HITS recurrence
by hand, keyness cell-count consistency."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_shapley_efficiency_property(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    region = pd.read_parquet(f"{SF}/region.parquet")
    m = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )
    m = m.assign(cents=(m.o_totalprice * 100 + 0.5).apply(math.floor))
    v0 = m.cents.mean()
    out = QUERIES["ml_shapley_two_feature"].fn(spark, SF).collect()
    for r in out:
        cell = m[(m.c_mktsegment == r["seg"]) & (m.r_name == r["reg"])]
        v12 = cell.cents.mean()
        # efficiency: phi_seg + phi_reg == v(both) - v(empty)
        assert math.isclose(
            r["phi_seg"] + r["phi_reg"], v12 - v0, rel_tol=1e-9, abs_tol=1e-6
        )
        assert r["n"] == len(cell)


def test_hits_recurrence_by_hand(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    h1 = li.groupby("l_orderkey").size()
    a1 = li.merge(h1.rename("h"), left_on="l_orderkey", right_index=True).groupby(
        "l_partkey"
    )["h"].sum()
    h2 = li.merge(a1.rename("a"), left_on="l_partkey", right_index=True).groupby(
        "l_orderkey"
    )["a"].sum()
    a2 = li.merge(h2.rename("h2"), left_on="l_orderkey", right_index=True).groupby(
        "l_partkey"
    )["h2"].sum()
    amax = int(a2.max())
    top = sorted(
        ((int(v), int(k)) for k, v in a2.items()), key=lambda t: (-t[0], t[1])
    )[:20]
    out = QUERIES["graph_hits_2iter"].fn(spark, SF).collect()
    assert [(r["authority2"], r["part"]) for r in out] == top
    for r in out:
        assert r["authority_norm"] == r["authority2"] / amax


def test_keyness_cells_consistent(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["text_keyness_llr"].fn(spark, SF).collect()
    assert len(out) == 25
    scores = [r["g2_micro"] for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        assert r["in_en"] + r["in_rest"] == r["total"]
        assert r["g2_micro"] >= 0  # G² is non-negative
