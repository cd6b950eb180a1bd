"""Wave-36 invariants: Spearman against a naive pandas-rank
reimplementation, LPA label-domain properties, MASE identity, and the
uniqueness profile against direct distinct counts."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


def test_spearman_matches_pandas_rank_corr(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    spend = (
        orders.assign(cents=orders.o_totalprice.map(_cents))
        .groupby("o_custkey")["cents"]
        .sum()
    )
    m = cust.merge(spend.rename("s_cents"), left_on="c_custkey", right_index=True)
    rx = m.c_acctbal.map(_cents).rank(method="average")
    ry = m.s_cents.rank(method="average")
    expected = rx.corr(ry)  # Pearson of average ranks == Spearman
    row = QUERIES["ml_spearman_rho"].fn(spark, SF).collect()[0]
    assert row["n"] == len(m)
    assert abs(row["rho"] - expected) < 1e-9
    assert -1.0 <= row["rho"] <= 1.0


def test_lpa_round_properties(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["graph_lpa_round"].fn(spark, SF).collect()
    nodes = {r["node"] for r in out}
    for r in out:
        # Round-1 labels are neighbor ids, so they live in the node set;
        # round-2 labels are round-1 labels of neighbors — still nodes.
        assert r["label1"] in nodes
        assert r["label2"] in nodes
    # Propagation can only coarsen: round-2 has at most round-1's labels.
    assert len({r["label2"] for r in out}) <= len({r["label1"] for r in out})


def test_mase_identity(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    row = QUERIES["ts_mase_seasonal_naive"].fn(spark, SF).collect()[0]
    # Spine of d days yields exactly d-7 and d-1 scored lags.
    assert row["n1"] - row["n7"] == 6
    assert row["mase"] == (row["mae7_num"] * row["n1"]) / (
        row["mae1_num"] * row["n7"]
    )


def test_uniqueness_profile_matches_direct(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    rows = {r["combo"]: r for r in QUERIES["dq_uniqueness_profile"].fn(spark, SF).collect()}
    assert rows["o_orderkey"]["n_distinct"] == orders.o_orderkey.nunique()
    assert rows["o_orderkey"]["is_key"] == (
        orders.o_orderkey.nunique() == len(orders)
    )
    assert (
        rows["o_custkey+o_orderdate"]["n_distinct"]
        == orders[["o_custkey", "o_orderdate"]].drop_duplicates().shape[0]
    )
    for r in rows.values():
        assert r["n_rows"] == len(orders)
        assert 0.0 < r["uniqueness"] <= 1.0


def test_variant_extract_matches_json_path(spark):
    import json

    from stakehouse_etl_spark.queries.catalog import QUERIES

    events = pd.read_parquet(f"{SF}/events.parquet")
    ks = events.props.map(lambda s: json.loads(s).get("k"))
    ks = ks.dropna().astype(int)
    bands = ks.floordiv(10).value_counts()
    out = {r["band"]: r for r in QUERIES["f14_variant_extract"].fn(spark, SF).collect()}
    assert set(out) == set(bands.index)
    for band, r in out.items():
        sub = ks[ks // 10 == band]
        assert r["n"] == len(sub)
        assert r["sum_k"] == int(sub.sum())
        assert (r["min_k"], r["max_k"]) == (int(sub.min()), int(sub.max()))
