"""Wave-67 invariants: SLA monotonicity and ground truth, PSI
conservation and sign."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_sla_ground_truth(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    lag = (
        (m.l_shipdate - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        - (m.o_orderdate - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    ) // 86400000000
    r = QUERIES["ts_ship_lag_sla"].fn(spark, SF).collect()[0]
    assert r["n"] == len(m)
    assert r["within_30d"] == int((lag <= 30).sum())
    assert r["within_30d"] <= r["within_60d"] <= r["within_90d"] <= r["n"]
    assert r["sla60_attainment"] == r["within_60d"] / r["n"]
    assert (r["min_lag"], r["max_lag"]) == (int(lag.min()), int(lag.max()))


def test_psi_bands_conserve_and_bound(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    out = QUERIES["ml_psi_stability"].fn(spark, SF).collect()
    assert sum(r["a"] + r["b"] for r in out) == len(orders)
    assert abs(sum(r["share_a"] for r in out) - 1.0) < 1e-12
    assert abs(sum(r["share_b"] for r in out) - 1.0) < 1e-12
    total_psi = 0
    for r in out:
        if r["psi_contrib_nano"] is not None:
            # each contribution is non-negative: (x-y)·ln(x/y) >= 0
            assert r["psi_contrib_nano"] >= -1  # floor slack
            total_psi += r["psi_contrib_nano"]
            expect = (r["share_a"] - r["share_b"]) * math.log(
                r["share_a"] / r["share_b"]
            )
            assert abs(r["psi_contrib_nano"] - math.floor(expect * 1e9)) <= 1
    assert total_psi >= 0
