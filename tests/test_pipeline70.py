"""Wave-70 invariants: WAPE/bias identities, ECE replay."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_wape_bias_identities(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    r = QUERIES["ts_forecast_wape_bias"].fn(spark, SF).collect()[0]
    assert r["wape"] == r["sum_abs_err"] / r["sum_actual"]
    assert r["bias"] == r["sum_err"] / r["sum_actual"]
    assert abs(r["sum_err"]) <= r["sum_abs_err"]  # triangle inequality
    assert r["wape"] >= abs(r["bias"])
    # same scored-day count as the MASE kernel's 7-lag window
    mase = QUERIES["ts_mase_seasonal_naive"].fn(spark, SF).collect()[0]
    assert r["n"] == mase["n7"]
    assert r["sum_abs_err"] == mase["mae7_num"]


def test_ece_replay(spark):
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
    n_total = len(test)
    ece = 0
    for seg, grp in test.groupby("c_mktsegment"):
        conf = rates.loc[seg, "sum"] / rates.loc[seg, "count"]
        acc = grp.y.mean()
        ece += math.floor(abs(acc - conf) * len(grp) * 1e9 / n_total)
    r = QUERIES["ml_ece_score"].fn(spark, SF).collect()[0]
    assert r["n_test"] == n_total
    assert r["n_bins"] == test.c_mktsegment.nunique()
    assert r["ece_nano"] == ece
    assert 0 <= r["ece_nano"] <= 1_000_000_000
