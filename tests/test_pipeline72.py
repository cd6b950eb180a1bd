"""Wave-72 invariant: CAGR against a naive pandas replay."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cagr_replay(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    mk = orders.o_orderdate.dt.year * 100 + orders.o_orderdate.dt.month
    cents = (orders.o_totalprice * 100 + 0.5).apply(math.floor)
    rev = cents.groupby(mk).sum().astype(int)
    n = len(rev)
    first, last = int(rev.loc[rev.index.min()]), int(rev.loc[rev.index.max()])
    cagr = (last / first) ** (1 / (n - 1)) - 1
    r = QUERIES["ts_cagr_monthly"].fn(spark, SF).collect()[0]
    assert r["n_months"] == n
    assert (r["first_cents"], r["last_cents"]) == (first, last)
    assert abs(r["cagr_micro"] - math.floor(cagr * 1e6)) <= 1
