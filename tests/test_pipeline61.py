"""Wave-61 invariants: DiD cell identity, EB shrinkage direction and
bounds."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_did_matches_cell_means(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    m = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    m = m[m.c_mktsegment.isin(["BUILDING", "MACHINERY"])]
    us = (m.o_orderdate - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    # midpoint over ALL orders (matches the query's span CTE)
    all_us = (orders.o_orderdate - pd.Timestamp(0)) // pd.Timedelta(
        microseconds=1
    )
    mid = (int(all_us.min()) + int(all_us.max())) // 2
    m = m.assign(
        post=us >= mid,
        treat=m.c_mktsegment == "BUILDING",
        cents=(m.o_totalprice * 100 + 0.5).apply(math.floor),
    )
    cells = m.groupby(["treat", "post"]).cents.mean()
    did = (cells[(True, True)] - cells[(True, False)]) - (
        cells[(False, True)] - cells[(False, False)]
    )
    r = QUERIES["ml_diff_in_diff"].fn(spark, SF).collect()[0]
    assert r["n_total"] == len(m)
    assert math.isclose(r["t_post"], cells[(True, True)], rel_tol=1e-12)
    assert math.isclose(r["did_cents"], did, rel_tol=1e-9, abs_tol=1e-6)


def test_eb_shrinks_toward_grand_mean(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["ml_eb_shrunk_means"].fn(spark, SF).collect()
    assert len(out) == 25
    total_n = sum(r["n"] for r in out)
    mu0 = sum(r["raw_mean_kc"] * r["n"] for r in out) / total_n
    for r in out:
        shrunk = r["shrunk_mean_milli_kc"] / 1000
        raw = r["raw_mean_kc"]
        # shrinkage moves every group mean TOWARD the grand mean and
        # never past it
        lo, hi = sorted((raw, mu0))
        assert lo - 1e-3 <= shrunk <= hi + 1e-3
