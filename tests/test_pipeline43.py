"""Wave-43 invariants: assortativity/modularity bounds and identity
checks, CUPED equals the closed-form moment algebra recomputed in
Python."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_assortativity_in_range(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    row = QUERIES["graph_assortativity"].fn(spark, SF).collect()[0]
    assert -1.0 <= row["assortativity"] <= 1.0
    # endpoint-degree sums are symmetric over the directed edge list
    assert row["n"] > 0 and row["sx"] > 0


def test_modularity_bounds_and_identity(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    row = QUERIES["graph_modularity"].fn(spark, SF).collect()[0]
    # Q in [-1/2, 1) always; q must equal the integer ratio exactly.
    assert -0.5 <= row["q"] < 1.0
    assert row["q"] == row["q_num"] / (4 * row["m"] * row["m"])
    assert row["n_communities"] >= 1


def test_cuped_matches_python_moments(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    us = orders.o_orderdate.astype("int64") // 1000
    mid = (int(us.min()) + int(us.max())) // 2
    cents = (orders.o_totalprice * 100 + 0.5).apply(math.floor)
    pre = (
        cents.where(us < mid, 0).groupby(orders.o_custkey).sum().astype(int)
        // 1000
    )
    post = (
        cents.where(us >= mid, 0).groupby(orders.o_custkey).sum().astype(int)
        // 1000
    )
    seg = cust.set_index("c_custkey").c_mktsegment
    rows = [
        (1 if seg[k] == "BUILDING" else 0, int(pre[k]), int(post[k]))
        for k in pre.index
        if seg.get(k) in ("BUILDING", "MACHINERY")
    ]
    n = len(rows)
    sx = sum(x for _, x, _ in rows)
    sy = sum(y for *_, y in rows)
    sxy = sum(x * y for _, x, y in rows)
    sxx = sum(x * x for _, x, _ in rows)
    nt = sum(t for t, *_ in rows)
    sxt = sum(t * x for t, x, _ in rows)
    syt = sum(t * y for t, _, y in rows)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    raw = syt / nt - (sy - syt) / (n - nt)
    adj = raw - theta * (sxt / nt - (sx - sxt) / (n - nt))
    got = QUERIES["ml_cuped_adjustment"].fn(spark, SF).collect()[0]
    assert (got["n"], got["nt"]) == (n, nt)
    assert math.isclose(got["theta"], theta, rel_tol=1e-12)
    assert math.isclose(got["raw_diff"], raw, rel_tol=1e-12)
    assert math.isclose(got["adj_diff"], adj, rel_tol=1e-9)
