"""Wave-63 invariants: VWAP ground truth, matching quality properties."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_vwap_ground_truth(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li.assign(
        mk=li.l_shipdate.dt.year * 100 + li.l_shipdate.dt.month,
        cents=(li.l_extendedprice * 100 + 0.5).apply(math.floor),
        qty=(li.l_quantity + 0.5).apply(math.floor),
    )
    out = {r["month_key"]: r for r in QUERIES["ts_vwap_monthly"].fn(spark, SF).collect()}
    for mk, grp in li.groupby("mk"):
        r = out[mk]
        pq = int((grp.cents * grp.qty).sum())
        q = int(grp.qty.sum())
        assert (r["cents_qty"], r["total_qty"]) == (pq, q)
        assert r["vwap_cents"] == pq / q


def test_caliper_matching_properties(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    m = cust[cust.c_mktsegment.isin(["BUILDING", "MACHINERY"])].merge(
        orders, left_on="c_custkey", right_on="o_custkey"
    )
    spend = (
        (m.o_totalprice * 100 + 0.5)
        .apply(math.floor)
        .groupby(m.c_custkey)
        .sum()
        .astype(int)
        // 1000
    )
    seg = cust.set_index("c_custkey").c_mktsegment
    treated = sorted(
        (int(spend[k]), int(k)) for k in spend.index if seg[k] == "BUILDING"
    )
    controls = sorted(
        (int(spend[k]), int(k)) for k in spend.index if seg[k] == "MACHINERY"
    )
    r = QUERIES["ml_caliper_match_att"].fn(spark, SF).collect()[0]
    assert r["n_treated"] == len(treated)
    assert 0 <= r["n_matched"] <= r["n_treated"]
    # every treated spend has SOME control within the caliper iff the
    # nearest control is within 100 kc — check the matched count
    ctrl_spends = [s for s, _ in controls]
    import bisect

    n_in_caliper = 0
    for s, _ in treated:
        i = bisect.bisect_left(ctrl_spends, s)
        best = min(
            (abs(s - ctrl_spends[j]) for j in (i - 1, i) if 0 <= j < len(ctrl_spends)),
            default=None,
        )
        if best is not None and best <= 100:
            n_in_caliper += 1
    # the window picks nearest by (spend, id) order; matched count must
    # equal the nearest-within-caliper count
    assert r["n_matched"] == n_in_caliper
    if r["n_matched"] > 0:
        assert r["att_cents"] == (
            r["sum_t_bal"] / r["n_matched"] - r["sum_c_bal"] / r["n_matched"]
        )
    else:
        assert r["att_cents"] is None
