"""Wave-52 invariants: cross-correlation symmetry/bounds, delta-method
SE against a numpy reimplementation."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_xcorr_bounds_and_lag0_pearson(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    m = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    m = m[m.c_mktsegment.isin(["BUILDING", "MACHINERY"])]
    m = m.assign(day=m.o_orderdate.dt.normalize())
    spine = pd.date_range(m.day.min(), m.day.max(), freq="D")
    x = (
        m[m.c_mktsegment == "BUILDING"].day.value_counts().reindex(spine, fill_value=0)
    )
    y = (
        m[m.c_mktsegment == "MACHINERY"].day.value_counts().reindex(spine, fill_value=0)
    )
    out = {r["lag"]: r for r in QUERIES["ts_lead_lag_xcorr"].fn(spark, SF).collect()}
    assert set(out) == set(range(-3, 4))
    for r in out.values():
        assert -1_000_001 <= r["xcorr_micro"] <= 1_000_000
    r0 = x.corr(y)  # pandas Pearson at lag 0
    assert abs(out[0]["xcorr_micro"] / 1e6 - r0) < 1e-5
    # lag windows shrink the overlap by |lag| days
    assert out[0]["n"] - out[3]["n"] == 3
    assert out[0]["n"] - out[-3]["n"] == 3


def test_ratio_delta_se_matches_numpy(spark):
    import numpy as np

    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    g = orders.assign(
        cents=(orders.o_totalprice * 100 + 0.5).apply(math.floor)
    ).groupby("o_custkey")
    x = (g.cents.sum().astype(int) // 1000).to_numpy(dtype=float)
    y = g.size().to_numpy(dtype=float)
    n = len(x)
    ratio = x.sum() / y.sum()
    var_x = x.var()  # population variance, ddof=0
    var_y = y.var()
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    se = math.sqrt((var_x - 2 * ratio * cov + ratio**2 * var_y) / n) / y.mean()
    r = QUERIES["ml_ratio_delta_se"].fn(spark, SF).collect()[0]
    assert r["n"] == n
    assert math.isclose(r["ratio_kc_per_order"], ratio, rel_tol=1e-12)
    assert abs(r["se_micro"] / 1e6 - se) < 1e-5
    assert np.isfinite(se)
