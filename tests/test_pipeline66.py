"""Wave-66 invariant: permutation test against a naive hash-replay."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_permutation_test_matches_replay(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    m = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    m = m[m.c_mktsegment.isin(["BUILDING", "MACHINERY"])]
    m = m.assign(
        cents=(m.o_totalprice * 100 + 0.5).apply(math.floor),
        t=(m.c_mktsegment == "BUILDING").astype(int),
    )
    obs = abs(
        m[m.t == 1].cents.mean() - m[m.t == 0].cents.mean()
    )
    n_extreme = 0
    for b in range(20):
        pt = m.o_custkey.map(lambda k, b=b: _h(f"{k}p{b}") % 2)
        diff = abs(m[pt == 1].cents.mean() - m[pt == 0].cents.mean())
        if diff >= obs:
            n_extreme += 1
    r = QUERIES["ml_permutation_test"].fn(spark, SF).collect()[0]
    assert math.isclose(r["obs_diff"], obs, rel_tol=1e-12)
    assert r["n_extreme"] == n_extreme
    assert r["p_value"] == (n_extreme + 1) / 21
    assert 0 < r["p_value"] <= 1
