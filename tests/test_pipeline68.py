"""Wave-68 invariants: Hill estimator replay, seasonal-index mean
property."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_hill_matches_replay(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = sorted(
        ((orders.o_totalprice * 100 + 0.5).apply(math.floor)).astype(int),
        reverse=True,
    )
    k = 100
    x_k1 = cents[k]
    s = sum(math.floor(math.log(c / x_k1) * 1e6) for c in cents[:k])
    r = QUERIES["ml_hill_tail_index"].fn(spark, SF).collect()[0]
    assert r["k"] == k
    assert r["threshold_cents"] == x_k1
    assert r["sum_ln_micro"] == s
    assert r["hill_alpha"] == k * 1e6 / s
    assert r["hill_alpha"] > 0


def test_seasonal_indices_center_near_one(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["ts_seasonal_index_ma"].fn(spark, SF).collect()
    assert 1 <= len(out) <= 12
    total_obs = sum(r["n_obs"] for r in out)
    weighted = sum(r["seasonal_index"] * r["n_obs"] for r in out) / total_obs
    # ratios to a centered MA average out near 1 across the panel
    assert 0.7 < weighted < 1.3
    for r in out:
        assert r["seasonal_index"] > 0
        assert abs(
            r["seasonal_index"] - r["sum_ratio_micro"] / r["n_obs"] / 1e6
        ) < 1e-12
