"""Wave-48 invariants: Lorenz convexity/boundary, record monotonicity,
NULL-kernel ground truth."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_lorenz_convex_and_bounded(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["ml_lorenz_curve_points"].fn(spark, SF).collect()
    assert [r["decile"] for r in out] == list(range(1, 11))
    last = out[-1]
    assert last["pop_share"] == 1.0 and last["spend_share"] == 1.0
    prev_pop = prev_spend = 0.0
    for r in out:
        # Lorenz curve lies under the diagonal and is increasing
        assert r["spend_share"] <= r["pop_share"] + 1e-12
        assert r["pop_share"] > prev_pop and r["spend_share"] >= prev_spend
        prev_pop, prev_spend = r["pop_share"], r["spend_share"]


def test_record_highs_strictly_increasing(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["ts_record_highs"].fn(spark, SF).collect()
    assert out
    assert out[0]["margin"] == 0  # first day is trivially a record
    cs = [r["c"] for r in out]
    assert cs == sorted(cs) and len(set(cs)) == len(cs)  # strictly up
    assert [r["record_no"] for r in out] == list(range(1, len(out) + 1))
    for prev, cur in zip(out, out[1:]):
        assert cur["margin"] == cur["c"] - prev["c"]


def test_null_kernel_ground_truth(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (orders.o_totalprice * 100 + 0.5).apply(math.floor)
    mask = orders.o_orderstatus != "P"
    r = QUERIES["f16_null_agg_kernel"].fn(spark, SF).collect()[0]
    assert r["count_star"] == len(orders)
    assert r["count_col"] == int(mask.sum())
    assert r["n_nulls"] == int((~mask).sum())
    assert r["sum_skips_nulls"] == int(cents[mask].sum())
    assert r["sum_coalesced"] == r["sum_skips_nulls"]
    assert r["min_skips_nulls"] == int(cents[mask].min())
    assert r["avg_over_nonnull"] == r["sum_skips_nulls"] / r["count_col"]
    assert r["avg_over_all"] == r["sum_skips_nulls"] / r["count_star"]
    assert r["no_nulls_flag"] == (r["n_nulls"] == 0)
    assert r["sum_of_empty_is_null"] is None  # SUM over empty = NULL
