"""Wave-65 invariants: decomposition identity, workday counts."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_price_volume_identity(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["a_price_volume_mix"].fn(spark, SF).collect()
    assert len(out) == 5
    for r in out:
        # volume + rate reconstructs the delta exactly (real-number
        # identity; float evaluation is close to machine precision)
        assert math.isclose(
            r["volume_effect"] + r["rate_effect"],
            r["delta_cents"],
            rel_tol=1e-9,
            abs_tol=1e-3,
        )
        assert r["n1"] > 0 and r["n2"] > 0


def test_workday_kpi_counts(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    days = pd.date_range(
        orders.o_orderdate.min().normalize(),
        orders.o_orderdate.max().normalize(),
        freq="D",
    )
    wd = pd.Series(days).groupby(days.year * 100 + days.month).apply(
        lambda s: int((s.dt.dayofweek < 5).sum())
    )
    out = {r["month_key"]: r for r in QUERIES["ts_workday_adjusted_kpi"].fn(spark, SF).collect()}
    for mk, r in out.items():
        assert r["workdays"] == wd[mk]
        assert r["cents_per_workday"] == r["cents"] / r["workdays"]
    # every month in the span with orders appears
    months = orders.o_orderdate.dt.year * 100 + orders.o_orderdate.dt.month
    assert set(out) == set(months.unique())
