"""Wave-39 invariants: streaming observe vs direct aggregation,
Theil-Sen against a naive O(n²) median-of-slopes."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


def test_stream_observe_equals_batch(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    ev = pd.read_parquet(f"{SF}/events.parquet")
    row = QUERIES["stream_observe_metrics"].fn(spark, SF).collect()[0]
    assert row["n_rows"] == len(ev)
    assert row["sum_cents"] == sum(_cents(v) for v in ev["value"])


def test_theilsen_matches_naive(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    days = orders.o_orderdate.dt.normalize()
    d0, d1 = days.min(), days.max()
    spine = pd.date_range(d0, d1, freq="D")
    counts = days.value_counts().reindex(spine, fill_value=0)
    seq = [(i, int(c)) for i, c in enumerate(counts)]
    slopes = []
    for i, (di, ci) in enumerate(seq):
        for dj, cj in seq[i + 1 :]:
            slopes.append(((cj - ci) / (dj - di), di * 100000 + dj))
    slopes.sort()
    n = len(slopes)
    median = slopes[(n + 1) // 2 - 1][0]
    row = QUERIES["ts_theilsen_slope"].fn(spark, SF).collect()[0]
    assert row["n_pairs"] == n
    assert row["theilsen_slope"] == median
    assert row["theilsen_slope"] == row["dy"] / row["dx"]
