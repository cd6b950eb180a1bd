"""Wave-54 invariants: Kaplan-Meier against a naive lifelines-free
Python implementation (quantized-log formulation)."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_km_matches_naive(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    g = pd.DataFrame({"u": ev.user_id, "us": us}).groupby("u")["us"]
    first, last = g.min(), g.max()
    span_end = int(last.max())
    dur = (last - first) // 86400000000
    churned = last < span_end - 7 * 86400000000
    n_total = len(dur)
    rows = []
    gone = 0
    cum_micro = 0
    for t in sorted(dur.unique()):
        ending = int((dur == t).sum())
        deaths = int(((dur == t) & churned).sum())
        at_risk = n_total - gone
        if at_risk > deaths:
            term = (
                math.floor(math.log((at_risk - deaths) / at_risk) * 1e6)
                if deaths > 0
                else 0
            )
            cum_micro += term
            rows.append(
                (int(t), deaths, at_risk, math.floor(math.exp(cum_micro / 1e6) * 1e6))
            )
        gone += ending
    out = QUERIES["ml_kaplan_meier"].fn(spark, SF).collect()
    got = [
        (r["dur_days"], r["deaths"], r["at_risk"], r["survival_micro"])
        for r in sorted(out, key=lambda r: r["dur_days"])
    ]
    assert got == rows
    # survival is non-increasing and within [0, 1]
    survs = [r[3] for r in got]
    assert survs == sorted(survs, reverse=True)
    assert all(0 <= s <= 1_000_000 for s in survs)
