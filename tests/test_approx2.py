"""Tests for the heavy-hitters contract and equi-depth histogram."""

from __future__ import annotations

import re
from collections import Counter

from stakehouse_etl_spark.io.sources import load_table
from stakehouse_etl_spark.queries.approx2 import (
    FREQ_SUPPORT,
    N_DEPTH_BUCKETS,
    a_freq_items_contract,
    a_histogram_equi_depth,
)


def test_freq_items_no_false_negatives(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    counts = Counter(
        t for r in docs for t in re.split(r"\s+", r["text"].strip().lower())
    )
    total = sum(counts.values())
    expect_hot = {t: c for t, c in counts.items() if c > FREQ_SUPPORT * total}
    rows = a_freq_items_contract(spark, sf_dir).collect()
    assert {r["tok"]: r["cnt"] for r in rows} == expect_hot
    # The Misra-Gries guarantee: every true heavy hitter is in the sketch.
    assert all(r["in_sketch"] for r in rows), [
        r["tok"] for r in rows if not r["in_sketch"]
    ]


def test_equi_depth_histogram_invariants(spark, sf_dir):
    rows = sorted(
        a_histogram_equi_depth(spark, sf_dir).collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"] for r in rows] == list(range(1, N_DEPTH_BUCKETS + 1))
    total = sum(r["n"] for r in rows)
    # Equal depth: ntile spreads rows within 1 of each other.
    assert max(r["n"] for r in rows) - min(r["n"] for r in rows) <= 1
    # Boundaries are non-decreasing across buckets and well-formed within.
    for a, b in zip(rows, rows[1:]):
        assert a["lo_cents"] <= a["hi_cents"] <= b["lo_cents"] <= b["hi_cents"]
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert total == n_orders
