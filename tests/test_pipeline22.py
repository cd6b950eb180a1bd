"""Wave-22 invariants: behavioral analytics + bounded-state streaming."""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.pipeline22 import (
    graph_copurchase_pairs_q,
    ml_class_weights_q,
    ts_activity_bitmask_q,
    ts_attribution_last_touch_q,
    ts_markov_transitions_q,
)


def test_copurchase_ordering_and_bounds(spark, sf_dir):
    rows = graph_copurchase_pairs_q(spark, sf_dir).collect()
    assert len(rows) <= 20
    counts = [r["n_orders"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["part_a"] < r["part_b"] for r in rows)


def test_markov_rows_normalize(spark, sf_dir):
    out = ts_markov_transitions_q(spark, sf_dir)
    per_from = (
        out.groupBy("from_type")
        .agg(F.sum("n").alias("s"), F.max("n_from").alias("n_from"))
        .collect()
    )
    for r in per_from:
        assert r["s"] == r["n_from"]  # probabilities sum to 1 exactly


def test_attribution_only_purchases_and_horizon(spark, sf_dir):
    out = ts_attribution_last_touch_q(spark, sf_dir)
    bad_type = out.filter(
        F.col("attributed_to").isNotNull()
        & ~F.col("attributed_to").isin("view", "click")
    )
    assert bad_type.count() == 0
    from stakehouse_etl_spark.queries.pipeline22 import ATTRIB_HORIZON_US

    stale = out.filter(F.col("touch_age_us") > ATTRIB_HORIZON_US)
    assert stale.count() == 0


def test_activity_bitmask_consistency(spark, sf_dir):
    out = ts_activity_bitmask_q(spark, sf_dir)
    # popcount column must equal the mask's set-bit count
    bad = out.filter(F.bit_count("mask") != F.col("n_active_days"))
    assert bad.count() == 0
    assert out.filter(F.col("mask") <= 0).count() == 0


def test_class_weights_balance(spark, sf_dir):
    rows = ml_class_weights_q(spark, sf_dir).collect()
    assert all(r["weight_balanced"] for r in rows)
    n_total = rows[0]["n_total"]
    total_weighted = sum(r["n"] * r["class_weight"] for r in rows)
    assert abs(total_weighted - n_total) < 1e-6 * n_total
