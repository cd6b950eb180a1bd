"""Wave-24 invariants: robust statistics + interval algebra."""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.pipeline24 import (
    ml_robust_scale_mad_q,
    ml_winsorize_clip_q,
    ml_zscore_scale_q,
    ts_interval_coalesce_q,
)


def test_zscore_moments(spark, sf_dir):
    out = ml_zscore_scale_q(spark, sf_dir)
    m = out.groupBy("event_type").agg(
        F.sum("z").alias("sz"), F.count(F.lit(1)).alias("n")
    )
    # population z-scores sum to ~0 per group
    bad = m.filter(F.abs(F.col("sz")) > 1e-6 * F.col("n"))
    assert bad.count() == 0


def test_winsorize_bounds(spark, sf_dir):
    out = ml_winsorize_clip_q(spark, sf_dir)
    total = out.count()
    clipped = out.filter(F.col("was_clipped")).count()
    # at most ~2*WINSOR_PCT of rows are clipped (ties can reduce it)
    assert clipped <= 0.11 * total
    # clipped values sit strictly inside the raw range
    bad = out.filter(
        (F.col("clipped") > F.col("cents")) & ~F.col("was_clipped")
    )
    assert bad.count() == 0


def test_interval_coalesce_disjoint(spark, sf_dir):
    out = ts_interval_coalesce_q(spark, sf_dir)
    # spans of one user never overlap: next span_lo > prev span_hi
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("span_lo")
    chk = out.withColumn("prev_hi", F.lag("span_hi").over(w)).filter(
        F.col("prev_hi").isNotNull() & (F.col("span_lo") <= F.col("prev_hi"))
    )
    assert chk.count() == 0
    # merged counts conserve events
    from stakehouse_etl_spark.io.sources import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    assert (
        out.agg(F.sum("n_merged")).collect()[0][0] == n_events
    )


def test_mad_positive_and_scaled(spark, sf_dir):
    rows = ml_robust_scale_mad_q(spark, sf_dir).collect()
    for r in rows:
        assert r["mad_4x_cents"] >= 0
        # 2x/4x parity: both scaled values are integers by type
        assert isinstance(r["median_2x_cents"], int)
        assert isinstance(r["mad_4x_cents"], int)
