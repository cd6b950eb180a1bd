"""Wave-26 invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.pipeline26 import (
    corpus_intradoc_dedup_q,
    k7_snapshot_version_diff_q,
    ml_wilson_ci_q,
    stream_topk_leaderboard_q,
)


def test_intradoc_kept_bounds(spark, sf_dir):
    out = corpus_intradoc_dedup_q(spark, sf_dir)
    bad = out.filter(
        (F.col("n_kept") > F.col("n_chunks")) | (F.col("n_kept") < 1)
    )
    assert bad.count() == 0
    assert out.filter(F.col("cleaned_fp").isNull()).count() == 0


def test_wilson_ci_contains_phat(spark, sf_dir):
    for r in ml_wilson_ci_q(spark, sf_dir).collect():
        assert 0.0 <= r["ci_lo"] <= r["phat"] <= r["ci_hi"] <= 1.0


def test_snapshot_version_diff_statuses(spark, sf_dir):
    rows = {r["status"]: r["n"] for r in k7_snapshot_version_diff_q(spark, sf_dir).collect()}
    assert set(rows) == {"added", "removed", "changed"}
    assert all(v > 0 for v in rows.values())


def test_stream_topk_matches_batch(spark, sf_dir):
    from stakehouse_etl_spark.io.sources import load_table

    got = [
        (r["event_id"], r["cents"])
        for r in stream_topk_leaderboard_q(spark, sf_dir)
        .orderBy("rnk")
        .collect()
    ]
    want = [
        (r["event_id"], r["cents"])
        for r in load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .orderBy(F.desc("cents"), F.asc("event_id"))
        .limit(len(got))
        .collect()
    ]
    assert got == want
