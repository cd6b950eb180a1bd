"""Wave-21 invariants: feature engineering, eval plumbing, table
reconciliation."""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.pipeline21 import (
    KFOLDS,
    N_BINS,
    dq_snapshot_diff_q,
    dq_table_diff_digest_q,
    ml_group_corr_q,
    ml_kfold_assign_q,
    ml_quantile_bin_assign_q,
    ml_target_encode_loo_q,
    ts_locf_resample_q,
    w10_topk_with_ties_q,
)


def test_corr_in_range(spark, sf_dir):
    for r in ml_group_corr_q(spark, sf_dir).collect():
        assert -1.0 <= r["corr_qty_price"] <= 1.0


def test_kfold_balance(spark, sf_dir):
    out = ml_kfold_assign_q(spark, sf_dir)
    per = (
        out.groupBy("lang", "fold")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_lang: dict[str, list[int]] = {}
    for r in per:
        assert 0 <= r["fold"] < KFOLDS
        by_lang.setdefault(r["lang"], []).append(r["n"])
    for sizes in by_lang.values():
        assert max(sizes) - min(sizes) <= 1  # dealt, not sampled


def test_locf_no_gaps(spark, sf_dir):
    out = ts_locf_resample_q(spark, sf_dir)
    # every (user, day) in the span is present and filled
    assert out.filter(F.col("locf_cents").isNull()).count() == 0
    span = out.groupBy("user_id").agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.count(F.lit(1)).alias("n"),
    )
    assert (
        span.filter(
            F.col("n") != F.col("d1") - F.col("d0") + 1
        ).count()
        == 0
    )


def test_quantile_bins_equi_depth(spark, sf_dir):
    out = ml_quantile_bin_assign_q(spark, sf_dir)
    sizes = [
        r["n"]
        for r in out.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(sizes) == N_BINS
    assert max(sizes) - min(sizes) <= 1


def test_target_encode_excludes_self(spark, sf_dir):
    from stakehouse_etl_spark.io.sources import load_table

    out = ml_target_encode_loo_q(spark, sf_dir)
    # spot-check one segment: loo mean of a row differs from the plain
    # mean exactly when the row's own value differs from the mean
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    g = c.groupBy("c_mktsegment").agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    joined = out.join(c, ["c_custkey", "c_mktsegment"]).join(g, "c_mktsegment")
    bad = joined.filter(
        F.abs(
            F.col("loo_mean_cents") * (F.col("n") - 1)
            - (F.col("s") - F.col("cents"))
        )
        > 1e-6 * F.abs(F.col("s"))
    )
    assert bad.count() == 0


def test_topk_ties_includes_boundary(spark, sf_dir):
    out = w10_topk_with_ties_q(spark, sf_dir)
    # rank never skips ranks 1..3 and each nation has >= 3 rows
    per = out.groupBy("n_name").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] >= 3 for r in per)


def test_snapshot_diff_statuses(spark, sf_dir):
    rows = dq_snapshot_diff_q(spark, sf_dir).collect()
    statuses = {r["status"] for r in rows}
    assert statuses == {"added", "removed", "changed"}
    for r in rows:
        if r["status"] == "added":
            assert r["cents_a"] is None
        elif r["status"] == "removed":
            assert r["cents_b"] is None
        else:
            assert r["cents_a"] != r["cents_b"]


def test_digest_diff_flags_only_divergent(spark, sf_dir):
    rows = dq_table_diff_digest_q(spark, sf_dir).collect()
    # every flagged bucket genuinely disagrees
    for r in rows:
        assert r["n_a"] != r["n_b"] or r["dig_a"] != r["dig_b"]
        assert r["n_a"] >= r["n_b"]  # B only drops rows
