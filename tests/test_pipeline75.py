"""Wave-75 contracts: streaming span scrub == batch keep-first scrub,
and the span-resolution eval's containment invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def test_stream_span_scrub_equals_batch_scrub(spark):
    """The 3-batch streamed scrub must reproduce corpus_span_scrub
    row-for-row on every scrub column — the stream==batch contract
    (tercile order == doc_id order makes the stored-index probe
    exactly the global keep-first predicate)."""
    streamed = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["n_scrubbed"], r["cleaned_fp"])
        for r in QUERIES["stream_span_scrub"].fn(spark, SF).collect()
    }
    batch = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["n_scrubbed"], r["cleaned_fp"])
        for r in QUERIES["corpus_span_scrub"].fn(spark, SF).collect()
    }
    assert streamed == batch


def test_stream_span_scrub_batch_numbers_are_terciles(spark):
    out = QUERIES["stream_span_scrub"].fn(spark, SF)
    rows = out.select("doc_id", "batch_no").collect()
    mx = max(r["doc_id"] for r in rows)
    t1, t2 = mx // 3, 2 * mx // 3
    for r in rows:
        expect = 1 if r["doc_id"] <= t1 else 2 if r["doc_id"] <= t2 else 3
        assert r["batch_no"] == expect, r
    assert {r["batch_no"] for r in rows} == {1, 2, 3}


def test_span_recall_eval_containment_invariant(spark):
    """Every position flagged at k=8 is flagged at k=5 by the k-gram
    anchor construction — the eval must MEASURE containment exactly
    1.0 wherever k=8 flags anything, and flagged_k5 >= flagged_k8
    everywhere."""
    rows = QUERIES["dedup_span_recall_eval"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["flagged_both"] <= r["flagged_k8"] <= r["flagged_k5"]
        if r["flagged_k8"] > 0:
            assert r["containment_k8_in_k5"] == 1.0, r
        else:
            assert r["containment_k8_in_k5"] is None


def test_span_recall_eval_merge_pinned_no_broadcast_explode(spark):
    """The full-outer join of the two exploded position sets must be
    sort-merge (the explode-after-stats AQE broadcast trap from r5)."""
    df = QUERIES["dedup_span_recall_eval"].fn(spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin FullOuter" in plan, plan


def test_quality_features_collision_raises(spark):
    """ADVICE r5: quality_features must refuse to silently overwrite
    caller columns that collide with its outputs."""
    import pytest

    from stakehouse_etl_spark.operators.text import quality_features

    df = spark.createDataFrame(
        [(1, "hello world", 0.5)], "doc_id long, text string, quality_score double"
    )
    with pytest.raises(ValueError, match="quality_score"):
        quality_features(df)
