"""Programmatic ground-truth quarantine (VERDICT r7 task 3).

Two catalog queries are exact-by-contract and known-broken past the
measured rungs (the brute-force LSH eval OOM'd at sf10; the lossless
prefix filter is superlinear in shingle df). Documentation alone let a
user run them into an OOM an hour into a job; the guard makes the
refusal programmatic, with a pointer to the capped/sampled scale twin.
"""

from __future__ import annotations

import pytest

from stakehouse_etl_spark.operators.dedup import (
    GROUND_TRUTH_MAX_DOCS,
    ground_truth_guard,
)
from stakehouse_etl_spark.queries.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def test_guard_passes_below_bound_and_returns_count(spark):
    docs = spark.range(100).selectExpr("id AS doc_id", "'x' AS text")
    assert (
        ground_truth_guard(docs, query="q", twin="t") == 100
    )


def test_guard_refuses_above_bound(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_GT_MAX_DOCS", "50")
    docs = spark.range(100).selectExpr("id AS doc_id", "'x' AS text")
    with pytest.raises(RuntimeError, match="scale twin 'the_twin'"):
        ground_truth_guard(docs, query="the_query", twin="the_twin")


def test_guard_malformed_override_falls_back(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_GT_MAX_DOCS", "not-a-number")
    docs = spark.range(10).selectExpr("id AS doc_id", "'x' AS text")
    assert ground_truth_guard(docs, query="q", twin="t") == 10
    # The documented bound: moved 200k -> 100k in r11 when the
    # regenerated 64-row-group fixtures let the lossless arm's scan
    # run 32-wide and its sf3 (150k-doc) cell OOM'd the 8 g JVM that
    # the old 3-task-serialized layout had hidden.
    assert GROUND_TRUTH_MAX_DOCS == 100_000


@pytest.mark.parametrize(
    "name,twin",
    [
        ("dedup_lsh_eval_pr", "dedup_lsh_eval_sampled"),
        ("dedup_prefix_filter_pairs", "dedup_prefix_filter_pairs_capped"),
    ],
)
def test_ground_truth_queries_refuse_at_scale(
    spark, monkeypatch, name, twin
):
    """The guard trips INSIDE the registered queries (sf0.001 has more
    than 5 docs) and names the twin; the twins themselves stay under
    the normal oracle gates."""
    monkeypatch.setenv("SPARK_GRAFT_GT_MAX_DOCS", "5")
    with pytest.raises(RuntimeError, match=twin):
        QUERIES[name].fn(spark, SF)
