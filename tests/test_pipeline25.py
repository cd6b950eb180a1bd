"""Wave-25 invariants: mergeable state + budgeted selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.pipeline25 import (
    TOKEN_BUDGET,
    TOPK,
    a_bool_agg_family_q,
    corpus_token_budget_trim_q,
    graph_degree_distribution_q,
    inc_topk_merge_q,
)


def test_topk_merge_contract(spark, sf_dir):
    rows = inc_topk_merge_q(spark, sf_dir).collect()
    assert len(rows) == TOPK
    assert all(r["merge_equals_whole"] for r in rows)
    cents = [r["cents"] for r in rows]
    assert cents == sorted(cents, reverse=True)


def test_degree_distribution_conserves_nodes(spark, sf_dir):
    out = graph_degree_distribution_q(spark, sf_dir)
    rows = out.collect()
    assert all(r["degree"] >= 1 for r in rows)
    assert sum(r["n_nodes"] for r in rows) > 0


def test_token_budget_maximal_prefix(spark, sf_dir):
    out = corpus_token_budget_trim_q(spark, sf_dir).collect()
    assert out, "budget should admit at least one document"
    total = max(r["cum_tok"] for r in out)
    assert total <= TOKEN_BUDGET
    # maximality: adding the next doc would exceed the budget OR the
    # whole corpus fits
    n_sel = len(out)
    from stakehouse_etl_spark.io.sources import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    if n_sel < n_docs:
        # selection is a strict prefix -> budget is binding; the
        # cumulative sums must be strictly increasing and contiguous
        cums = sorted(r["cum_tok"] for r in out)
        assert all(b > a for a, b in zip(cums, cums[1:]))


def test_bool_agg_consistency(spark, sf_dir):
    from stakehouse_etl_spark.io.sources import load_table

    rows = {r["l_returnflag"]: r for r in a_bool_agg_family_q(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    manual = li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).alias("n"),
        F.max(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("any_"),
        F.min(F.when(F.col("l_extendedprice") > 0, 1).otherwise(0)).alias(
            "all_"
        ),
    )
    for r in manual.collect():
        got = rows[r["l_returnflag"]]
        assert got["n_big_qty"] == r["n"]
        assert got["any_high_discount"] == bool(r["any_"])
        assert got["every_price_positive"] == bool(r["all_"])
