"""Wave-13 extension: the sampled LSH eval must coincide with the
unsampled eval whenever the corpus is below the sample target."""

from __future__ import annotations

from stakehouse_etl_spark.queries.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def test_sampled_eval_equals_full_eval_below_target(spark):
    full = QUERIES["dedup_lsh_eval_pr"].fn(spark, SF).collect()[0]
    samp = QUERIES["dedup_lsh_eval_sampled"].fn(spark, SF).collect()[0]
    assert samp["sample_stride"] == 1
    assert samp["n_exact"] == full["n_exact"]
    assert samp["n_candidates"] == full["n_candidates"]
    assert samp["n_tp"] == full["n_tp"]
    assert samp["precision"] == full["precision"]
    assert samp["recall"] == full["recall"]
