"""Wave-76 contracts: LM-perplexity filter semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def test_lm_perplexity_scores_and_policy(spark):
    rows = QUERIES["corpus_lm_perplexity"].fn(spark, SF).collect()
    assert rows
    scored = [r for r in rows if r["n_bigrams"] > 0]
    assert scored, "corpus must produce scored docs"
    # Self-calibrating policy: mean of per-doc means minus the margin.
    mean_lp = sum(r["avg_logp_micro"] for r in scored) // len(scored)
    import math

    mean_lp = math.floor(
        sum(r["avg_logp_micro"] for r in scored) / len(scored)
    )
    for r in rows:
        assert r["doc_id"] % 2 == 1  # only the target half is scored
        if r["n_bigrams"] == 0:
            assert r["avg_logp_micro"] is None and r["keep"] is False
        else:
            # avg is the floored mean of the micro-grid sum
            assert r["avg_logp_micro"] == math.floor(
                r["logp_micro_sum"] / r["n_bigrams"]
            )
            assert r["keep"] == (
                r["avg_logp_micro"] >= mean_lp - 100_000
            ), r
    # smoothed logprob is strictly negative for any real corpus
    assert all(r["avg_logp_micro"] < 0 for r in scored)


def test_lm_perplexity_gibberish_scores_below_prose(spark):
    """A doc of out-of-vocabulary gibberish must score below every
    in-distribution doc — the signal the filter exists to produce.
    Built on a tiny synthetic corpus through the same operator body
    (write parquet, point the query at it)."""
    import os
    import tempfile

    prose = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, prose, "en", "src", len(prose)) for i in range(0, 8, 2)]
    rows += [(1, prose, "en", "src", len(prose))]
    rows += [(3, "zxqv kjht wqpo mnbv zzzz qqqq", "en", "src", 29)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in QUERIES["corpus_lm_perplexity"].fn(spark, d).collect()
        }
    assert out[3]["avg_logp_micro"] < out[1]["avg_logp_micro"]
    assert out[1]["keep"] is True
    assert out[3]["keep"] is False
