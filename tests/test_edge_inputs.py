"""Edge-input robustness: every core operator must run (and return the
right empty/degenerate shape) on empty tables, single rows, and short
documents — the failure class the sf tests can't see (the shingles
sequence(1,0) crash lived here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
    simhash_near_pairs,
)
from stakehouse_etl_spark.operators.similarity import cosine_topk, ivf_topk
from stakehouse_etl_spark.operators.windows import (
    cumulative_income,
    spike_filter,
    top_k_per_group,
    trailing_delta,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_ladder_on_empty_and_short_docs(spark):
    empty = _docs(spark, [])
    short = _docs(spark, [(1, ""), (2, "one"), (3, "two words"), (4, "a b c a b c")])
    for df in (empty, short):
        assert exact_dedup(df).count() >= 0
        assert minhash_signatures(df).count() >= 0
        assert jaccard_pairs(df).count() >= 0
        assert minhash_lsh_pairs(df).count() >= 0
        assert simhash(df).count() >= 0
        assert simhash_near_pairs(df).count() >= 0
    # docs with < 3 tokens have no shingles → no signature row
    assert {r.doc_id for r in minhash_signatures(short).collect()} == {4}
    # identical content → one fingerprint group of size 2 is impossible
    # here, but the empty doc must still fingerprint
    assert exact_dedup(short).count() == 4


def test_windows_on_empty_and_singleton(spark):
    empty = spark.createDataFrame([], "bls_key string, epoch long, balance double")
    one = spark.createDataFrame(
        [("a", 5, 10.0)], "bls_key string, epoch long, balance double"
    )
    assert cumulative_income(empty).count() == 0
    got = cumulative_income(one, money_scale=100).collect()
    assert len(got) == 1 and got[0].earnings == 0.0 and got[0].losses == 0.0
    assert spike_filter(one, key="bls_key", time="epoch", value="balance").count() == 1
    assert top_k_per_group(empty, "bls_key", "epoch", 3).count() == 0
    assert trailing_delta(one, value="balance", min_rows=1).count() == 1
    assert trailing_delta(one, value="balance", min_rows=2).count() == 0


def test_similarity_on_degenerate_inputs(spark):
    # zero vector: norm 0 → cosine NULL → must not crash or emit rows
    emb = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [1.0] * 64), (2, [1.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk(emb, query_ids=[1], k=5).collect()
    assert all(r.query_id == 1 for r in out)
    assert any(r.cand_id == 2 and abs(r.cos_sim - 1.0) < 1e-12 for r in out)
    assert ivf_topk(emb, query_ids=[1], k=5, n_cells=2, n_probe=1).count() >= 1

    nothing = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert cosine_topk(nothing, query_ids=[1], k=5).count() == 0
