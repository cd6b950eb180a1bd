"""Wave-17 invariants: passage dedup, canonical selection, length
buckets, logit inference, multimodal hamming dedup."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.catalog import QUERIES


def plan_of(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_passage_dedup_invariants(spark, sf_dir):
    rows = QUERIES["corpus_passage_dedup"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_passages <= r.n_passages
        assert r.keep == (r.n_dup_passages * 100 < r.n_passages * 30)


def test_passage_dedup_counts_cover_corpus(spark, sf_dir):
    out = QUERIES["corpus_passage_dedup"].fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert out.count() == docs.count()


def test_canonical_one_survivor_per_component(spark, sf_dir):
    out = QUERIES["corpus_canonical_docs"].fn(spark, sf_dir)
    per_comp = out.groupBy("component").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep")
    )
    bad = per_comp.filter(F.col("n_keep") != 1).count()
    assert bad == 0
    # Canonical is the longest member (doc_id tiebreak).
    kept = out.filter("keep").select("component", "n_chars")
    max_len = out.groupBy("component").agg(F.max("n_chars").alias("mx"))
    mism = (
        kept.join(max_len, "component")
        .filter(F.col("n_chars") != F.col("mx"))
        .count()
    )
    assert mism == 0


def test_length_buckets_are_powers_of_two(spark, sf_dir):
    rows = QUERIES["corpus_length_bucket_stats"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bucket & (r.bucket - 1) == 0, r
        assert r.wasted_tokens == r.padded_tokens - r.sum_tokens
        # no doc exceeds its bucket: waste < n_docs * bucket/2 would be
        # too strong (bucket 1), but padded >= real always holds
        assert r.padded_tokens >= r.sum_tokens


def test_logit_pred_matches_sign(spark, sf_dir):
    rows = QUERIES["ml_logit_hashed_score"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.pred == (r.logit > 0)


def test_mm_hamming_pairs_bounded_and_ordered(spark, sf_dir):
    rows = QUERIES["mm_hamming_dedup"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0 <= r.hamming <= 5


def test_mm_hamming_plan_no_cartesian_and_capped(spark, sf_dir):
    plan = plan_of(spark, "mm_hamming_dedup", sf_dir)
    assert "CartesianProduct" not in plan, plan
    # the bucket cap window filter is present (count over band bucket)
    assert re.search(r"__bsz", plan), plan


def test_passage_dedup_plan_no_self_join(spark, sf_dir):
    # fp-count join is an equi-join on fp, never a cartesian.
    plan = plan_of(spark, "corpus_passage_dedup", sf_dir)
    assert "CartesianProduct" not in plan, plan


def test_bpe_merge_pairs_topk_plan(spark, sf_dir):
    # top-k cut must be TakeOrderedAndProject, not a global sort.
    plan = plan_of(spark, "text_bpe_merge_pairs", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan


def test_bpe_merge_pairs_deterministic(spark, sf_dir):
    a = QUERIES["text_bpe_merge_pairs"].fn(spark, sf_dir).collect()
    b = QUERIES["text_bpe_merge_pairs"].fn(spark, sf_dir).collect()
    assert [(r.pair, r.cnt) for r in a] == [(r.pair, r.cnt) for r in b]
    # counts non-increasing, ties lexicographic
    for x, y in zip(a, a[1:]):
        assert x.cnt > y.cnt or (x.cnt == y.cnt and x.pair < y.pair)


def test_bpe_train_merges_invariants(spark, sf_dir):
    rows = QUERIES["ml_bpe_train_merges"].fn(spark, sf_dir).collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    assert all(r.cnt > 0 for r in rows)
    # a merge consumes its pair corpus-wide; the same (lhs, rhs) can't
    # be the argmax twice
    assert len({(r.lhs, r.rhs) for r in rows}) == 3


def test_bpe_deep_extends_the_shallow_run(spark, sf_dir):
    """Greedy BPE is deterministic, so the k=8 depth variant's first
    three merges must equal the k=3 run exactly (prefix property) —
    the cheap cross-check that the depth parametrization changed only
    the iteration count, not the merge arithmetic (VERDICT r7 task 4;
    the oracle gate proves the k=8 values independently)."""
    from stakehouse_etl_spark.caches import cache_scope

    with cache_scope():
        r3 = QUERIES["ml_bpe_train_merges"].fn(spark, sf_dir).collect()
    with cache_scope():
        r8 = (
            QUERIES["ml_bpe_train_merges_deep"].fn(spark, sf_dir).collect()
        )
    assert [r.rank for r in r8] == list(range(1, 9))
    assert all(r.cnt > 0 for r in r8)
    assert len({(r.lhs, r.rhs) for r in r8}) == 8
    as_t = lambda rows: [(r.rank, r.lhs, r.rhs, r.cnt) for r in rows]
    assert as_t(r8)[:3] == as_t(r3)


def test_skew_resistant_rank_matches_global_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stakehouse_etl_spark.operators.windows import skew_resistant_rank

    # heavy value-ties (all rows share 3 values) — the case that makes
    # the naive per-value window a hot partition
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("v")
    )
    fast = {
        (r.doc_id, r.rank)
        for r in skew_resistant_rank(
            df, value="v", id_col="doc_id", out="rank"
        ).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("doc_id"))
    naive = {
        (r.doc_id, r.rank)
        for r in df.select(
            "doc_id", F.row_number().over(w).cast("long").alias("rank")
        ).collect()
    }
    assert fast == naive


def test_shard_assign_plan_no_unpartitioned_bigdata_window(spark, sf_dir):
    # every Window over row data must carry a partition spec; the only
    # unpartitioned window runs over the distinct-value table
    plan = plan_of(spark, "corpus_shard_assign", sf_dir)
    assert "CartesianProduct" not in plan, plan


def test_bpe_apply_encode_compression(spark, sf_dir):
    rows = QUERIES["ml_bpe_apply_encode"].fn(spark, sf_dir).collect()
    assert rows
    total_saved = 0
    for r in rows:
        assert 0 < r.n_encoded_symbols <= r.n_base_symbols
        assert r.n_merges_applied == r.n_base_symbols - r.n_encoded_symbols
        total_saved += r.n_merges_applied
    # three corpus-wide merges must actually compress something
    assert total_saved > 0


def test_drop_ledger_kept_equals_clean_pipeline(spark, sf_dir):
    led = QUERIES["corpus_drop_ledger"].fn(spark, sf_dir)
    kept = {r.doc_id for r in led.filter("status = 'kept'").collect()}
    clean = {
        r.doc_id for r in QUERIES["pipeline_corpus_clean"].fn(spark, sf_dir).collect()
    }
    assert kept == clean


def test_drop_ledger_canonical_semantics(spark, sf_dir):
    rows = QUERIES["corpus_drop_ledger"].fn(spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in rows}
    assert len(rows) == len(by_id)
    for r in rows:
        if r.status == "quality":
            assert r.canonical_id is None
        elif r.status == "kept":
            assert r.canonical_id == r.doc_id
        elif r.status == "near_dup":
            # the component minimum always survives the near-dup collapse
            assert r.canonical_id < r.doc_id
            assert by_id[r.canonical_id].status == "kept"
        else:  # exact_dup: its canonical may itself be near-dup-collapsed later
            assert r.canonical_id < r.doc_id
            assert by_id[r.canonical_id].status in ("kept", "near_dup")
