"""Tests for the second-wave pipeline queries: sequence packing,
stratified sampling, contamination, n-gram counts, k-means step,
time-weighted average."""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.pipeline2 import (
    KMEANS_K,
    PACK_CAP,
    SAMPLE_PER_STRATUM,
    corpus_pack_sequences,
    corpus_sample_stratified,
    ml_kmeans_assign,
    text_contamination_overlap,
    text_ngram_counts,
    ts_time_weighted_avg,
)


def test_pack_sequences_invariants(spark, sf_dir):
    rows = corpus_pack_sequences(spark, sf_dir).orderBy("doc_id").collect()
    assert rows, "packing produced no rows"
    # Offsets are a gapless concatenation in doc_id order.
    expected_off = 0
    for r in rows:
        assert r["start_off"] == expected_off
        expected_off += r["n_tok"]
        # chunk bookkeeping is consistent with the offset arithmetic
        assert r["chunk_id"] == r["start_off"] // PACK_CAP
        last = (r["start_off"] + r["n_tok"] - 1) // PACK_CAP
        assert r["chunks_spanned"] == last - r["chunk_id"] + 1
        assert r["chunks_spanned"] >= 1


def test_stratified_sample_counts_and_determinism(spark, sf_dir):
    out1 = corpus_sample_stratified(spark, sf_dir)
    counts = {
        r["lang"]: r["n"]
        for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in counts.items():
        assert n <= SAMPLE_PER_STRATUM, (lang, n)
    # Deterministic: a second run selects the identical doc set.
    ids1 = {r["doc_id"] for r in out1.collect()}
    ids2 = {r["doc_id"] for r in corpus_sample_stratified(spark, sf_dir).collect()}
    assert ids1 == ids2


def test_contamination_ratio_bounds(spark, sf_dir):
    rows = text_contamination_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_matched"] <= r["n_sh"]
        assert 0.0 <= r["contamination_ratio"] <= 1.0


def test_ngram_counts_ranked(spark, sf_dir):
    rows = text_ngram_counts(spark, sf_dir).orderBy("rnk").collect()
    assert 0 < len(rows) <= 30
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))


def test_kmeans_assign_is_argmin(spark, sf_dir):
    out = ml_kmeans_assign(spark, sf_dir)
    # One assignment per vector.
    n_vec = out.count()
    assert out.select("vec_id").distinct().count() == n_vec
    # Seed centroids are distance 0 from themselves.
    seeds = out.filter(F.col("vec_id") < KMEANS_K).collect()
    assert len(seeds) == KMEANS_K
    for r in seeds:
        assert r["centroid_id"] == r["vec_id"] and r["dist"] == 0


def test_time_weighted_avg_matches_naive(spark, sf_dir):
    from collections import defaultdict

    from stakehouse_etl_spark.io.sources import load_table

    events = sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    per_user = defaultdict(list)
    for r in events:
        per_user[r["user_id"]].append(r)
    expect = {}
    for uid, rs in per_user.items():
        num = den = 0
        for a, b in zip(rs, rs[1:]):
            dur = int((b["ts"] - a["ts"]).total_seconds() * 1_000_000)
            num += round(a["value"] * 100) * dur
            den += dur
        if den:
            expect[uid] = num / den / 100.0
    got = {r["user_id"]: r["twa"] for r in ts_time_weighted_avg(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for uid in expect:
        assert abs(got[uid] - expect[uid]) < 1e-9, uid
