"""Wave-73 invariants: maximal duplicated-span detection.

Semantic unit checks on synthetic corpora with KNOWN shared blocks
(the oracle sweep covers engine-vs-DuckDB parity; these pin the
island-merge semantics themselves against hand-computed spans).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.pipeline73 import (
    SPAN_K,
    _merge_islands,
    _positional_grams,
    corpus_span_scrub_q,
    dedup_span_incremental_q,
    dedup_span_inventory_q,
    incremental_span_scrub,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _inventory(spark, texts):
    t, g = _positional_grams(_docs(spark, texts))
    dup = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    spans = _merge_islands(g.join(dup, "gram").select("doc_id", "pos"))
    return {
        (r["doc_id"], r["s"], r["e"])
        for r in spans.collect()
    }


def test_shared_block_is_one_maximal_span(spark):
    # A 12-token block shared verbatim by docs 0 and 1, different
    # unique filler around it. Expect exactly ONE span per doc
    # covering the block — grams merge, no fragmenting.
    block = " ".join(f"shared{i}" for i in range(12))
    texts = [
        "a0 b0 c0 " + block + " z0 y0",
        "a1 b1 c1 d1 " + block + " z1",
        "only unique words here nothing shared at all",
    ]
    spans = _inventory(spark, texts)
    # doc 0: block occupies token positions 3..14; doc 1: 4..15.
    assert spans == {(0, 3, 14), (1, 4, 15)}


def test_adjacent_blocks_from_different_partners_merge(spark):
    # Doc 0 contains block A (shared with doc 1) immediately followed
    # by block B (shared with doc 2). In doc 0 they merge into one
    # maximal span; in docs 1/2 each stays its own span.
    a = " ".join(f"aa{i}" for i in range(8))
    b = " ".join(f"bb{i}" for i in range(8))
    texts = [
        "x0 " + a + " " + b + " x1",
        "p0 p1 " + a + " p2 p3 p4",
        "q0 q1 q2 " + b + " q3 q4",
    ]
    spans = _inventory(spark, texts)
    by_doc = {}
    for d, s, e in spans:
        by_doc.setdefault(d, []).append((s, e))
    assert by_doc[0] == [(1, 16)]  # one merged 16-token region
    assert by_doc[1] == [(2, 9)]
    assert by_doc[2] == [(3, 10)]


def test_short_docs_and_within_doc_repeats_excluded(spark):
    # Docs shorter than SPAN_K yield no grams; a block repeated twice
    # WITHIN one doc but absent elsewhere is repetition, not
    # cross-doc duplication.
    rep = " ".join(f"r{i}" for i in range(SPAN_K))
    texts = ["tiny doc", rep + " mid " + rep, "all fresh tokens only here"]
    assert _inventory(spark, texts) == set()


def test_inventory_query_bounds(spark, sf_dir):
    out = dedup_span_inventory_q(spark, sf_dir)
    bad = out.filter(
        (F.col("dup_tokens") > F.col("n_tokens"))
        | (F.col("max_span_len") > F.col("dup_tokens"))
        | ((F.col("n_spans") > 0) & (F.col("max_span_len") < SPAN_K))
        | (F.col("dup_frac") < 0)
        | (F.col("dup_frac") > 1)
    )
    assert bad.count() == 0
    assert out.count() == out.select("doc_id").distinct().count()


def test_scrub_keeps_first_claimant_intact(spark, sf_dir):
    inv = dedup_span_inventory_q(spark, sf_dir).select(
        "doc_id", "n_tokens", "dup_tokens"
    )
    scrub = corpus_span_scrub_q(spark, sf_dir).select(
        "doc_id", "n_scrubbed", "n_kept"
    )
    j = inv.join(scrub, "doc_id")
    # Scrubbing removes at most the duplicated tokens, and kept+scrubbed
    # partitions the doc.
    assert j.filter(F.col("n_scrubbed") > F.col("dup_tokens")).count() == 0
    assert (
        j.filter(
            F.col("n_kept") + F.col("n_scrubbed") != F.col("n_tokens")
        ).count()
        == 0
    )
    # Corpus-wide: at least one occurrence of every duplicated gram
    # survives, so total scrubbed < total duplicated tokens whenever
    # any duplication exists.
    tot = j.agg(
        F.sum("n_scrubbed").alias("scr"), F.sum("dup_tokens").alias("dup")
    ).first()
    if tot["dup"] and tot["dup"] > 0:
        assert tot["scr"] < tot["dup"]


def test_incremental_scrub_claim_order(spark):
    # Corpus (doc 0) owns block A; batch docs 1/3/5: doc 1 repeats A
    # (scrubbed — corpus always precedes the batch), docs 3 and 5
    # share block B that the corpus lacks (first batch claimant 3
    # keeps it, 5 scrubs), and corpus rows never appear in the output.
    a = " ".join(f"aa{i}" for i in range(8))
    b = " ".join(f"bb{i}" for i in range(8))
    rows = [
        (0, "c0 c1 " + a + " c2"),
        (1, "x0 " + a + " x1 x2"),
        (3, "p0 p1 " + b + " p2"),
        (5, "q0 " + b + " q1 q2 q3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = incremental_span_scrub(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["n_scrubbed"])
        for r in out.collect()
    }
    assert got == {1: (11, 3, 8), 3: (11, 11, 0), 5: (12, 4, 8)}


def test_incremental_scrub_query_partitions_tokens(spark, sf_dir):
    out = dedup_span_incremental_q(spark, sf_dir)
    assert out.filter("doc_id % 2 = 0").count() == 0
    assert (
        out.filter(
            F.col("n_kept") + F.col("n_scrubbed") != F.col("n_tokens")
        ).count()
        == 0
    )
    # Dominance: for a batch doc, the incremental policy's scrubbed
    # position set CONTAINS the global keep-first policy's (any global
    # first claimant is either even -> in the corpus index, or an
    # earlier odd doc -> an earlier batch claimant; and the corpus
    # index additionally scrubs grams whose only even claimant has a
    # LARGER id). Covered positions are exactly the union of the gram
    # intervals, monotone in the duplicated-position set.
    full = corpus_span_scrub_q(spark, sf_dir).select(
        "doc_id", F.col("n_scrubbed").alias("full_scrubbed")
    )
    j = out.join(full, "doc_id")
    assert j.filter(F.col("n_scrubbed") < F.col("full_scrubbed")).count() == 0


def test_hybrid_rrf_fusion_invariants(spark, sf_dir):
    import math

    from stakehouse_etl_spark.queries.pipeline74 import (
        RRF_K,
        sim_hybrid_rrf_topk_q,
    )

    rows = sim_hybrid_rrf_topk_q(spark, sf_dir).collect()
    # union of two top-10 lists
    assert 10 <= len(rows) <= 20
    ranks = sorted(r["fused_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        expect = 0.0
        if r["lex_rank"] is not None:
            expect += 1.0 / (RRF_K + r["lex_rank"])
        if r["sem_rank"] is not None:
            expect += 1.0 / (RRF_K + r["sem_rank"])
        assert r["rrf_nano"] == math.floor(expect * 1_000_000_000), r
