"""Wave-77 contracts: the train-ready corpus export ledger."""

from __future__ import annotations

import pytest

from stakehouse_etl_spark.queries.catalog import QUERIES

SF = "/root/testdata/sf0.001"

_STATUSES = {
    "eval_holdout",
    "quality",
    "perplexity",
    "exact_dup",
    "near_dup",
    "contaminated",
    "kept",
}


_CACHE: list = []


def _ledger(spark):
    # One pipeline execution serves all four contract tests.
    if not _CACHE:
        _CACHE.extend(
            QUERIES["pipeline_corpus_export"].fn(spark, SF).collect()
        )
    return _CACHE


def test_export_ledger_partitions_the_corpus(spark):
    rows = _ledger(spark)
    assert rows
    # One row per input doc, every doc exactly once.
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert {r["status"] for r in rows} <= _STATUSES
    # Eval sources are held out before any content stage runs.
    for r in rows:
        if r["source"] in ("src0", "src1"):
            assert r["status"] == "eval_holdout"
        else:
            assert r["status"] != "eval_holdout"


def test_export_kept_rows_carry_the_training_plan(spark):
    rows = _ledger(spark)
    kept = [r for r in rows if r["status"] == "kept"]
    dropped = [r for r in rows if r["status"] != "kept"]
    assert kept, "a real corpus must keep something"
    for r in kept:
        assert r["canonical_id"] == r["doc_id"]
        assert r["n_kept"] is not None and 0 <= r["n_kept"] <= r["n_tokens"]
        assert r["start_off"] is not None and r["start_off"] >= 0
        assert r["chunk_id"] == r["start_off"] // 512
        assert r["shard"] is not None and 0 <= r["shard"] < 8
        assert r["oversample_factor"] is not None
    for r in dropped:
        assert r["n_kept"] is None and r["start_off"] is None
        assert r["shard"] is None and r["oversample_factor"] is None
        if r["status"] in ("exact_dup", "near_dup"):
            assert r["canonical_id"] is not None
            assert r["canonical_id"] < r["doc_id"]
        else:
            assert r["canonical_id"] is None


def test_export_packing_is_a_prefix_sum_over_kept(spark):
    rows = sorted(
        (r for r in _ledger(spark) if r["status"] == "kept"),
        key=lambda r: r["doc_id"],
    )
    off = 0
    for r in rows:
        assert r["start_off"] == off, (r["doc_id"], r["start_off"], off)
        off += r["n_kept"]


def test_export_mix_allocations_sum_to_budget(spark):
    rows = [r for r in _ledger(spark) if r["status"] == "kept"]
    # oversample_factor = final_alloc / src_tok, constant per source;
    # sum over sources of factor * src_tok must equal the budget.
    per_src: dict[str, tuple[float, int]] = {}
    for r in rows:
        f, tok = per_src.get(r["source"], (r["oversample_factor"], 0))
        assert abs(f - r["oversample_factor"]) < 1e-12
        per_src[r["source"]] = (f, tok + r["n_kept"])
    total = round(sum(f * tok for f, tok in per_src.values()))
    assert total == 1_000_000


def test_export_ledger_degenerate_doc_reports_quality(spark, tmp_path):
    """ADVICE r7: an empty-text doc has NULL quality_score (0/0), so a
    bare NOT q_ok CASE fell through every branch and misreported the
    doc as 'kept' with canonical_id=doc_id — in BOTH arms, invisible
    to the hash gate. Non-TRUE must mean dropped-at-quality."""
    rows = [(0, "src0", "held out eval doc")]
    rows += [(1, "src2", "")]  # degenerate: NULL quality features
    for i in range(2, 12):
        rows.append(
            (
                i,
                "src2" if i % 2 else "src3",
                f"the quick brown fox number {i} jumps over the lazy "
                f"dog and keeps running through field {i * 7} happily.",
            )
        )
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    led = {
        r["doc_id"]: r
        for r in QUERIES["pipeline_corpus_export"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert led[1]["status"] == "quality", led[1]
    assert led[1]["canonical_id"] is None
    assert led[1]["n_kept"] is None and led[1]["shard"] is None


def test_export_landed_resume(spark, tmp_path):
    """VERDICT r7 task 5: the storage-landing stage cut must resume
    from the last completed stage after a crash — stages landed before
    the crash are NOT recomputed, and the resumed ledger is value-
    identical to the in-memory arm's."""
    from stakehouse_etl_spark.queries.pipeline77 import (
        _export_ledger,
        _land_stage_factory,
    )

    base = str(tmp_path / "stages")
    written_before = []
    with pytest.raises(RuntimeError, match="injected crash"):
        _export_ledger(
            spark,
            SF,
            _land_stage_factory(
                base, fail_after=4, written=written_before
            ),
        )
    assert len(written_before) == 4

    written_after = []
    led = _export_ledger(
        spark,
        SF,
        _land_stage_factory(base, resume=True, written=written_after),
    )
    got = sorted(map(tuple, led.collect()))
    # the four landed stages were reused, not recomputed
    assert set(written_before).isdisjoint(written_after)
    assert written_after, "resume must compute the remaining stages"
    ref = sorted(
        tuple(r) for r in _ledger(spark)
    )
    assert got == ref
