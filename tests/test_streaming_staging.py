"""The shared foreachBatch file-source scaffold (streaming/staging.py).

Extracted in r8 from two near-verbatim copies; these tests pin the
contract BOTH streaming loops rely on: (a) the chunks partition the
input exactly (no row lost or duplicated at the half-open cut edges),
(b) chunk i matches the oracle's tercile CASE (``mx * i // n`` cuts),
(c) mtimes strictly increase so maxFilesPerTrigger=1 replays them in
batch order, (d) the env knob changes the batch count without moving
the default.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from stakehouse_etl_spark.streaming.staging import (
    stage_id_range_batches,
    stream_batch_count,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 91)], "doc_id long, text string"
    )


def _chunks(src):
    return sorted(f for f in os.listdir(src) if f.endswith(".parquet"))


def test_chunks_partition_input_exactly(spark, docs):
    with tempfile.TemporaryDirectory() as wd:
        src = stage_id_range_batches(docs, wd)
        assert _chunks(src) == ["1.parquet", "2.parquet", "3.parquet"]
        # the completion manifest is underscore-prefixed so Spark's
        # file listing (and the streaming file source) ignores it
        assert os.path.exists(os.path.join(src, "_staging_manifest.json"))
        back = spark.read.parquet(src)
        assert back.count() == 90
        assert back.select("doc_id").distinct().count() == 90


def test_cut_edges_match_oracle_terciles(spark, docs):
    # mx=90, n=3 -> cuts at 30 and 60; chunk i covers (lo, hi].
    with tempfile.TemporaryDirectory() as wd:
        src = stage_id_range_batches(docs, wd)
        for i, (lo, hi) in enumerate([(1, 30), (31, 60), (61, 90)], 1):
            ids = sorted(
                r.doc_id
                for r in spark.read.parquet(
                    os.path.join(src, f"{i}.parquet")
                ).collect()
            )
            assert ids == list(range(lo, hi + 1)), f"chunk {i}"


def test_mtimes_strictly_increase(spark, docs):
    with tempfile.TemporaryDirectory() as wd:
        src = stage_id_range_batches(docs, wd)
        mtimes = [
            os.path.getmtime(os.path.join(src, f)) for f in _chunks(src)
        ]
        assert mtimes == sorted(mtimes)
        assert len(set(mtimes)) == len(mtimes)


def test_restage_same_params_reuses_directory(spark, docs):
    with tempfile.TemporaryDirectory() as wd:
        src = stage_id_range_batches(docs, wd)
        mtimes = {f: os.path.getmtime(os.path.join(src, f)) for f in _chunks(src)}
        src2 = stage_id_range_batches(docs, wd)
        assert src2 == src
        # untouched: same files, same mtimes the checkpoint ordered on
        assert {f: os.path.getmtime(os.path.join(src, f)) for f in _chunks(src)} == mtimes


def test_restage_different_batch_count_fails_loudly(spark, docs, monkeypatch):
    # ADVICE r10: a resume with a different SPARK_GRAFT_STREAM_BATCHES
    # must NOT silently reuse chunks cut at different id ranges (or
    # rewrite them under paths a checkpoint already processed).
    with tempfile.TemporaryDirectory() as wd:
        stage_id_range_batches(docs, wd)
        monkeypatch.setenv("SPARK_GRAFT_STREAM_BATCHES", "5")
        with pytest.raises(RuntimeError, match="staged with"):
            stage_id_range_batches(docs, wd)


def test_torn_staging_without_manifest_is_rebuilt(spark, docs):
    # No manifest => the prior staging never completed (manifest is
    # written last), so no checkpoint saw it — rebuild cleanly, even
    # over a chunk file torn mid-copy.
    with tempfile.TemporaryDirectory() as wd:
        src = stage_id_range_batches(docs, wd)
        os.remove(os.path.join(src, "_staging_manifest.json"))
        with open(os.path.join(src, "2.parquet"), "wb") as fh:
            fh.write(b"torn")
        src2 = stage_id_range_batches(docs, wd)
        assert src2 == src
        assert spark.read.parquet(src).count() == 90


def test_batch_count_env_knob(spark, docs, monkeypatch):
    assert stream_batch_count() == 3
    monkeypatch.setenv("SPARK_GRAFT_STREAM_BATCHES", "5")
    assert stream_batch_count() == 5
    with tempfile.TemporaryDirectory() as wd:
        src = stage_id_range_batches(docs, wd)
        assert len(_chunks(src)) == 5
        assert spark.read.parquet(src).count() == 90
