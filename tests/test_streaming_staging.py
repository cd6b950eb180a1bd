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


def test_chunks_partition_input_exactly(spark, docs):
    with tempfile.TemporaryDirectory() as wd:
        src = stage_id_range_batches(docs, wd)
        files = sorted(os.listdir(src))
        assert files == ["1.parquet", "2.parquet", "3.parquet"]
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
            os.path.getmtime(os.path.join(src, f))
            for f in sorted(os.listdir(src))
        ]
        assert mtimes == sorted(mtimes)
        assert len(set(mtimes)) == len(mtimes)


def test_batch_count_env_knob(spark, docs, monkeypatch):
    assert stream_batch_count() == 3
    monkeypatch.setenv("SPARK_GRAFT_STREAM_BATCHES", "5")
    assert stream_batch_count() == 5
    with tempfile.TemporaryDirectory() as wd:
        src = stage_id_range_batches(docs, wd)
        assert len(os.listdir(src)) == 5
        assert spark.read.parquet(src).count() == 90
