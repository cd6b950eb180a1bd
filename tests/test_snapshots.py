"""Versioned-snapshot sink: commit protocol and time travel."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from stakehouse_etl_spark.io.sinks import (
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="snap_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_versions_monotonic_and_latest_default(spark, root):
    path = f"{root}/t"
    assert snapshot_versions(spark, path) == []
    v1 = write_snapshot(spark, spark.range(3).toDF("x"), path)
    v2 = write_snapshot(spark, spark.range(5).toDF("x"), path)
    assert (v1, v2) == (1, 2)
    assert snapshot_versions(spark, path) == [1, 2]
    assert read_snapshot(spark, path).count() == 5  # latest
    assert read_snapshot(spark, path, 1).count() == 3  # pinned


def test_uncommitted_dirs_invisible(spark, root):
    path = f"{root}/t"
    write_snapshot(spark, spark.range(2).toDF("x"), path)
    # a writer that died after mkdir but before _SUCCESS: invisible
    os.makedirs(f"{path}/v=9")
    # a dead staging dir: invisible
    os.makedirs(f"{path}/.__snap_staging__/junk")
    assert snapshot_versions(spark, path) == [1]
    assert read_snapshot(spark, path).count() == 2
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, 9)
    # the next publish recovers: staging is cleared, version counts
    # continue past the torn dir only once it can commit atomically
    v = write_snapshot(spark, spark.range(4).toDF("x"), path)
    assert v == 2
    assert read_snapshot(spark, path).count() == 4


def test_missing_table_raises(spark, root):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, f"{root}/absent")


def test_vacuum_keeps_newest_and_clears_torn(spark, root):
    import os

    from stakehouse_etl_spark.io.sinks import vacuum_snapshots

    path = f"{root}/t"
    for n in (2, 4, 6, 8):
        write_snapshot(spark, spark.range(n).toDF("x"), path)
    os.makedirs(f"{path}/v=99")  # torn, never committed
    deleted = vacuum_snapshots(spark, path, keep_last=2)
    assert deleted == [1, 2]
    assert snapshot_versions(spark, path) == [3, 4]
    assert not os.path.exists(f"{path}/v=99")
    assert read_snapshot(spark, path).count() == 8
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, 1)
