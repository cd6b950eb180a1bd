"""Custom V2 writer: two-phase commit protocol invariants."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from stakehouse_etl_spark.io.datasource import (
    JsonLinesDataSource,
    read_jsonl_committed,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="jsonl_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _register(spark):
    try:
        spark.dataSource.register(JsonLinesDataSource)
    except Exception:
        pass


def test_roundtrip_and_manifest(spark, root):
    _register(spark)
    path = f"{root}/t"
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    df.write.format("warehouse_jsonl").option("path", path).mode(
        "append"
    ).save()
    assert os.path.exists(f"{path}/_MANIFEST")
    back = read_jsonl_committed(spark, path, "id long, v long")
    assert back.count() == 100
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(2 * i for i in range(100))
    # no stray tmp files after a successful commit
    assert not [f for f in os.listdir(path) if f.endswith(".tmp")]


def test_torn_files_invisible(spark, root):
    _register(spark)
    path = f"{root}/t"
    spark.range(10).toDF("id").write.format("warehouse_jsonl").option(
        "path", path
    ).mode("append").save()
    # a crashed task's stray tmp and an unlisted stray part: invisible
    with open(f"{path}/part-stray.jsonl.tmp", "w") as f:
        f.write('{"id": 999}\n')
    with open(f"{path}/part-unlisted.jsonl", "w") as f:
        f.write('{"id": 998}\n')
    back = read_jsonl_committed(spark, path, "id long")
    ids = {r.id for r in back.collect()}
    assert 999 not in ids and 998 not in ids
    assert len(ids) == 10


def test_uncommitted_dir_raises(spark, root):
    with pytest.raises(FileNotFoundError):
        read_jsonl_committed(spark, f"{root}/absent", "id long")
