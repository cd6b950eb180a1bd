"""fan_out partition guard (ADVICE r3 minor #3).

The fast path must not trust file COUNT alone: FileSourceScanExec
bin-packs small files, so many tiny files can plan fewer partitions
than defaultParallelism. The size floor forces such inputs through
the exact probe, which repartitions them.
"""

from __future__ import annotations

import os

from stakehouse_etl_spark.operators.text import fan_out


def test_many_tiny_files_still_fan_out(spark, tmp_path):
    """With default confs Spark's bytesPerCore targets default
    parallelism, so packing below target needs a session with file
    confs tuned for fewer/larger splits (minPartitionNum=1 +
    openCostInBytes=0 — e.g. a session tuned for huge scans). The
    count-only fast path would skip the repartition there; the size
    floor must not."""
    target = spark.sparkContext.defaultParallelism
    n_files = target * 4
    src = spark.range(n_files).selectExpr("id", "repeat('x', 10) as payload")
    path = os.path.join(str(tmp_path), "tiny")
    src.repartition(n_files).write.parquet(path)

    before = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.files.minPartitionNum",
            "spark.sql.files.openCostInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.files.minPartitionNum", "1")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        df = spark.read.parquet(path)
        assert len(df.inputFiles()) >= target
        planned = df.rdd.getNumPartitions()
        assert planned < target, (
            "precondition: bin-packing should collapse tiny files "
            f"(got {planned} >= {target})"
        )
        out = fan_out(df)
        assert out.rdd.getNumPartitions() >= target
        assert out.count() == n_files
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_small_single_file_input_fans_out(spark):
    from stakehouse_etl_spark.io.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = fan_out(docs)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
