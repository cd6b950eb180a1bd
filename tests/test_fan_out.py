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


def test_already_repartitioned_frame_passes_through(spark, tmp_path):
    """ADVICE r10: inputFiles() traverses to leaf scans, so a frame
    already repartitioned upstream over a few-row-group source still
    reports the few leaf files — but its partitions are REAL shuffle
    outputs. The row-group branch must not force a second full
    shuffle on leaf-footer evidence."""
    target = spark.sparkContext.defaultParallelism
    path = os.path.join(str(tmp_path), "single")
    spark.range(10_000).selectExpr(
        "id", "repeat('x', 8) as payload"
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path).repartition(target)
    out = fan_out(df)
    assert out is df, "expected identity pass-through, got a new plan"


def test_small_single_file_input_fans_out(spark):
    from stakehouse_etl_spark.io.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = fan_out(docs)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_single_file_few_row_groups_fans_out(spark, tmp_path):
    """Byte-range splits LIE for few-file parquet (r10 zipf catch): a
    single file large enough to plan >= target splits but holding ONE
    row group produces rows in exactly one task — fan_out must detect
    the row-group ceiling from footers and repartition."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = spark.sparkContext.defaultParallelism
    import random

    rng = random.Random(7)
    n = 100_000
    path = os.path.join(str(tmp_path), "one_rg.parquet")
    # Incompressible payload so the file is big enough to plan many
    # byte-range splits at the shrunk maxPartitionBytes below.
    pq.write_table(
        pa.table(
            {
                "id": list(range(n)),
                "payload": [
                    "%064x" % rng.getrandbits(256) for _ in range(n)
                ],
            }
        ),
        path,
        row_group_size=n,  # ONE row group
    )
    assert pq.read_metadata(path).num_row_groups == 1
    df = spark.read.parquet(path)
    # Precondition: the scan plans multiple byte-range splits (the
    # pre-fix pass-through condition). If the file is too small for
    # that on some conf, shrink maxPartitionBytes for the probe.
    before = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
        df = spark.read.parquet(path)
        assert df.rdd.getNumPartitions() >= target, "precondition"
        out = fan_out(df)
        assert out.rdd.getNumPartitions() >= target
        # The real invariant: rows actually SPREAD across tasks.
        per_part = out.rdd.glom().map(len).collect()
        assert sum(1 for c in per_part if c > 0) >= target // 2
    finally:
        if before is None:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", before)
