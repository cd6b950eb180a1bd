"""Delta-arm parity for the sink family (VERDICT r2 task 6).

Skip-marked when `delta-spark` is absent (this container bakes no
extra packages — same env-gate pattern as the PIL codec tests). Where
the package IS present, the same batch sequences run through the
hand-rolled staging sinks AND Delta MERGE, and the final tables must
be row-identical; time travel must reproduce the staged snapshots.

The import-surface test always runs: the gated module must import and
probe cleanly with or without the package.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from stakehouse_etl_spark.io import table_formats as tf

DELTA = tf.delta_available()


def test_gate_probe_is_clean():
    # must never raise, with or without delta installed
    assert tf.delta_importable() in (True, False)
    if not tf.delta_importable():
        assert tf.delta_session() is None
        assert not DELTA


@pytest.mark.skipif(not DELTA, reason="delta-spark not installed")
def test_upsert_parity_with_staging_sink():
    from stakehouse_etl_spark.io.sinks import write_upsert

    spark = tf.delta_session()
    work = tempfile.mkdtemp(prefix="delta_par_")
    try:
        hand, delt = os.path.join(work, "hand"), os.path.join(work, "delta")
        batches = [
            [(1, 10, "a"), (2, 20, "b")],
            [(2, 21, "b2"), (3, 30, "c")],  # update 2, insert 3
            [(1, 11, None)],  # NULL payload update
        ]
        for rows in batches:
            df = spark.createDataFrame(rows, "k long, v long, s string")
            write_upsert(spark, df, hand, keys=["k"])
            tf.write_upsert_delta(spark, df, delt, keys=["k"])
        a = sorted(map(tuple, spark.read.parquet(hand).collect()))
        b = sorted(map(tuple, spark.read.format("delta").load(delt).collect()))
        assert a == b
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.skipif(not DELTA, reason="delta-spark not installed")
def test_insert_ignore_parity():
    from stakehouse_etl_spark.io.sinks import write_insert_ignore

    spark = tf.delta_session()
    work = tempfile.mkdtemp(prefix="delta_par_")
    try:
        hand, delt = os.path.join(work, "hand"), os.path.join(work, "delta")
        for rows in [[(1, 10)], [(1, 99), (2, 20)]]:
            df = spark.createDataFrame(rows, "k long, v long")
            write_insert_ignore(spark, df, hand, keys=["k"])
            tf.write_insert_ignore_delta(spark, df, delt, keys=["k"])
        a = sorted(map(tuple, spark.read.parquet(hand).collect()))
        b = sorted(map(tuple, spark.read.format("delta").load(delt).collect()))
        assert a == b == [(1, 10), (2, 20)]
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.skipif(not DELTA, reason="delta-spark not installed")
def test_cdc_and_time_travel_parity():
    from stakehouse_etl_spark.io.sinks import write_cdc

    spark = tf.delta_session()
    work = tempfile.mkdtemp(prefix="delta_par_")
    try:
        hand, delt = os.path.join(work, "hand"), os.path.join(work, "delta")
        b1 = [(1, 10, "U"), (2, 20, "U")]
        # b2 carries MULTIPLE ops for key 1 (the normal CDC shape —
        # ADVICE r3: un-compacted, Delta MERGE would raise 'multiple
        # source rows matched'); last by seq wins -> 1 deleted.
        b2 = [(1, 0, "U"), (1, 5, "D"), (3, 30, "U")]
        for rows in [b1, b2]:
            df = spark.createDataFrame(rows, "k long, v long, op string")
            write_cdc(spark, df, hand, keys=["k"], seq_cols=["v"])
            tf.apply_cdc_delta(spark, df, delt, keys=["k"], seq_cols=["v"])
        a = sorted(map(tuple, spark.read.parquet(hand).collect()))
        b = sorted(map(tuple, spark.read.format("delta").load(delt).collect()))
        assert a == b == [(2, 20), (3, 30)]
        # time travel: version 0 holds the pre-delete state
        v0 = sorted(
            map(tuple, tf.read_version_delta(spark, delt, 0).collect())
        )
        assert v0 == [(1, 10), (2, 20)]
    finally:
        shutil.rmtree(work, ignore_errors=True)
