"""Open-table-format arm for the sink family (VERDICT r2 task 6).

The hand-rolled staging/rename sinks (`io.sinks`) implement the
upsert / insert-ignore / CDC / snapshot semantics the reference's
MySQL contract needs (`reference/src/utils/data_utils.py:10-15` —
INSERT … ON DUPLICATE KEY UPDATE, INSERT IGNORE). In production those
semantics would ride a real table format (Delta Lake / Iceberg),
whose MERGE and time travel are the same contracts with a
transaction log instead of directory swaps. This module is the
env-gated bridge: when `delta-spark` is importable (it is NOT in this
container — no package installs; the tests skip-mark, same pattern
as the PIL codec gate in `operators.multimodal`), the sink semantics
run through Delta and the parity tests assert row-equality against
the hand-rolled sinks.

All APIs here are the public delta-spark ones (DeltaTable.merge,
`versionAsOf` reads); nothing proprietary.
"""

from __future__ import annotations

import importlib.util

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def delta_importable() -> bool:
    """The python package exists (jars may still be missing — use
    :func:`delta_available` for an end-to-end probe)."""
    return importlib.util.find_spec("delta") is not None


def delta_session(app_name: str = "stakehouse-etl-spark-delta"):
    """A SparkSession with the Delta extension configured, or None.

    Delta needs its SQL extension + catalog set BEFORE session start,
    so this builds its own session (configure_spark_with_delta_pip
    resolves the matching jars from the installed package)."""
    if not delta_importable():
        return None
    try:
        from delta import configure_spark_with_delta_pip

        builder = (
            SparkSession.builder.appName(app_name)
            .master("local[4]")
            .config(
                "spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension",
            )
            .config(
                "spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog",
            )
            .config("spark.sql.session.timeZone", "UTC")
        )
        return configure_spark_with_delta_pip(builder).getOrCreate()
    except Exception:
        return None


def delta_available() -> bool:
    """True iff a Delta-enabled session can actually be built."""
    spark = delta_session()
    return spark is not None


def _delta_table(spark: SparkSession, path: str):
    from delta.tables import DeltaTable

    return DeltaTable.forPath(spark, path) if DeltaTable.isDeltaTable(
        spark, path
    ) else None


def _merge_cond(keys: list[str]) -> str:
    # eqNullSafe (<=>) mirrors io.sinks' NULL-op upsert semantics:
    # a NULL key component matches NULL, never silently misses.
    return " AND ".join(f"t.{k} <=> s.{k}" for k in keys)


def write_upsert_delta(
    spark: SparkSession, incoming: DataFrame, path: str, keys: list[str]
) -> None:
    """K1 via Delta MERGE: newest-wins upsert — the same contract as
    ``io.sinks.write_upsert`` (reference: INSERT … ON DUPLICATE KEY
    UPDATE, src/utils/data_utils.py:10)."""
    tbl = _delta_table(spark, path)
    if tbl is None:
        incoming.write.format("delta").mode("overwrite").save(path)
        return
    (
        tbl.alias("t")
        .merge(incoming.alias("s"), _merge_cond(keys))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def write_insert_ignore_delta(
    spark: SparkSession, incoming: DataFrame, path: str, keys: list[str]
) -> None:
    """K2 via Delta MERGE: oldest-wins (insert only when the key is
    absent) — ``io.sinks.write_insert_ignore`` / INSERT IGNORE."""
    tbl = _delta_table(spark, path)
    if tbl is None:
        # first write must still dedup WITHIN the batch (oldest wins
        # by key, matching io.sinks._merge keep='existing' semantics
        # for a fresh table: arbitrary-but-single row per key).
        deduped = incoming.dropDuplicates(keys)
        deduped.write.format("delta").mode("overwrite").save(path)
        return
    (
        tbl.alias("t")
        .merge(incoming.dropDuplicates(keys).alias("s"), _merge_cond(keys))
        .whenNotMatchedInsertAll()
        .execute()
    )


def apply_cdc_delta(
    spark: SparkSession,
    changes: DataFrame,
    path: str,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_val: str = "D",
) -> None:
    """CDC apply via Delta MERGE: upserts + deletes in one atomic
    commit — the contract of ``io.sinks.write_cdc``, including the
    SAME delete marker default (``delete_val='D'``) and the SAME
    within-batch resolution (the LAST op per key by ``seq_cols``
    decides) so the two arms are drop-in interchangeable.

    The pre-resolution is load-bearing, not just parity (ADVICE r3):
    a normal CDC batch carries multiple ops for one key, and Delta
    MERGE raises ``multiple source rows matched`` at runtime on a
    key-duplicate source — the compaction is what makes the merge
    legal at all.

    Ordering carries the same tiebreakers as ``write_cdc``: ``op_col``
    desc NULLs-last (ADVICE r4), then an xxhash64 over the remaining
    payload columns in sorted-name order (review r5) — so even two
    equal-seq SAME-op rows with different payloads resolve identically
    in both arms and across runs, never by physical row order."""
    payload_cols = sorted(
        c for c in changes.columns
        if c not in set(keys) | set(seq_cols) | {op_col}
    )
    tiebreak = (
        [F.desc(F.xxhash64(*payload_cols))] if payload_cols else []
    )
    w = Window.partitionBy(*keys).orderBy(
        *[F.desc(c) for c in seq_cols], F.desc_nulls_last(op_col), *tiebreak
    )
    compact = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    tbl = _delta_table(spark, path)
    is_del = F.col(op_col).eqNullSafe(F.lit(delete_val))
    if tbl is None:
        compact.filter(~is_del).drop(op_col).write.format("delta").mode(
            "overwrite"
        ).save(path)
        return
    (
        tbl.alias("t")
        .merge(compact.alias("s"), _merge_cond(keys))
        # Null-safe compares: write_cdc treats a NULL op as an upsert
        # (test_cdc_null_op_upserts); plain = / <> would evaluate to
        # NULL for those rows and fire NO clause, silently dropping
        # them from this arm only (review r5).
        .whenMatchedDelete(condition=f"s.{op_col} <=> '{delete_val}'")
        .whenMatchedUpdateAll(condition=f"NOT (s.{op_col} <=> '{delete_val}')")
        .whenNotMatchedInsertAll(
            condition=f"NOT (s.{op_col} <=> '{delete_val}')"
        )
        .execute()
    )


def read_version_delta(
    spark: SparkSession, path: str, version: int
) -> DataFrame:
    """Time travel — the Delta analog of ``io.sinks.read_snapshot``."""
    return (
        spark.read.format("delta")
        .option("versionAsOf", version)
        .load(path)
    )
