"""Idempotent sinks.

The reference's only write primitives are MySQL ``INSERT … ON DUPLICATE
KEY UPDATE`` (upsert, SURVEY §2.1 K1) and ``INSERT IGNORE`` (keep-first,
K2), both batched and idempotent so SQS redelivery is safe (T5).

On a Parquet warehouse the equivalent durability contract is
*deterministic recompute + atomic partition replace*:

- ``write_upsert`` — union incoming rows with the existing table,
  keep the newest row per primary key (``row_number() == 1`` over a
  monotonically increasing ingest version), and atomically replace
  the affected partitions (dynamic partition overwrite). This is the
  plain-Parquet rendering of Delta ``MERGE INTO``.
- ``write_insert_ignore`` — same, but keep the *oldest* row per key.

Both writers shuffle once on the primary key; at 100 TB pass
``partition_cols`` (e.g. an epoch bucket) so only touched partitions
rewrite — the whole-table path is for small dims/state only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_VERSION_COL = "__ingest_version"


def _merge(
    existing: DataFrame | None,
    incoming: DataFrame,
    keys: list[str],
    keep: str,
) -> DataFrame:
    """Resolve key conflicts between existing and incoming rows.

    ``keep='incoming'`` → upsert semantics (K1); ``keep='existing'`` →
    insert-ignore semantics (K2).
    """
    incoming_v = incoming.withColumn(_VERSION_COL, F.lit(1))
    if existing is None:
        merged = incoming_v
    else:
        existing_v = existing.select(*incoming.columns).withColumn(
            _VERSION_COL, F.lit(0)
        )
        merged = existing_v.unionByName(incoming_v)
    order = F.desc(_VERSION_COL) if keep == "incoming" else F.asc(_VERSION_COL)
    w = Window.partitionBy(*keys).orderBy(order)
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", _VERSION_COL)
    )


def _write(df: DataFrame, path: str, partition_cols: list[str] | None) -> None:
    writer = df.write.mode("overwrite")
    if partition_cols:
        # Dynamic partition overwrite: only partitions present in `df`
        # are replaced — the backfill/idempotency contract (SURVEY T4/T5).
        writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(
            *partition_cols
        )
    writer.parquet(path)


def write_cdc(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_val: str = "D",
    partition_cols: list[str] | None = None,
) -> None:
    """Apply one CDC batch (upserts + delete tombstones) to the table.

    Within the batch the LAST op per key (by ``seq_cols``) decides:
    delete removes the key, anything else upserts the row. Same
    single-shuffle merge shape as :func:`write_upsert`, plus one
    anti-join for the tombstones — the plain-Parquet rendering of
    Delta ``MERGE ... WHEN MATCHED AND op = 'D' THEN DELETE``.
    Batches must be applied in change order (the streaming foreachBatch
    contract guarantees it).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in seq_cols])
    compact = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    ups = compact.filter(F.col(op_col) != delete_val).drop(op_col)
    dels = compact.filter(F.col(op_col) == delete_val).select(*keys)
    try:
        existing = spark.read.parquet(path)
    except Exception:
        existing = None
    if existing is not None:
        base = existing.join(dels, keys, "left_anti")
        merged = _merge(base, ups, keys, keep="incoming")
        if not partition_cols:
            merged = spark.createDataFrame(merged.collect(), merged.schema)
    else:
        merged = ups
    _write(merged, path, partition_cols)


def write_upsert(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """K1: INSERT … ON DUPLICATE KEY UPDATE → newest-wins merge + atomic write."""
    try:
        existing = spark.read.parquet(path)
    except Exception:
        existing = None
    merged = _merge(existing, incoming, keys, keep="incoming")
    if existing is not None and not partition_cols:
        # Full overwrite reads then rewrites the table; must materialize
        # the merge before clobbering the input files.
        merged = spark.createDataFrame(merged.collect(), merged.schema)
    _write(merged, path, partition_cols)


def with_epoch_bucket(
    df: DataFrame, time_col: str = "epoch", epochs_per_bucket: int = 225
) -> DataFrame:
    """Add the physical partition key for entity-time tables:
    ``epoch_bucket = epoch // N`` (default 225 = one day of beacon
    epochs, ``src/utils/constants.py:4``). Epoch-range predicates then
    prune partitions at the scan (SURVEY §1.4 / §4)."""
    return df.withColumn(
        "epoch_bucket", (F.col(time_col) / epochs_per_bucket).cast("long")
    )


def write_time_partitioned(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    time_col: str = "epoch",
    epochs_per_bucket: int = 225,
) -> None:
    """K1 upsert into an epoch-bucket-partitioned layout: only the
    buckets present in ``incoming`` are merged and atomically replaced
    (dynamic partition overwrite) — the steady-state incremental write
    touches one or two day-partitions regardless of table history size,
    and backfills (T4) rewrite exactly the repaired buckets."""
    bucketed = with_epoch_bucket(incoming, time_col, epochs_per_bucket)
    try:
        existing = spark.read.parquet(path)
        touched = [
            r[0] for r in bucketed.select("epoch_bucket").distinct().collect()
        ]
        existing = existing.filter(F.col("epoch_bucket").isin(touched))
    except Exception:
        existing = None
    merged = _merge(existing, bucketed, keys, keep="incoming")
    if existing is not None:
        # Materialize before overwriting the files being read. Bounded:
        # only the touched buckets' rows, not the table.
        merged = spark.createDataFrame(merged.collect(), merged.schema)
    _write(merged, path, ["epoch_bucket"])


def write_insert_ignore(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """K2: INSERT IGNORE → oldest-wins merge + atomic write."""
    try:
        existing = spark.read.parquet(path)
    except Exception:
        existing = None
    merged = _merge(existing, incoming, keys, keep="existing")
    if existing is not None and not partition_cols:
        merged = spark.createDataFrame(merged.collect(), merged.schema)
    _write(merged, path, partition_cols)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """Hash-bucketed (and per-file sorted) warehouse table: the
    co-located-join layout. Two tables bucketed by the same key with
    the same bucket count join with NO exchange on either side — at
    100 TB, pre-bucketing the fact tables on their join key (e.g.
    ``bls_key`` or ``orderkey``) turns every steady-state fact⋈fact
    join and keyed aggregation into a shuffle-free stage. Parquet
    datasource table; pass ``path`` for an external location."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*(sort_by or keys))
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
