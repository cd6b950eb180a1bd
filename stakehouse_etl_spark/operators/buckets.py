"""Shared bucket-size capping for LSH-family self-joins.

A self-join on a bucket key emits O(b²) pairs from a b-member bucket;
one hot bucket (duplicate cluster, degenerate hyperplane region) can
dominate an entire 100 TB job. Dropping over-cap buckets BEFORE the
join bounds each bucket's output at cap² — standard MinHash-dedup
practice. The window count shuffles on exactly the join key, so the
subsequent self-join reuses the partitioning (no extra exchange).

Used by :mod:`operators.dedup` (band buckets) and
:mod:`operators.similarity` (hyperplane buckets); each mirrors the cap
in its SQL oracles via ``QUALIFY count(*) OVER (PARTITION BY …)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drop_oversize_buckets(
    df: DataFrame, bucket_cols: list[str], max_bucket: int | None
) -> DataFrame:
    """Remove all rows of buckets holding more than ``max_bucket``
    members (``None`` disables the cap)."""
    if max_bucket is None:
        return df
    wb = Window.partitionBy(*bucket_cols)
    return (
        df.withColumn("__bsz", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bsz") <= max_bucket)
        .drop("__bsz")
    )
