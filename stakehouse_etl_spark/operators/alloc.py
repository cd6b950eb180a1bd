"""Deterministic integer apportionment (largest-remainder / Hamilton).

Reusable form of the source-mixing allocator
(queries/pipeline2.py::corpus_mix_allocation's kernel): given per-key
integer weights, split an integer budget proportionally so the parts
sum EXACTLY to the budget — the arithmetic a data-mixture config needs
(float weights round to budget±1 and differ between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def largest_remainder_alloc(
    df: DataFrame, key_col: str, weight_col: str, budget: int
) -> DataFrame:
    """Apportion ``budget`` across keys proportionally to
    ``weight_col`` (non-negative BIGINTs, total > 0) with
    largest-remainder rounding; remainder ties break by key ascending.

    Output: key, weight, base_alloc, extra (0/1), final_alloc — with
    ``sum(final_alloc) == budget`` and ``|final_alloc − ideal| < 1``
    per key, deterministically.

    Scale shape: the input here is an already-aggregated per-key table
    (#keys rows); the global windows below are single-partition by
    design and cost #keys, not corpus size. Pure BIGINT arithmetic:
    ``budget × weight`` must fit int64 — at larger magnitudes widen to
    DECIMAL(38,0), same plan."""
    w_all = Window.partitionBy()
    g = df.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        F.sum(weight_col).over(w_all).cast("long").alias("total"),
    ).select(
        "key",
        "weight",
        F.expr(f"({budget} * weight) div total").alias("base_alloc"),
        ((F.lit(budget) * F.col("weight")) % F.col("total")).alias("rem"),
    )
    r = g.select(
        "*",
        (F.lit(budget) - F.sum("base_alloc").over(w_all)).alias("leftover"),
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("key")))
        .cast("long")
        .alias("rnk"),
    )
    extra = F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
    return r.select(
        "key",
        "weight",
        "base_alloc",
        extra.cast("long").alias("extra"),
        (F.col("base_alloc") + extra).cast("long").alias("final_alloc"),
    )
