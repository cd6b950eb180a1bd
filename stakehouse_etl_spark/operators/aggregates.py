"""Aggregation operators (SURVEY §2.4 A1–A10).

All grouped aggregates get map-side partial aggregation + final merge
from Catalyst for free (the reference's MySQL did this internally; its
Python-side ``sum``/``mean``/``len`` loops did not). ``exact_*``
variants implement order-independent money sums: doubles summed in
different orders round differently, so for oracle-parity (and for
determinism at any scale) monetary sums go through integer cents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_money_sum(col: str | Column, scale: int = 100) -> Column:
    """Order-independent sum of a fixed-point-decimal double column.

    ``sum(round(x*scale)::bigint)/scale`` — integer addition is exact
    and associative, so partial/final aggregation order (and a 1000×
    scale-up) cannot change the result. The single final division is
    performed once on an exact integer.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * scale).cast("long")) / float(scale)


def exact_money_avg(col: str | Column, scale: int = 100) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(F.round(c * scale).cast("long")) / float(scale)) / F.count(c)


def grouped_summary(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    avg_cols: list[str] | None = None,
    money: bool = True,
) -> DataFrame:
    """A1–A7 composite: MAX/MIN/SUM/AVG/COUNT grouped by ``keys``."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in sum_cols or []:
        expr = exact_money_sum(c) if money else F.sum(c)
        aggs.append(expr.alias(f"sum_{c}"))
    for c in avg_cols or []:
        expr = exact_money_avg(c) if money else F.avg(c)
        aggs.append(expr.alias(f"avg_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def two_level_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    value: str,
    fine_agg: str = "sum",
) -> DataFrame:
    """A9: aggregate at a fine grain, then roll up to a coarse grain.

    Reference: per-slot withdrawal amounts summed per (validator, slot),
    then rolled up per (bls_key, epoch)
    (``src/validator_withdrawals_handler.py:66-103``). Catalyst keeps
    the second aggregation shuffle-free when ``coarse_keys`` is a
    prefix-derivation of ``fine_keys``' partitioning; otherwise it's
    two cheap shuffles of already-reduced data.
    """
    fine = df.groupBy(*fine_keys).agg(
        getattr(F, fine_agg)(value).alias(f"{fine_agg}_{value}")
    )
    return fine.groupBy(*coarse_keys).agg(
        F.sum(f"{fine_agg}_{value}").alias(f"{fine_agg}_{value}")
    )


def distinct_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """A6: SELECT DISTINCT — hash aggregate, map-side partials first."""
    return df.select(*cols).distinct()


def group_collect(
    df: DataFrame, key: str, collect_col: str, sort_result: bool = True
) -> DataFrame:
    """A8: the reference's sorted-stream ``itertools.groupby``
    (``src/utils/apiUtils.py:56``) → grouped ``collect_list``.

    ``sort_result`` sorts each collected list for deterministic output
    (``collect_list`` order is partition-dependent otherwise).
    """
    collected = df.groupBy(key).agg(F.collect_list(collect_col).alias(collect_col + "s"))
    if sort_result:
        collected = collected.withColumn(
            collect_col + "s", F.sort_array(F.col(collect_col + "s"))
        )
    return collected
