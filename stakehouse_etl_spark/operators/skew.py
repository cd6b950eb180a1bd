"""Skew mitigation (100 TB notes in the build brief).

First line of defense is AQE (``spark.sql.adaptive.skewJoin.enabled``,
on in :mod:`stakehouse_etl_spark.session`): post-shuffle skewed
partitions are split at runtime. These operators are the explicit
fallbacks for the cases AQE cannot fix:

- ``salted_join`` — a hot key on the LARGE side of a non-broadcastable
  join: spread each key across ``n_salts`` shuffle partitions by
  replicating the small side once per salt. Same rows out as a plain
  join, n× the small side shuffled, large side never replicated.
- ``two_stage_agg`` — a hot group key in a high-cardinality-per-group
  aggregate whose partial (map-side) combine isn't enough (e.g.
  collect-like or distinct-ish states): pre-aggregate on
  (key, salt), then finish on key. Only valid for decomposable
  aggregates (sum/count/min/max) — enforced by taking (col, fn) pairs
  from a fixed whitelist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DECOMPOSABLE = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's hot keys spread over
    ``n_salts`` partitions.

    The large side gets a per-row salt (hash of the whole row — cheap,
    deterministic within the run, uniform); the small side is exploded
    ``n_salts``× so every (key, salt) bucket finds its match. Join keys
    become (on…, salt): a key holding 30% of the table now occupies
    ``n_salts`` separate shuffle partitions instead of one straggler.
    """
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(*large.columns), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_large.join(salted_small, on=[*on, "__salt"], how=how).drop("__salt")


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe grouped aggregate: ``aggs`` maps output column →
    (input column, fn) with fn ∈ sum|count|min|max. Stage 1 reduces
    (keys, salt) — the hot key's rows combine in ``n_salts`` parallel
    partitions; stage 2 merges the per-salt partials (count merges by
    SUM). Output equals the plain ``groupBy(keys).agg(...)``."""
    for out, (_, fn) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{out}: '{fn}' is not decomposable")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            _DECOMPOSABLE[fn](col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return stage1.groupBy(*keys).agg(
        *[merge[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )
