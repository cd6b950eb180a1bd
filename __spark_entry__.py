"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``stakehouse_etl_spark`` package; this
module is the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from stakehouse_etl_spark.queries.catalog import oracle_map, query_map  # noqa: E402
from stakehouse_etl_spark.session import apply_engine_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the W1 cumulative
    income window — the engine's spine (SURVEY §7 step 2)."""
    apply_engine_conf(spark)
    return query_map()["w1_user_income"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    beyond-reference data-pipeline operators)."""
    base = query_map()

    def _with_conf(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_engine_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _with_conf(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible
    ops — the driver records a weaker rows-only check for those)."""
    return oracle_map()
