"""Portable-SQL surface: the oracle string IS the executed SQL."""

from __future__ import annotations

from stakehouse_etl_spark.queries.catalog import QUERIES
from stakehouse_etl_spark.queries.pipeline18 import _PORTABLE


def test_oracle_is_the_query_text():
    for name, sql in _PORTABLE.items():
        assert QUERIES[name].oracle == sql


def test_portable_runs_on_spark(spark, sf_dir):
    # every portable query parses and returns rows under Spark's ANSI
    # dialect — the DuckDB side is covered by the oracle gate
    for name in _PORTABLE:
        df = QUERIES[name].fn(spark, sf_dir)
        assert df.columns  # parsed + analyzed
        df.count()
