"""Dynamic partition pruning: plan + result evidence.

The mechanism claim of ``j21_dpp_month_join``: with the fact table
partitioned by month and the month dim filtered, the fact SCAN must
carry a ``dynamicpruning`` expression in its partition filters —
i.e. Spark reads only the dim's surviving month directories, decided
at RUNTIME.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from stakehouse_etl_spark.io.sources import load_table
from stakehouse_etl_spark.queries.pipeline27 import (
    build_month_partitioned_orders,
    dpp_month_rollup,
)


def test_dpp_expression_in_plan_and_result_parity(spark, sf_dir):
    root = tempfile.mkdtemp(prefix="dpp_test_")
    try:
        fact_path = os.path.join(root, "orders_by_month")
        build_month_partitioned_orders(spark, sf_dir, fact_path)
        months = (
            load_table(spark, sf_dir, "orders")
            .select(F.date_format("o_orderdate", "yyyy-MM").alias("o_month"))
            .distinct()
            .filter(F.col("o_month").between("1995-01", "1995-03"))
        )
        out = dpp_month_rollup(spark, fact_path, months)

        plan = out._jdf.queryExecution().executedPlan().toString().lower()
        assert "dynamicpruning" in plan, plan[:2000]

        # result parity with the static-filter equivalent
        want = {
            (r["o_month"], r["n_orders"], r["cents"])
            for r in load_table(spark, sf_dir, "orders")
            .withColumn(
                "o_month", F.date_format("o_orderdate", "yyyy-MM")
            )
            .filter(F.col("o_month").between("1995-01", "1995-03"))
            .groupBy("o_month")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("cents"),
            )
            .collect()
        }
        got = {
            (r["o_month"], r["n_orders"], r["cents"]) for r in out.collect()
        }
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)
