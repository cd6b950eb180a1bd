"""Warehouse-soak invariants (VERDICT r2 task 4).

The catalog query enforces its operational contracts as RuntimeErrors
(bounded file counts, replay-is-a-no-op, serveable mid-soak); here we
run the loop on sf0.001 and additionally assert the incremental
result equals a direct one-shot batch recompute through
``cumulative_income`` — the equality the DuckDB oracle also checks at
sf0.01, proven here against the Spark batch path itself.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from stakehouse_etl_spark.queries.soak import (
    EPOCHS_PER_BUCKET,
    N_INDEXES,
    _file_census,
    _hourly_balances,
    run_soak_cycles,
)

SF = "/root/testdata/sf0.001"


def test_soak_equals_batch_and_obeys_contracts(spark):
    balances = _hourly_balances(spark, SF)
    censuses = []
    warehouse = tempfile.mkdtemp(prefix="soak_t_")
    try:
        out = run_soak_cycles(
            spark,
            balances,
            warehouse,
            cycle_hook=lambda i, sec, c: censuses.append(c),
        )
        inc = {
            (r["indexes"], r["epoch"]): (
                r["earnings_cents"],
                r["losses_cents"],
                r["n_keys"],
            )
            for r in out.collect()
        }
        income_path = os.path.join(warehouse, "income")
        final_census = _file_census(income_path)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)

    # file counts grow with DATA (bucket count), never shrink per
    # bucket census keys across cycles, and stay bounded per bucket
    max_files = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    for c in censuses + [final_census]:
        assert c and max(c.values()) <= max_files
    assert len(censuses[0]) <= len(censuses[-1])

    # one-shot batch recompute through the Spark batch path
    from stakehouse_etl_spark.operators.windows import cumulative_income

    batch = cumulative_income(
        balances, key="bls_key", time="epoch", money_scale=100
    )
    expect = {
        (r["indexes"], r["epoch"]): (
            r["earnings_cents"],
            r["losses_cents"],
            r["n_keys"],
        )
        for r in batch.select(
            (F.col("bls_key") % N_INDEXES).alias("indexes"),
            "epoch",
            "earnings",
            "losses",
        )
        .groupBy("indexes", "epoch")
        .agg(
            F.sum(F.round(F.col("earnings") * 100).cast("long")).alias(
                "earnings_cents"
            ),
            F.sum(F.round(F.col("losses") * 100).cast("long")).alias(
                "losses_cents"
            ),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .collect()
    }
    assert inc == expect
    assert EPOCHS_PER_BUCKET > 0
