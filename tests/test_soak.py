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


def test_backfill_repairs_bucketed_warehouse(spark):
    """T4 into the epoch-bucket-partitioned warehouse: a gap-stalled
    key resumes after a backfill rewrites exactly the repaired
    buckets; the repaired table equals a clean full recompute."""
    from pyspark.sql import functions as F

    from stakehouse_etl_spark.operators.windows import cumulative_income
    from stakehouse_etl_spark.streaming.incremental import (
        backfill_income,
        incremental_income_run,
    )

    # key "a": epochs 0-9 with a hole at 4 (gap-stop halts at 3)
    rows = [("a", e, float(100 + e)) for e in range(10) if e != 4]
    bal_holed = spark.createDataFrame(rows, "bls_key string, epoch long, balance double")
    bal_full = spark.createDataFrame(
        [("a", e, float(100 + e)) for e in range(10)],
        "bls_key string, epoch long, balance double",
    )
    import os
    import shutil
    import tempfile

    wh = tempfile.mkdtemp(prefix="bf_")
    try:
        sp, ip = os.path.join(wh, "s"), os.path.join(wh, "i")
        incremental_income_run(
            spark, bal_holed, state_path=sp, income_path=ip,
            money_scale=100, epochs_per_bucket=5,
        )
        assert spark.read.parquet(ip).agg(F.max("epoch")).first()[0] == 3
        # repair: the hole's epoch arrives; backfill [4, 9]
        backfill_income(
            spark, bal_full, ip, lo=4, hi=9,
            money_scale=100, epochs_per_bucket=5,
        )
        got = {
            (r.bls_key, r.epoch): (r.earnings, r.losses)
            for r in spark.read.parquet(ip).collect()
        }
        expect = {
            (r.bls_key, r.epoch): (r.earnings, r.losses)
            for r in cumulative_income(
                bal_full, key="bls_key", time="epoch", money_scale=100
            ).collect()
        }
        assert got == expect
    finally:
        shutil.rmtree(wh, ignore_errors=True)
