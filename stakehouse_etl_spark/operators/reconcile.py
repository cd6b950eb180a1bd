"""Warehouse-vs-source reconciliation (the external cross-check tier).

The reference validates its ETL output against INDEPENDENT sources:
``scripts/check-sweeps.js:49-140`` pulls per-validator sweep reports
through the SDK *and* the beaconcha.in performance API, then writes a
side-by-side diff file. That pattern — recompute a per-key total from
the warehouse, fetch the same total from an external source, full-
outer-join, classify — is generic data-quality tooling, so it lives
here as an operator.

Status classification (one row per key, never aggregated away — the
point of a reconciliation report is the per-key audit trail):

- ``match``               |warehouse − source| <= tol
- ``mismatch``            both present, differ beyond tol
- ``missing_in_source``   warehouse has the key, source doesn't
- ``missing_in_warehouse``source has the key, warehouse doesn't

Plan shape: one full-outer shuffle join on the key set; both inputs
are per-key aggregates, so the join runs on the reduced (small)
tables, not the raw fact data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile_keyed(
    warehouse: DataFrame,
    source: DataFrame,
    keys: list[str],
    warehouse_col: str,
    source_col: str,
    tol: int = 0,
) -> DataFrame:
    """Full-outer diff of two per-key value tables.

    Returns ``keys + (warehouse_col, source_col, diff, status)``;
    ``diff`` is NULL when either side is missing.
    """
    # Presence is a pre-join flag, NOT value nullity: a key present on
    # both sides with a NULL value is a value mismatch to investigate,
    # not a missing key (the two conditions mean different things in an
    # audit report).
    j = warehouse.withColumn("__w_present", F.lit(True)).join(
        source.withColumn("__s_present", F.lit(True)), keys, "full_outer"
    )
    w, s = F.col(warehouse_col), F.col(source_col)
    diff = w - s
    status = (
        F.when(F.col("__s_present").isNull(), F.lit("missing_in_source"))
        .when(F.col("__w_present").isNull(), F.lit("missing_in_warehouse"))
        .when(w.eqNullSafe(s) | (F.abs(diff) <= tol), F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    return j.select(
        *keys, warehouse_col, source_col, diff.alias("diff"), status.alias("status")
    )


def reconcile_summary(report: DataFrame) -> DataFrame:
    """Roll the per-key report into the headline match-rate row the
    reconciliation job alerts on."""
    return report.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("status") == "match", 1).otherwise(0)).alias("n_match"),
        F.sum(F.when(F.col("status") == "mismatch", 1).otherwise(0)).alias(
            "n_mismatch"
        ),
        F.sum(
            F.when(F.col("status").startswith("missing"), 1).otherwise(0)
        ).alias("n_missing"),
    )
