"""Scalar function library (SURVEY §2.8 F2–F10).

All pure column expressions — evaluated JVM-side inside whole-stage
codegen; no Python UDFs. Reference sites cited per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from stakehouse_etl_spark.functions.financials import SLOTS_PER_EPOCH


# --- F2: epoch <-> slot arithmetic (src/extract_handler.py:109,
#     src/validator_withdrawals_handler.py:54,92) ---
def epoch_end_slot(epoch: Column) -> Column:
    """State at end of epoch lives at slot = epoch*32 − 1."""
    return epoch * SLOTS_PER_EPOCH - 1


def slot_to_epoch(slot: Column) -> Column:
    """epoch = slot // 32 (integer floor division)."""
    return F.floor(slot / SLOTS_PER_EPOCH).cast("long")


# --- F3: block -> epoch (src/index_validator_handler.py:52-54) ---
def block_to_epoch(block: Column, genesis_block: int) -> Column:
    return F.floor((block - genesis_block) / SLOTS_PER_EPOCH).cast("long")


# --- F5: conditional scoring bands (src/api_handler.py:470-475,504-509) ---
def health_score(balance_gwei: Column) -> Column:
    """Validator health: <31.75 ETH → 2 (critical), <32 ETH → 1, else 0."""
    return (
        F.when(balance_gwei < 31.75e9, F.lit(2))
        .when(balance_gwei < 32e9, F.lit(1))
        .otherwise(F.lit(0))
    )


def redemption_band(rate: Column) -> Column:
    """Redemption-rate colour band: >1.25 Red, >1.1 Amber, else Green."""
    return (
        F.when(rate > 1.25, F.lit("Red"))
        .when(rate > 1.1, F.lit("Amber"))
        .otherwise(F.lit("Green"))
    )


# --- F7: string ops (src/api_handler.py:594; src/index_validator_handler.py:85,90;
#     src/utils/sqs.py:31-32) ---
def lower_key(col: Column) -> Column:
    return F.lower(col)


def split_transfer_from(value: Column) -> Column:
    """'from-to' transfer-event encoding → from part."""
    return F.split(value, "-").getItem(0)


def split_transfer_to(value: Column) -> Column:
    return F.split(value, "-").getItem(1)


def message_id(col: Column) -> Column:
    """sha256 hex digest (dedup id for message streams)."""
    return F.sha2(col.cast("string"), 256)


# --- F8: date helpers (src/utils/apiUtils.py:52-53, src/apr_sync_handler.py:47) ---
def date_days_ago(lag_days: int) -> Column:
    return F.date_sub(F.current_date(), lag_days)


def yesterday() -> Column:
    return F.date_sub(F.current_date(), 1)


# --- F9: null / default handling ---
def with_default(col: Column, default: float = 0.0) -> Column:
    return F.coalesce(col, F.lit(default))


def clamp_nonneg(col: Column) -> Column:
    """max(0, x) — e.g. net slashing after top-ups (src/api_handler.py:480)."""
    return F.greatest(col, F.lit(0.0))


# --- F10: JSON wire format (src/extract_handler.py:98,161) ---
def to_message_json(*cols: Column) -> Column:
    return F.to_json(F.struct(*cols))


def from_message_json(col: Column, schema: str) -> Column:
    return F.from_json(col, schema)
