"""The reference's pipelines (SURVEY §3) as declarative Spark jobs.

Each function takes reference-schema DataFrames (§1.2) and returns the
derived table as a DataFrame; callers persist with the idempotent
sinks in :mod:`stakehouse_etl_spark.io.sinks`. The Lambda/SQS fan-out
of the reference collapses into Spark task scheduling — one job per
pipeline instead of one invocation per validator.

Schemas (SURVEY §1.2):

- balances:          bls_key string, epoch long, balance double (gwei)
- withdrawals:       bls_key string, epoch long, values_withdrawals double,
                     withdrawal_recipient string
- slot_withdrawals:  validator long, slot long, amount long, withdrawal_index long
- income:            bls_key, epoch, earnings, losses, apr, epochs_since_active
- membership:        bls_key string, epoch long, indexes long
- transfer_events:   bls_key string, block_number long, value string ("from-to")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stakehouse_etl_spark.functions.financials import EPOCHS_PER_WEEK
from stakehouse_etl_spark.functions.scalars import (
    block_to_epoch,
    slot_to_epoch,
    split_transfer_from,
    split_transfer_to,
)
from stakehouse_etl_spark.operators.aggregates import two_level_rollup
from stakehouse_etl_spark.operators.joins import (
    assign_intervals_to_timeline,
    intervals_from_events,
    latest_per_key,
)
from stakehouse_etl_spark.operators.windows import (
    cumulative_income,
    spike_filter,
    top_k,
    trailing_delta,
)


def epoch_income(
    balances: DataFrame,
    withdrawals: DataFrame | None = None,
    seed: DataFrame | None = None,
    activation_epochs: DataFrame | None = None,
) -> DataFrame:
    """§3.2 transform heart → ``Validator_Epoch_Income``.

    Reference: ``src/validator_income_handler.py:103-168`` — per-key
    Python loops over per-key SELECTs become one windowed job over all
    keys (W1+W2). Withdrawals are credited to the epoch they land in.
    """
    return cumulative_income(
        balances,
        withdrawals=withdrawals,
        seed=seed,
        activation_epochs=activation_epochs,
    )


def index_epoch_apr(
    income: DataFrame,
    membership: DataFrame,
    lo_epoch: int | None = None,
    hi_epoch: int | None = None,
    smooth: bool = True,
) -> DataFrame:
    """§3.2 downstream → ``Validator_Indexes_APR``.

    Reference ``src/index_epoch_apr_handler.py:49`` (J3): income ⨝
    membership on (bls_key, epoch), AVG(apr)/SUM(earnings)/SUM(losses)
    grouped by (indexes, epoch), then W3 spike smoothing (``:86-94``).
    """
    joined = income.join(membership, on=["bls_key", "epoch"], how="inner")
    if lo_epoch is not None:
        joined = joined.filter(F.col("epoch") >= lo_epoch)
    if hi_epoch is not None:
        joined = joined.filter(F.col("epoch") <= hi_epoch)
    agg = joined.groupBy("indexes", "epoch").agg(
        F.avg("apr").alias("apr"),
        F.sum("earnings").alias("earnings"),
        F.sum("losses").alias("losses"),
    )
    return spike_filter(agg, key="indexes", time="epoch", value="apr") if smooth else agg


def daily_apr(income: DataFrame, min_rows: int = 9) -> DataFrame:
    """§3.2 daily job → ``Validator_Daily_APR``.

    Reference ``src/apr_sync_handler.py:17-47`` (A10): per key, trailing
    ≤1575-epoch (1 week) slice of cumulative income; daily earnings /
    losses are newest − oldest over the slice; APR is the average over
    the slice. Keys with <9 epochs of history are skipped.
    """
    sliced_e = trailing_delta(
        income, key="bls_key", time="epoch", value="earnings",
        window_len=EPOCHS_PER_WEEK, min_rows=min_rows,
    )
    sliced_l = trailing_delta(
        income, key="bls_key", time="epoch", value="losses",
        window_len=EPOCHS_PER_WEEK, min_rows=min_rows,
    )
    apr = income.groupBy("bls_key").agg(F.avg("apr").alias("apr"))
    return (
        sliced_e.join(sliced_l.select("bls_key", "losses_delta"), "bls_key")
        .join(apr, "bls_key")
        .select(
            "bls_key",
            F.col("earnings_delta").alias("earnings"),
            F.col("losses_delta").alias("losses"),
            "apr",
        )
    )


def earnings_interface(income: DataFrame) -> DataFrame:
    """→ ``Validator_Earnings_Interface``: latest cumulative snapshot
    per key (J1). Reference ``src/validator_earnings_handler.py:17-62``
    does a greatest-n-per-group self-join; here a single window."""
    return latest_per_key(income, "bls_key", "epoch").select(
        "bls_key", "earnings", "losses"
    )


def withdrawals_rollup(slot_withdrawals: DataFrame, key_index: DataFrame) -> DataFrame:
    """→ ``Validator_Withdrawals``: per-slot amounts rolled up per
    (bls_key, epoch) (A9 two-level rollup + J7 key mapping).

    Reference ``src/validator_withdrawals_handler.py:66-103``: sums the
    withdrawals of each validator index per slot, maps the consensus
    index back to the bls key (``Validator_BLS_Key_Index``), rolls up
    to the epoch grain.
    """
    with_epoch = slot_withdrawals.withColumn("epoch", slot_to_epoch(F.col("slot")))
    per_epoch = two_level_rollup(
        with_epoch,
        fine_keys=["validator", "slot", "epoch"],
        coarse_keys=["validator", "epoch"],
        value="amount",
    )
    return (
        per_epoch.join(F.broadcast(key_index), on=["validator"], how="inner")
        .select(
            "bls_key",
            "epoch",
            F.col("sum_amount").cast("double").alias("values_withdrawals"),
        )
    )


def validator_indexes_from_transfers(
    transfer_events: DataFrame,
    genesis_block: int,
    lo_epoch: int,
    hi_epoch: int,
) -> DataFrame:
    """→ ``Validator_Indexes`` (J9 as-of assignment — the hardest
    relational piece).

    Reference ``src/index_validator_handler.py:63-96``: transfer events
    ("from-to" strings, ordered by blockNumber) define which index a
    key belongs to at every epoch; epochs after the last transfer carry
    its destination.

    Plan: parse → block→epoch (F3/F7) → validity intervals via ``lead``
    → clamped ``sequence``/``explode`` onto the epoch timeline.
    """
    parsed = transfer_events.select(
        "bls_key",
        block_to_epoch(F.col("block_number"), genesis_block).alias("from_epoch"),
        split_transfer_from(F.col("value")).cast("long").alias("from_index"),
        split_transfer_to(F.col("value")).cast("long").alias("to_index"),
    )
    intervals = intervals_from_events(
        parsed, key="bls_key", order_col="from_epoch", value_col="to_index"
    )
    return assign_intervals_to_timeline(
        intervals, lo_epoch, hi_epoch, key="bls_key", time_name="epoch"
    ).select("bls_key", "epoch", F.col("to_index").alias("indexes"))


def start_index(membership: DataFrame, lsd_keys: DataFrame | None = None) -> DataFrame:
    """→ ``Validator_Start_Index``: first index per key (A2 grouped MIN
    by epoch), plus the LSD flag. Reference
    ``src/validator_start_handler.py:17-66``."""
    first = membership.groupBy("bls_key").agg(
        F.min_by("indexes", "epoch").alias("indexes")
    )
    if lsd_keys is not None:
        return first.join(
            F.broadcast(lsd_keys.select("bls_key").withColumn("lsd_validator", F.lit(True))),
            on="bls_key",
            how="left",
        ).fillna({"lsd_validator": False})
    return first.withColumn("lsd_validator", F.lit(False))


def leaderboard(
    daily: DataFrame, start_idx: DataFrame, k: int = 7
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """§3.3 serving: `/leaderboard` + `topIndexes` (W4 three top-7s).

    Reference ``src/api_handler.py:272-312``: group yesterday's daily
    APR by the key's savETH index, aggregate, rank three ways.
    """
    per_index = (
        daily.join(F.broadcast(start_idx.select("bls_key", "indexes")), "bls_key")
        .filter(F.col("indexes").isNotNull())
        .groupBy("indexes")
        .agg(
            F.sum("earnings").alias("earningsAbsolute"),
            F.sum("losses").alias("lossesAbsolute"),
            F.avg("apr").alias("aprPerValidator"),
            F.count(F.lit(1)).alias("validators"),
        )
    )
    return (
        top_k(per_index, "earningsAbsolute", k),
        top_k(per_index, "lossesAbsolute", k),
        top_k(per_index, "aprPerValidator", k),
    )
