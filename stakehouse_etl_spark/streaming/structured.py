"""Structured Streaming renderings of the engine's incremental
semantics (SURVEY §2.9).

The reference's "streams" are SQS queues + 6-minute EventBridge ticks;
the faithful Spark rendering of its epoch-discretized processing is
Structured Streaming with event-time windows + watermarks:

- ``windowed_event_aggregate`` — tumbling-window counts/sums with a
  watermark for late data (T6 cadence → trigger; T4 late-data → the
  watermark bounds state).
- ``streaming_cumulative_income`` — the W1 kernel as a custom stateful
  operator via ``applyInPandasWithState``: per-key running
  earnings/losses state across micro-batches — the true streaming
  twin of the runner-table resume path (T1/T3).

Tests drive these with bounded file sources + ``availableNow`` /
``processAllAvailable`` so a deterministic batch of rows flows through
the streaming engine end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def windowed_event_aggregate(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) event-time window
    + watermark aggregate.

    Works identically on a batch OR streaming DataFrame (the batch run
    is the oracle for the streaming run). Money sums go through integer
    cents like everywhere else in the engine. A sliding window assigns
    each event to window/slide overlapping windows — Spark expands the
    memberships before the shuffle, so it is still one exchange.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    win = (
        F.window(time_col, window, slide) if slide else F.window(time_col, window)
    )
    return (
        df.groupBy(win.alias("win"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col(value_col) * 100).cast("long")) / 100.0).alias(
                "sum_value"
            ),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def session_window_aggregate(
    events: DataFrame,
    gap: str = "4 hours",
    watermark: str = "8 hours",
    time_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Native ``F.session_window`` gap-session aggregate (batch or
    streaming).

    Sessions close after ``gap`` of per-key inactivity; the window
    start is the first event, the end is last event + gap. Equivalent
    to operators/timeseries.py:sessionize (which keys sessions by
    ordinal instead); this form is the one Structured Streaming can
    maintain incrementally with merging session state.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(time_col), gap).alias("win"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col(value_col) * 100).cast("long")) / 100.0).alias(
                "sum_value"
            ),
        )
        .select(
            F.col(key_col),
            F.unix_micros(F.col("win.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


_INCOME_STATE_SCHEMA = StructType(
    [
        StructField("last_balance_cents", LongType()),
        StructField("earnings_cents", LongType()),
        StructField("losses_cents", LongType()),
        StructField("n_steps", LongType()),
    ]
)

_INCOME_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("earnings", DoubleType()),
        StructField("losses", DoubleType()),
        StructField("n_steps", LongType()),
    ]
)


def _income_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key running W1 state across micro-batches.

    State = (last balance, cumulative earnings/losses, step count) in
    exact integer cents — the streaming twin of the runner-table seed
    (reference src/validator_income_handler.py:103-107). Rows within a
    batch are sorted by event time; Spark guarantees state continuity
    across triggers.
    """
    if state.exists:
        last_c, earn_c, loss_c, n = state.get
    else:
        last_c, earn_c, loss_c, n = None, 0, 0, 0

    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts_us")
        for ts_us, cents in zip(pdf["ts_us"].to_numpy(), pdf["value_cents"].to_numpy()):
            cents = int(cents)
            if last_c is not None:
                delta = cents - last_c
                if delta > 0:
                    earn_c += delta
                else:
                    loss_c -= delta
                n += 1
            last_c = cents
            out.append((key[0], int(ts_us), earn_c / 100.0, loss_c / 100.0, n))
    state.update((last_c, earn_c, loss_c, n))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "ts_us", "earnings", "losses", "n_steps"]
        )


def streaming_cumulative_income(events: DataFrame) -> DataFrame:
    """W1 as a custom stateful streaming operator
    (``applyInPandasWithState``): per-user cumulative earnings/losses
    maintained in state across micro-batches.

    Input: a streaming (or batch) events frame with user_id/ts/value.
    At scale: state is per-key and O(1) per key; the shuffle partitions
    by user_id exactly like the batch window does.
    """
    prepared = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _income_state_fn,
        outputStructType=_INCOME_OUTPUT_SCHEMA,
        stateStructType=_INCOME_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("fv_us", LongType()),  # -1 sentinel = not reached
        StructField("fc_us", LongType()),
        StructField("fp_us", LongType()),
    ]
)

_FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("fv_us", LongType()),  # -1 sentinel, mapped to NULL outside
        StructField("fc_us", LongType()),
        StructField("fp_us", LongType()),
    ]
)


def _funnel_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key funnel progress (view -> click -> purchase) across
    micro-batches — sequence detection (CEP) as a custom stateful
    operator. State = the three first-reach timestamps, -1 until
    reached; a stage only advances on an event STRICTLY after the
    previous stage's timestamp, so out-of-order stage completions
    never count (the property a per-type MIN pivot gets wrong).
    Integer epoch-micros only; -1 sentinels keep the Arrow transfer
    null-free (mapped to NULL by the caller)."""
    fv, fc, fp = state.get if state.exists else (-1, -1, -1)
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts_us, event_id, etype in zip(
            pdf["ts_us"].to_numpy(), pdf["event_id"].to_numpy(), pdf["event_type"]
        ):
            ts_us = int(ts_us)
            if etype == "view" and fv < 0:
                fv = ts_us
            elif etype == "click" and fc < 0 and fv >= 0 and ts_us > fv:
                fc = ts_us
            elif etype == "purchase" and fp < 0 and fc >= 0 and ts_us > fc:
                fp = ts_us
            out.append((key[0], int(event_id), ts_us, fv, fc, fp))
    state.update((fv, fc, fp))
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "event_id", "ts_us", "fv_us", "fc_us", "fp_us"],
        )


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Funnel/sequence detection as a custom stateful streaming
    operator (``applyInPandasWithState``): per-user first-view /
    first-click-after-view / first-purchase-after-click timestamps
    maintained across micro-batches, emitted per event (append mode —
    each event row carries the funnel state at that point of the
    stream, so the final row per user is the completed funnel).

    At scale: state is 3 longs per key; the shuffle clusters on
    user_id exactly like the batch funnel's window exchange. Time
    order across triggers comes from the source (time-split files
    here; Kafka partition-time ordering in production) — the same
    prerequisite the reference's incremental income runner has."""
    prepared = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    raw = prepared.groupBy("user_id").applyInPandasWithState(
        _funnel_state_fn,
        outputStructType=_FUNNEL_OUTPUT_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    null_if_unset = lambda c: F.when(F.col(c) >= 0, F.col(c))  # noqa: E731
    stage = (
        F.when(F.col("fp_us") >= 0, 3)
        .when(F.col("fc_us") >= 0, 2)
        .when(F.col("fv_us") >= 0, 1)
        .otherwise(0)
    )
    return raw.select(
        "user_id",
        "event_id",
        "ts_us",
        null_if_unset("fv_us").alias("first_view_us"),
        null_if_unset("fc_us").alias("first_click_us"),
        null_if_unset("fp_us").alias("first_purchase_us"),
        stage.cast("long").alias("funnel_stage"),
    )
