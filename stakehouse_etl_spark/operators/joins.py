"""Join operators (SURVEY §2.3 J1–J10).

The reference's joins are either MySQL subquery joins or Python
dict/set lookups; each becomes a declarative Spark join here, with the
physical strategy left to Catalyst (small dims are broadcast — J5;
large-large equi-joins sort-merge on the shuffled key; AQE converts to
broadcast at runtime when a side turns out small).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key: str | list[str], order_col: str | list[str] = "epoch"
) -> DataFrame:
    """J1: greatest-n-per-group — latest row per key.

    Reference renders this as a self-join against a ``(key, MAX(epoch))``
    subquery (``src/validator_income_handler.py:31-34``); the Spark
    rendering avoids the join entirely: ``row_number() == 1`` over a
    per-key DESC window — one shuffle, no second scan of the fact table.

    Pass multiple ``order_col``s (e.g. ``["epoch", "id"]``) to break
    ties deterministically.
    """
    keys = [key] if isinstance(key, str) else key
    orders = [order_col] if isinstance(order_col, str) else order_col
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in orders])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def broadcast_dim(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "left"
) -> DataFrame:
    """J5: attach dimension attributes (the reference's Python dict
    lookup, ``src/api_handler.py:279-280``). Explicit broadcast hint —
    a dimension map should never shuffle the fact table."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """J6/U2: keys lacking state → bootstrap path
    (``set(a) − set(b)``, ``src/validator_income_handler.py:222-223``)."""
    return left.join(right, on=on, how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """J7/P8: membership filter (``{k for k in xs if k in tracked}``,
    ``src/validator_withdrawals_handler.py:95``)."""
    return left.join(right, on=on, how="left_semi")


def left_with_defaults(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    defaults: dict[str, object],
) -> DataFrame:
    """J10: left join + per-column default fill for unmatched rows
    (missing threat-monitoring rows default to 1s,
    ``src/api_handler.py:439-440,620-621,670-671``)."""
    joined = fact.join(F.broadcast(dim), on=on, how="left")
    for col, default in defaults.items():
        joined = joined.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return joined


def intervals_from_events(
    events: DataFrame,
    key: str = "bls_key",
    order_col: str = "block_number",
    value_col: str = "to_index",
    start_col: str = "valid_from",
) -> DataFrame:
    """J9 step 1: point-in-time change events → half-open validity
    intervals ``[valid_from, valid_to)`` via a ``lead`` window.

    Reference: ``src/index_validator_handler.py:63-96`` walks transfer
    events ordered by blockNumber and assigns each epoch the index in
    force at that time; epochs after the last transfer get its
    destination. ``valid_to`` is NULL for the open-ended last interval.
    """
    w = Window.partitionBy(key).orderBy(order_col)
    return events.select(
        key,
        F.col(order_col).alias(start_col),
        F.lead(order_col).over(w).alias("valid_to"),
        F.col(value_col).alias(value_col),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
) -> DataFrame:
    """J9 (general form): as-of join — attach to each left row the
    latest right row at-or-before its time (``backward``), or the
    earliest at-or-after (``forward``).

    Spark has no native as-of join. Implementation: union-tag both
    sides, single window partitioned by key ordered by (time, side):
    ``last(right_value, ignorenulls=True)`` carries the in-force right
    row forward onto left rows. One shuffle on the key, no range
    explosion, no per-group Python — scales to arbitrarily dense right
    sides (unlike sequence/explode, which is O(span)).
    """
    keys = [key] if isinstance(key, str) else key
    lcols = [c for c in left.columns if c not in keys and c != left_time]
    rcols = [c for c in right.columns if c not in keys and c != right_time]

    # The right side travels as ONE struct (non-null per right row even
    # when its fields are null) so the window fill attaches the latest
    # right ROW atomically. Filling each right column independently
    # with last(..., ignorenulls) would (a) skip a right row whose
    # value is genuinely NULL in favor of an older one, and (b) stitch
    # a chimera from different right rows when several columns hold
    # NULLs — both wrong against merge_asof semantics.
    rstruct = F.struct(*[F.col(c).alias(c) for c in rcols])
    rstruct_type = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in rcols
    ) + ">"

    tagged_l = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_type).alias("__r"),
    )
    tagged_r = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        rstruct.alias("__r"),
    )
    unioned = tagged_l.unionByName(tagged_r)

    # Final __r tiebreak: several right rows can share one timestamp;
    # without a total order the window fill would pick whichever the
    # sort happened to place last — nondeterministic across runs and
    # engines. Struct comparison gives a deterministic winner (the
    # field-lexicographic max for backward / min for forward). Left
    # rows' NULL __r participates harmlessly (ignorenulls skips it).
    if direction == "backward":
        # Right rows sort before left rows at the same time → "at or before".
        w = (
            Window.partitionBy(*keys)
            .orderBy(
                F.col("__t").asc(),
                F.col("__side").asc(),
                F.col("__r").asc_nulls_last(),
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    elif direction == "forward":
        # r11: expressed over the REVERSED total order with a
        # preceding frame — Spark evaluates [currentRow,
        # unboundedFollowing] frames by re-aggregating the partition
        # remainder per row (O(rows²) per key), while the preceding
        # frame is incremental. Every sort key flips (asc↔desc,
        # nulls_first↔nulls_last), so the frame holds exactly the
        # original "current row onward" set and last(...) picks the
        # original first(...).
        w = (
            Window.partitionBy(*keys)
            .orderBy(
                F.col("__t").desc(),
                F.col("__side").asc(),
                F.col("__r").desc_nulls_last(),
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    # Both directions now use last(...) over a preceding frame: the
    # forward window's reversed order makes "last in frame" the
    # original forward-nearest row.
    filled_struct = F.last("__r", ignorenulls=True).over(w)
    fill = unioned.select(
        *keys,
        "__t",
        "__side",
        *lcols,
        *[filled_struct.getField(c).alias(c) for c in rcols],
    )
    return fill.filter(F.col("__side") == 1).drop("__side").withColumnRenamed(
        "__t", left_time
    )


def assign_intervals_to_timeline(
    intervals: DataFrame,
    timeline_start: Column | int,
    timeline_end: Column | int,
    key: str = "bls_key",
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    time_name: str = "epoch",
) -> DataFrame:
    """J9 step 2: materialize one row per (key, time point) from
    validity intervals — the reference's epoch-by-epoch index table
    (``Validator_Indexes``).

    ``sequence`` + ``explode`` over the *clamped* interval: each
    interval only generates the time points it actually covers, so the
    explosion is bounded by output size (not by span × keys).
    """
    start = F.lit(timeline_start) if isinstance(timeline_start, int) else timeline_start
    end = F.lit(timeline_end) if isinstance(timeline_end, int) else timeline_end
    lo = F.greatest(F.col(start_col), start)
    hi = F.least(F.coalesce(F.col(end_col) - 1, end), end)
    return (
        intervals.filter(lo <= hi)
        .withColumn(time_name, F.explode(F.sequence(lo, hi)))
        .drop(start_col, end_col)
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Generic point-in-range join.

    Naive form is a cross join + filter (O(n·m)). With ``bucket_width``
    both sides are bucketized on ``point // width`` — ranges replicate
    into each bucket they overlap via ``sequence``/``explode`` — and the
    join becomes an equi-join on the bucket plus a residual filter:
    the scale path for large inputs (this is the standard
    bucketed-range-join used by Databricks' range-join hint).
    """
    if bucket_width is None:
        cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
        return points.join(ranges, on=cond, how="inner")

    b = F.lit(bucket_width)
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / b))
    r = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(F.floor(F.col(lo_col) / b), F.floor(F.col(hi_col) / b))
        ),
    )
    return (
        p.join(r, on="__bucket", how="inner")
        .filter(
            (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bucket")
    )
