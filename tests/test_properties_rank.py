"""Property tests: the two-phase global-window decompositions equal
their naive single-window definitions on arbitrary data (ids unique,
values arbitrary with heavy ties), across chunk widths."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from stakehouse_etl_spark.operators.windows import (
    global_prefix_extrema,
    global_prefix_sum,
    skew_resistant_rank,
)

# (id, value) rows with few distinct values → heavy ties, the hard case
rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=5000),
        st.integers(min_value=-3, max_value=3),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)
widths = st.sampled_from([1, 2, 7, 64])


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy, width=widths, desc=st.booleans())
def test_skew_resistant_rank_equals_naive(spark, rows, width, desc):
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.rank
        for r in skew_resistant_rank(
            df, value="v", id_col="id", out="rank",
            descending=desc, chunk_width=width,
        ).collect()
    }
    key = (lambda t: (-t[1], t[0])) if desc else (lambda t: (t[1], t[0]))
    want = {t[0]: i + 1 for i, t in enumerate(sorted(rows, key=key))}
    assert got == want


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy, width=widths, inclusive=st.booleans())
def test_global_prefix_sum_equals_naive(spark, rows, width, inclusive):
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.cum
        for r in global_prefix_sum(
            df, id_col="id", value="v", out="cum",
            inclusive=inclusive, chunk_width=width,
        ).collect()
    }
    acc, want = 0, {}
    for i, v in sorted(rows):
        want[i] = acc + v if inclusive else acc
        acc += v
    assert got == want


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy, width=widths, inclusive=st.booleans(),
       levels=st.sampled_from([1, 2, 3]))
def test_global_prefix_sum_descending_and_levels(
    spark, rows, width, inclusive, levels
):
    """DESC ordering and recursion depth both equal the naive window."""
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.cum
        for r in global_prefix_sum(
            df, id_col="id", value="v", out="cum", inclusive=inclusive,
            chunk_width=width, descending=True, levels=levels,
        ).collect()
    }
    acc, want = 0, {}
    for i, v in sorted(rows, reverse=True):
        want[i] = acc + v if inclusive else acc
        acc += v
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=5000),
            # limited-denominator fractions → exact doubles, heavy ties
            st.integers(min_value=-12, max_value=12).map(lambda n: n / 4),
        ),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    width=widths,
    desc=st.booleans(),
)
def test_skew_resistant_rank_double_value_chunk_col(spark, rows, width, desc):
    """Non-integral rank values with an explicit monotone integral
    value_chunk_col ride the fully chunked (A) prefix and still equal
    the naive rank (floor(4v) is monotone and exact for /4 grids)."""
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r.id: r.rank
        for r in skew_resistant_rank(
            df, value="v", id_col="id", out="rank", descending=desc,
            chunk_width=width,
            value_chunk_col=F.expr("cast(floor(v * 4) as bigint)"),
        ).collect()
    }
    key = (lambda t: (-t[1], t[0])) if desc else (lambda t: (t[1], t[0]))
    want = {t[0]: i + 1 for i, t in enumerate(sorted(rows, key=key))}
    assert got == want


# rows with NULLable values — extrema must skip NULLs like max/min do
extrema_rows = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=5000),
        st.one_of(st.none(), st.integers(min_value=-9, max_value=9)),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@settings(max_examples=12, deadline=None)
@given(rows=extrema_rows, width=widths, levels=st.sampled_from([1, 2, 3]))
def test_global_prefix_extrema_equals_naive(spark, rows, width, levels):
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: (r.prev_max, r.next_min)
        for r in global_prefix_extrema(
            df, id_col="id", value="v", chunk_width=width, levels=levels
        ).collect()
    }
    srt = sorted(rows)
    want = {}
    for k, (i, _) in enumerate(srt):
        before = [v for _, v in srt[:k] if v is not None]
        after = [v for _, v in srt[k + 1:] if v is not None]
        want[i] = (max(before) if before else None,
                   min(after) if after else None)
    assert got == want


# string ids ranked with a prefix chunk_col — the non-numeric-id path
str_rows = st.lists(
    st.tuples(
        st.text(alphabet="abc", min_size=1, max_size=4),
        st.integers(min_value=-3, max_value=3),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(max_examples=12, deadline=None)
@given(rows=str_rows, desc=st.booleans(), plen=st.sampled_from([1, 2]))
def test_skew_resistant_rank_string_id_chunk_col(spark, rows, desc, plen):
    df = spark.createDataFrame(rows, "id string, v long")
    got = {
        r.id: r.rank
        for r in skew_resistant_rank(
            df, value="v", id_col="id", descending=desc,
            chunk_col=F.substring("id", 1, plen),
        ).collect()
    }
    key = (lambda t: (-t[1], t[0])) if desc else (lambda t: (t[1], t[0]))
    want = {t[0]: i + 1 for i, t in enumerate(sorted(rows, key=key))}
    assert got == want
