"""Unit tests for the time-series (sessionize, gap-fill) and graph
(connected components) operators on small hand-built frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from stakehouse_etl_spark.operators.graph import connected_components
from stakehouse_etl_spark.operators.timeseries import gap_fill_linear, sessionize


def rows(df, *cols):
    out = df.select(*cols).collect()
    return sorted(tuple(r) for r in out)


# ---------------------------------------------------------- sessionize
def test_sessionize_splits_on_gap(spark):
    ev = spark.createDataFrame(
        [
            ("u", 0), ("u", 100), ("u", 150),   # session 0
            ("u", 1000), ("u", 1050),           # session 1 (gap 850 > 500)
            ("v", 5),                            # other key: own session 0
        ],
        "user_id string, ts_us long",
    )
    out = sessionize(ev, key="user_id", ts_us="ts_us", gap_us=500)
    got = rows(out, "user_id", "session_seq", "session_start_us",
               "session_end_us", "n_events")
    assert got == [
        ("u", 0, 0, 150, 3),
        ("u", 1, 1000, 1050, 2),
        ("v", 0, 5, 5, 1),
    ]


def test_sessionize_gap_exactly_at_threshold_stays_joined(spark):
    ev = spark.createDataFrame(
        [("u", 0), ("u", 500)], "user_id string, ts_us long"
    )
    out = sessionize(ev, key="user_id", ts_us="ts_us", gap_us=500)
    assert out.count() == 1  # boundary is strict ">"


def test_sessionize_custom_measures(spark):
    ev = spark.createDataFrame(
        [("u", 0, 10.0), ("u", 10, 20.0)],
        "user_id string, ts_us long, value double",
    )
    out = sessionize(
        ev, key="user_id", ts_us="ts_us", gap_us=500,
        measures={"sum_value": F.sum("value")},
    )
    assert rows(out, "sum_value") == [(30.0,)]


# ------------------------------------------------------------ gap fill
def test_gap_fill_interpolates_interior_gap(spark):
    obs = spark.createDataFrame(
        [("k", 0, 10.0), ("k", 4, 18.0)],
        "key string, epoch long, balance double",
    )
    out = gap_fill_linear(obs, key="key", time="epoch", value="balance")
    got = rows(out, "epoch", "balance", "interpolated")
    assert got == [
        (0, 10.0, False),
        (1, 12.0, True),
        (2, 14.0, True),
        (3, 16.0, True),
        (4, 18.0, False),
    ]


def test_gap_fill_no_gap_passthrough(spark):
    obs = spark.createDataFrame(
        [("k", 1, 5.0), ("k", 2, 6.0)],
        "key string, epoch long, balance double",
    )
    out = gap_fill_linear(obs, key="key", time="epoch", value="balance")
    assert rows(out, "epoch", "balance", "interpolated") == [
        (1, 5.0, False), (2, 6.0, False)
    ]


def test_gap_fill_multiple_keys_independent(spark):
    obs = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 2, 2.0), ("b", 10, 1.0)],
        "key string, epoch long, balance double",
    )
    out = gap_fill_linear(obs, key="key", time="epoch", value="balance")
    got = rows(out, "key", "epoch", "balance")
    assert got == [("a", 0, 0.0), ("a", 1, 1.0), ("a", 2, 2.0), ("b", 10, 1.0)]


# ------------------------------------------------- connected components
def test_cc_two_chained_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    out = connected_components(edges)
    got = rows(out, "node", "component")
    assert got == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]


def test_cc_transitive_chain_collapses(spark):
    # A path 0-1-2-3-4 must converge to a single min label.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src long, dst long"
    )
    out = connected_components(edges)
    assert rows(out, "component") == [(0,)] * 5


def test_cc_only_edge_nodes_labeled(spark):
    edges = spark.createDataFrame([(7, 9)], "src long, dst long")
    out = connected_components(edges)
    assert rows(out, "node", "component") == [(7, 7), (9, 7)]


# ------------------------------------------------------------- edges
def test_sessionize_empty_input(spark):
    ev = spark.createDataFrame([], "user_id string, ts_us long")
    assert sessionize(ev, key="user_id", ts_us="ts_us", gap_us=10).count() == 0


def test_gap_fill_single_point(spark):
    obs = spark.createDataFrame(
        [("k", 5, 1.5)], "key string, epoch long, balance double"
    )
    out = gap_fill_linear(obs, key="key", time="epoch", value="balance")
    assert rows(out, "epoch", "balance", "interpolated") == [(5, 1.5, False)]


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0


def test_cc_duplicate_and_reversed_edges(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2)], "src long, dst long"
    )
    out = connected_components(edges)
    assert rows(out, "node", "component") == [(1, 1), (2, 1)]


def test_cc_string_ids_chain_converges(spark):
    # ADVICE r1: sum-based convergence is NULL over string ids and
    # "converged" after one pass. String ids must use the join-based
    # changed-count check and still fully collapse a long chain.
    names = [f"doc_{chr(ord('a') + i)}" for i in range(10)]
    edges = spark.createDataFrame(
        [(names[i], names[i + 1]) for i in range(9)], "src string, dst string"
    )
    out = connected_components(edges)
    got = rows(out, "node", "component")
    assert got == sorted((n, "doc_a") for n in names)


def test_cc_null_ids_raise_in_every_path(spark):
    # Review r5: the driver fast path raised on NULL ids but the
    # distributed numeric path's sum-based NULL detection only fires
    # when EVERY label is NULL — one NULL among many slipped through
    # and silently under-merged. Both paths must fail loud, so the
    # behavior is not input-size-dependent.
    import pytest

    edges = spark.createDataFrame(
        [(1, 2), (None, 3), (4, 5)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="NULL node ids"):
        connected_components(edges)  # driver fast path
    with pytest.raises(ValueError, match="NULL node ids"):
        connected_components(edges, driver_max_edges=None)  # distributed
