"""Property tests: largest-remainder apportionment and the Z-order
bit-interleave expression, against naive Python reimplementations."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stakehouse_etl_spark.operators.alloc import largest_remainder_alloc
from stakehouse_etl_spark.queries.layout import _z_terms

weights = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=12
).filter(lambda ws: sum(ws) > 0)


@settings(max_examples=12, deadline=None)
@given(ws=weights, budget=st.integers(min_value=1, max_value=1_000_000))
def test_largest_remainder_properties(spark, ws, budget):
    df = spark.createDataFrame(
        [(f"k{i:02d}", w) for i, w in enumerate(ws)], "key string, weight long"
    )
    rows = largest_remainder_alloc(df, "key", "weight", budget).collect()
    total = sum(ws)
    # Exact budget conservation.
    assert sum(r["final_alloc"] for r in rows) == budget
    for r in rows:
        ideal = budget * r["weight"] / total
        assert r["extra"] in (0, 1)
        assert r["final_alloc"] == r["base_alloc"] + r["extra"]
        # Hamilton quota property: never off by ≥1 from proportional.
        assert abs(r["final_alloc"] - ideal) < 1.0
        if r["weight"] == 0:
            assert r["final_alloc"] == 0


def _interleave(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_z_interleave_matches_naive(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select(
        "x", "y", F.expr(_z_terms("x", "y", "spark")).cast("long").alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _interleave(r["x"], r["y"]), (r["x"], r["y"])
