"""Wave-35 invariants: the nonparametric statistics are checked
against naive O(n²)/sorted Python reimplementations on the sf0.001
tables — independent of both Spark expression trees and the DuckDB
oracle SQL."""

from __future__ import annotations

import math

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    # Banker's-free round-half-away semantics match F.round/duckdb round
    # for positive inputs at cent granularity.
    return int(math.floor(x * 100 + 0.5))


@pytest.fixture(scope="module")
def seg_samples():
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    m = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    m = m[m.c_mktsegment.isin(["BUILDING", "MACHINERY"])]
    a = sorted(_cents(v) for v in m[m.c_mktsegment == "BUILDING"].o_totalprice)
    b = sorted(_cents(v) for v in m[m.c_mktsegment == "MACHINERY"].o_totalprice)
    return a, b


def test_ks_matches_naive(spark, seg_samples):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    a, b = seg_samples
    support = sorted(set(a) | set(b))
    n_a, n_b = len(a), len(b)
    d_num = max(
        abs(
            sum(1 for v in a if v <= x) * n_b
            - sum(1 for v in b if v <= x) * n_a
        )
        for x in support
    )
    row = QUERIES["ml_ks_two_sample"].fn(spark, SF).collect()[0]
    assert (row["n_a"], row["n_b"], row["d_num"]) == (n_a, n_b, d_num)
    assert row["ks_stat"] == d_num / (n_a * n_b)


def test_mannwhitney_matches_pair_count(spark, seg_samples):
    # Rank-sum U must equal the direct pair count:
    # U_a = #{(x,y): x>y} + 0.5·#{ties}; we compare 2·U as integers.
    from stakehouse_etl_spark.queries.catalog import QUERIES

    a, b = seg_samples
    u2 = sum(2 for x in a for y in b if x > y) + sum(
        1 for x in a for y in b if x == y
    )
    row = QUERIES["ml_mannwhitney_u"].fn(spark, SF).collect()[0]
    assert row["u2_a"] == u2
    assert row["auc"] == u2 / (2 * len(a) * len(b))


def test_gini_matches_naive(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    region = pd.read_parquet(f"{SF}/region.parquet")
    m = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    m = m[m.c_acctbal > 0]
    rows = {r["r_name"]: r for r in QUERIES["a_gini_region"].fn(spark, SF).collect()}
    for r_name, grp in m.groupby("r_name"):
        xs = sorted(_cents(v) for v in grp.c_acctbal)
        n, s = len(xs), sum(xs)
        num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * s
        got = rows[r_name]
        assert (got["n"], got["sum_cents"], got["gini_num"]) == (n, s, num)
        # Gini of a positive sample is in [0, 1)
        assert 0.0 <= got["gini"] < 1.0


def test_stump_matches_bruteforce(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    vals = [
        (_cents(p), 1 if pr in ("1-URGENT", "2-HIGH") else 0)
        for p, pr in zip(orders.o_totalprice, orders.o_orderpriority)
    ]
    n = len(vals)
    pos = sum(p for _, p in vals)
    best = None
    for thr in sorted({c for c, _ in vals}):
        n_l = sum(1 for c, _ in vals if c <= thr)
        p_l = sum(p for c, p in vals if c <= thr)
        n_r, p_r = n - n_l, pos - p_l
        if n_l == 0 or n_r == 0:
            continue
        s_l = p_l * p_l + (n_l - p_l) ** 2
        s_r = p_r * p_r + (n_r - p_r) ** 2
        num = (n_l * n_l - s_l) * n_r + (n_r * n_r - s_r) * n_l
        score = num / (n_l * n_r * n)
        if best is None or (score, thr) < best[:2]:
            best = (score, thr, n_l, n_r)
    row = QUERIES["ml_decision_stump"].fn(spark, SF).collect()[0]
    assert row["threshold_cents"] == best[1]
    assert (row["n_l"], row["n_r"]) == (best[2], best[3])
    assert row["gini"] == best[0]


def test_benford_shares_partition(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["dq_benford_digits"].fn(spark, SF).collect()
    assert [r["digit"] for r in out] == sorted(r["digit"] for r in out)
    assert set(r["digit"] for r in out) <= set(range(1, 10))
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-12
    # Expected shares are the Benford constants, independent of data.
    for r in out:
        assert abs(r["expected_share"] - math.log10(1 + 1 / r["digit"])) < 1e-15


def test_observe_metrics_match_direct_agg(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li.l_quantity < 10]
    row = QUERIES["dq_observe_metrics"].fn(spark, SF).collect()[0]
    assert row["n_rows"] == len(li)
    assert row["sum_cents"] == sum(_cents(v) for v in li.l_extendedprice)
    assert row["n_discounted"] == int((li.l_discount > 0.05).sum())


def test_jaccard_bounds_and_symmetric_support(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["graph_jaccard_similarity"].fn(spark, SF).collect()
    for r in out:
        assert r["part_a"] < r["part_b"]
        assert r["common"] >= 2
        assert r["common"] <= min(r["deg_a"], r["deg_b"])
        union = r["deg_a"] + r["deg_b"] - r["common"]
        assert r["jaccard"] == r["common"] / union
        assert 0.0 < r["jaccard"] <= 1.0
