"""Wave-56 invariants: MI-cell ground truth and non-negative total."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_mi_cells_ground_truth(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    region = pd.read_parquet(f"{SF}/region.parquet")
    m = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    n = len(m)
    out = QUERIES["ml_mutual_info_cells"].fn(spark, SF).collect()
    assert sum(r["nij"] for r in out) == n
    for r in out:
        sub = m[(m.c_mktsegment == r["seg"]) & (m.r_name == r["reg"])]
        assert r["nij"] == len(sub)
        expect = (r["nij"] / n) * math.log(r["nij"] * n / (r["ni"] * r["nj"]))
        assert abs(r["mi_contrib_nano"] - math.floor(expect * 1e9)) <= 1
    # total MI (sum of exact nano contributions) is non-negative up to
    # the flooring slack (one nano per cell)
    assert sum(r["mi_contrib_nano"] for r in out) >= -len(out)
