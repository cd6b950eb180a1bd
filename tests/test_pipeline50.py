"""Wave-50 invariants: join-count conservation laws, Fano ground
truth."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_join_matrix_conservation_laws(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    r = QUERIES["j30_null_join_matrix"].fn(spark, SF).collect()[0]
    n_l = len(orders)
    # conservation: left join keeps every left row exactly once per
    # match (or once unmatched); semi+anti partition the left side
    assert r["left_rows"] == r["inner_rows"] + r["left_unmatched"]
    assert r["semi_rows"] + r["anti_rows"] == n_l
    # NULL keys never match: all left NULL rows are unmatched/anti
    assert r["anti_rows"] >= r["l_nulls"]
    assert r["l_nulls"] > 0 and r["r_nulls"] > 0  # the probe has NULLs


def test_fano_ground_truth(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    daily = orders.o_orderdate.dt.normalize().value_counts()
    iso = pd.Series(daily.index.dayofweek + 1, index=daily.index)  # Mon=1
    out = {r["iso_dow"]: r for r in QUERIES["a_fano_burstiness"].fn(spark, SF).collect()}
    assert set(out) <= set(range(1, 8))
    for dow, r in out.items():
        cs = daily[iso == dow]
        n, s, ss = len(cs), int(cs.sum()), int((cs**2).sum())
        assert (r["n"], r["s"]) == (n, s)
        assert r["var_num"] == n * ss - s * s
        assert r["fano"] == (n * ss - s * s) / (n * s)
        assert r["var_num"] >= 0
