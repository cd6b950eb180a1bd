"""Wave-45 invariants: skyline non-domination by brute force, label
windows leakage discipline, overlap-profile identities."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_skyline_is_exactly_nondominated(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    spend = (
        (orders.o_totalprice * 100 + 0.5)
        .apply(math.floor)
        .groupby(orders.o_custkey)
        .sum()
    )
    m = cust.merge(spend.rename("s"), left_on="c_custkey", right_index=True)
    pts = [
        (int(math.floor(a * 100 + 0.5)), int(s))
        for a, s in zip(m.c_acctbal, m.s)
    ]
    # brute-force dominance over the (a → max s) collapsed set
    byx: dict[int, int] = {}
    for a, s in pts:
        byx[a] = max(byx.get(a, s), s)
    front = {
        (a, s)
        for a, s in byx.items()
        if not any(
            (a2 >= a and s2 >= s and (a2 > a or s2 > s))
            for a2, s2 in byx.items()
        )
    }
    out = QUERIES["w15_pareto_skyline"].fn(spark, SF).collect()
    got = {(r["acctbal_cents"], r["spend_cents"]) for r in out}
    assert got == front
    # descending balance => strictly ascending spend along the front
    spends = [r["spend_cents"] for r in out]
    assert spends == sorted(spends)


def test_label_windows_no_leakage(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    t0, t1 = int(us.min()), int(us.max())
    out = QUERIES["ml_label_window_split"].fn(spark, SF).collect()
    assert {r["k"] for r in out} == {1, 2, 3}
    for k in (1, 2, 3):
        cutoff = t0 + (t1 - t0) * k // 4
        rows = [r for r in out if r["k"] == k]
        n_before = {
            int(u): int(c)
            for u, c in us.groupby(ev.user_id).apply(lambda s, c=cutoff: (s < c).sum()).items()
        }
        labels = {
            int(u): bool(a)
            for u, a in us.groupby(ev.user_id)
            .apply(lambda s, c=cutoff: ((s >= c) & (s < c + 604800000000)).any())
            .items()
        }
        assert {r["user_id"] for r in rows} == {
            u for u, n in n_before.items() if n > 0
        }
        for r in rows:
            assert r["n_before"] == n_before[r["user_id"]]
            assert r["label_active_7d"] == labels[r["user_id"]]


def test_overlap_profile_identities(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    row = QUERIES["dq_overlap_profile"].fn(spark, SF).collect()[0]
    assert row["only_a"] == row["n_a"] - row["n_both"]
    assert row["only_b"] == row["n_b"] - row["n_both"]
    union = row["n_a"] + row["n_b"] - row["n_both"]
    assert row["jaccard"] == row["n_both"] / union
    assert row["containment_b_in_a"] == row["n_both"] / row["n_b"]
    assert 0 <= row["jaccard"] <= 1
