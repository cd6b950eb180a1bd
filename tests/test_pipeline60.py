"""Wave-60 invariant: tau-b against a naive O(cells²) Python count
and pair-count conservation."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_tau_b_matches_naive_cells(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    us = (orders.o_orderdate - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    t_end = int(us.max())
    g = orders.assign(
        us=us, cents=(orders.o_totalprice * 100 + 0.5).apply(math.floor)
    ).groupby("o_custkey")
    rec = (t_end - g.us.max()) // 86400000000
    mon = g.cents.sum()
    n = len(rec)
    df = pd.DataFrame({"rec": rec, "mon": mon}).reset_index()
    r_rank = df.sort_values(["rec", "o_custkey"]).reset_index(drop=True)
    df["r_rank"] = (
        df.set_index("o_custkey")
        .index.map(
            {k: i + 1 for i, k in enumerate(r_rank.o_custkey)}
        )
    )
    m_rank_order = df.sort_values(["mon", "o_custkey"]).o_custkey
    df["m_rank"] = df.o_custkey.map(
        {k: i + 1 for i, k in enumerate(m_rank_order)}
    )
    df["r"] = 6 - ((df.r_rank * 5 - 1) // n + 1)
    df["m"] = (df.m_rank * 5 - 1) // n + 1
    cells = df.groupby(["r", "m"]).size()
    items = list(cells.items())
    # order-independent double loop over all unordered cell pairs
    C = sum(
        w1 * w2
        for (r1, m1), w1 in items
        for (r2, m2), w2 in items
        if r1 < r2 and m1 < m2
    )
    D = sum(
        w1 * w2
        for (r1, m1), w1 in items
        for (r2, m2), w2 in items
        if r1 < r2 and m1 > m2
    )
    tie_r = sum(w * (w - 1) // 2 for w in cells.groupby(level="r").sum())
    tie_m = sum(w * (w - 1) // 2 for w in cells.groupby(level="m").sum())
    n0 = n * (n - 1) // 2
    tau = (C - D) / (math.sqrt(n0 - tie_r) * math.sqrt(n0 - tie_m))
    row = QUERIES["ml_kendall_tau_b"].fn(spark, SF).collect()[0]
    assert row["n"] == n
    assert (row["c_pairs"], row["d_pairs"]) == (C, D)
    assert (row["tie_r"], row["tie_m"]) == (tie_r, tie_m)
    assert row["tau_b_micro"] == math.floor(tau * 1e6)
    assert -1_000_000 <= row["tau_b_micro"] <= 1_000_000
