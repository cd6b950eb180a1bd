"""Wave-46 invariants: drawdown against a naive scan, recursive
closure equals the iterative radix rollup."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_drawdown_matches_naive(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.assign(
        ts_us=(ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1),
        cents=(ev["value"] * 100 + 0.5).apply(math.floor).astype(int),
    ).sort_values(["user_id", "ts_us", "event_id"])
    naive: dict[int, tuple[int, int]] = {}
    for uid, grp in ev.groupby("user_id"):
        cum = peak = 0
        best = 0
        first = True
        for c in grp.cents:
            cum = c if first else cum + c
            peak = cum if first else max(peak, cum)
            best = max(best, peak - cum)
            first = False
        naive[int(uid)] = (best, peak if not first else 0)
    out = QUERIES["ts_max_drawdown"].fn(spark, SF).collect()
    assert len(out) == min(100, ev.user_id.nunique())
    dds = [r["max_drawdown_cents"] for r in out]
    assert dds == sorted(dds, reverse=True)
    for r in out:
        exp_dd, _ = naive[r["user_id"]]
        assert r["max_drawdown_cents"] == exp_dd
        assert r["max_drawdown_cents"] >= 0


def test_recursive_closure_matches_iterative(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    spend = (
        (orders.o_totalprice * 100 + 0.5)
        .apply(math.floor)
        .groupby(orders.o_custkey)
        .sum()
    )
    roll: dict[int, list[int]] = defaultdict(list)
    for node, cents in spend.items():
        anc = int(node)
        roll[anc].append(int(cents))
        while anc > 0:
            anc //= 10
            roll[anc].append(int(cents))
    expected = {
        a: (len(v), sum(v)) for a, v in roll.items() if len(v) > 1
    }
    out = QUERIES["sql_portable_recursive_closure"].fn(spark, SF).collect()
    got = {r["anc"]: (r["n_desc"], r["subtree_cents"]) for r in out}
    assert got == expected
