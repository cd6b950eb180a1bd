"""Wave-69 invariants: the growth-accounting ledger identities."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"

_WEEK_US = 604800000000


def test_growth_ledger_identities(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    uw = set(zip(ev.user_id.astype(int), (us // _WEEK_US).astype(int)))
    out = sorted(
        QUERIES["ts_growth_accounting"].fn(spark, SF).collect(),
        key=lambda r: r["wk"],
    )
    actives_by_wk = {}
    for wk in sorted({w for _, w in uw}):
        actives_by_wk[wk] = {u for u, w in uw if w == wk}
    prev_actives = set()
    first_seen: set[int] = set()
    for r in out:
        act = actives_by_wk[r["wk"]]
        assert r["actives"] == len(act)
        assert r["actives"] == r["new_users"] + r["retained"] + r["resurrected"]
        new = {u for u in act if u not in first_seen}
        retained = act & prev_actives
        assert r["new_users"] == len(new)
        assert r["retained"] == len(retained)
        # churned into this week = last week's actives missing now
        assert r["churned_into_week"] == len(prev_actives - act)
        first_seen |= act
        prev_actives = act
