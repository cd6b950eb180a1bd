"""Wave-49 invariants: nearest as-of agrees with prev/next pickers,
kappa bounds and chance-correction identity."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_nearest_picks_minimum_distance(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.assign(
        ts_us=(ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    )
    signups: dict[int, list[tuple[int, int]]] = {}
    for r in ev[ev.event_type == "signup"].itertuples():
        signups.setdefault(int(r.user_id), []).append(
            (int(r.ts_us), int(r.event_id))
        )
    out = QUERIES["j29_asof_nearest"].fn(spark, SF).collect()
    assert len(out) == len(ev)
    import random

    rng = random.Random(11)
    for r in rng.sample(out, 300):
        sus = signups.get(r["user_id"], [])
        me = (r["ts_us"], r["event_id"])
        prevs = [t for t, e in sus if (t, e) <= me]
        nexts = [t for t, e in sus if (t, e) >= me]
        prev_su = max(prevs) if prevs else None
        next_su = min(nexts) if nexts else None
        if prev_su is None and next_su is None:
            assert r["nearest_signup_us"] is None and r["direction"] is None
        elif prev_su is None:
            assert (r["nearest_signup_us"], r["direction"]) == (next_su, "next")
        elif next_su is None:
            assert (r["nearest_signup_us"], r["direction"]) == (prev_su, "prev")
        elif r["ts_us"] - prev_su <= next_su - r["ts_us"]:
            assert (r["nearest_signup_us"], r["direction"]) == (prev_su, "prev")
        else:
            assert (r["nearest_signup_us"], r["direction"]) == (next_su, "next")


def test_kappa_identity_and_bounds(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    r = QUERIES["ml_cohens_kappa"].fn(spark, SF).collect()[0]
    assert r["kappa_num"] == r["n"] * r["diag"] - r["src"]
    assert r["kappa_den"] == r["n"] * r["n"] - r["src"]
    assert r["kappa"] == r["kappa_num"] / r["kappa_den"]
    assert -1.0 <= r["kappa"] <= 1.0
    # kappa <= accuracy (chance correction can only shrink agreement)
    assert r["kappa"] <= r["diag"] / r["n"] + 1e-12
