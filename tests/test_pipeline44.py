"""Wave-44 invariants: bootstrap determinism/coverage, power-law
sizing monotonicity, forward as-of ground truth."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_bootstrap_matches_python_hash(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = {
        int(k): int(math.floor(p * 100 + 0.5))
        for k, p in zip(orders.o_orderkey, orders.o_totalprice)
    }
    out = {r["b"]: r for r in QUERIES["ml_hash_bootstrap_means"].fn(spark, SF).collect()}
    assert set(out) == set(range(20))
    for b in (0, 7, 19):
        n_eff = sum(_h64(f"{k}:{b}") % 3 for k in cents)
        s = sum((_h64(f"{k}:{b}") % 3) * v for k, v in cents.items())
        assert out[b]["n_eff"] == n_eff
        assert out[b]["sum_cents"] == s
        assert out[b]["mean_cents"] == s / n_eff
    # resample means must actually vary (nonzero bootstrap spread)
    means = [r["mean_cents"] for r in out.values()]
    assert max(means) > min(means)


def test_mde_sizing_monotone_and_quartic(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = {r["mde_pct"]: r for r in QUERIES["ml_mde_sample_size"].fn(spark, SF).collect()}
    assert list(sorted(out)) == [1, 2, 5, 10]
    # halving the MDE quadruples n (inverse-square law), up to ceil
    assert out[1]["n_per_arm"] >= 4 * out[2]["n_per_arm"] - 4
    assert out[2]["n_per_arm"] > out[5]["n_per_arm"] > out[10]["n_per_arm"]
    for r in out.values():
        assert r["var_kc"] > 0 and r["mean_kc"] > 0


def test_forward_asof_ground_truth(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.assign(
        ts_us=(ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    )
    out = QUERIES["j25_asof_forward"].fn(spark, SF).collect()
    assert len(out) == len(ev)
    by_user: dict[int, list] = {}
    for r in ev.itertuples():
        by_user.setdefault(int(r.user_id), []).append(
            (int(r.ts_us), int(r.event_id), r.event_type)
        )
    for rows in by_user.values():
        rows.sort()
    got = {(r["user_id"], r["event_id"]): r["next_signup_us"] for r in out}
    import random

    rng = random.Random(7)
    sample = rng.sample(list(ev.itertuples()), 200)
    for r in sample:
        rows = by_user[int(r.user_id)]
        me = (int(r.ts_us), int(r.event_id))
        nxt = min(
            (t for t, e, typ in rows if typ == "signup" and (t, e) >= me),
            default=None,
        )
        assert got[(r.user_id, r.event_id)] == nxt
