"""Tests for the event-analytics wave: funnel, cohort retention, SCD2
history, bucketed range self-join, source-mix allocation — each checked
against a naive driver-side recomputation on sf0.001."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from stakehouse_etl_spark.io.sources import load_table
from stakehouse_etl_spark.queries.analytics2 import (
    HOUR_US,
    MIX_BUDGET,
    corpus_mix_allocation,
    j11_range_join_bucketed,
    ts_cohort_retention,
    ts_funnel_conversion,
    ts_scd2_history,
)


def _events(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    for rs in per_user.values():
        rs.sort(key=lambda r: (r["ts_us"], r["event_id"]))
    return per_user


def test_funnel_matches_naive(spark, sf_dir):
    per_user = _events(spark, sf_dir)
    got = {r["user_id"]: r for r in ts_funnel_conversion(spark, sf_dir).collect()}
    assert set(got) == set(per_user)
    for uid, rs in per_user.items():
        fv = min((r["ts_us"] for r in rs if r["event_type"] == "view"), default=None)
        fc = (
            min(
                (
                    r["ts_us"]
                    for r in rs
                    if r["event_type"] == "click" and r["ts_us"] > fv
                ),
                default=None,
            )
            if fv is not None
            else None
        )
        fp = (
            min(
                (
                    r["ts_us"]
                    for r in rs
                    if r["event_type"] == "purchase" and r["ts_us"] > fc
                ),
                default=None,
            )
            if fc is not None
            else None
        )
        g = got[uid]
        assert (g["first_view_us"], g["first_click_us"], g["first_purchase_us"]) == (
            fv,
            fc,
            fp,
        ), uid
        stage = 3 if fp else 2 if fc else 1 if fv else 0
        assert g["funnel_stage"] == stage


def test_cohort_retention_matches_naive(spark, sf_dir):
    per_user = _events(spark, sf_dir)
    week = 604_800_000_000
    cells = defaultdict(set)
    for uid, rs in per_user.items():
        weeks = {r["ts_us"] // week for r in rs}
        cohort = min(weeks)
        for wk in weeks:
            cells[(cohort, wk - cohort)].add(uid)
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in ts_cohort_retention(spark, sf_dir).collect()
    }
    assert got == {k: len(v) for k, v in cells.items()}
    # Offset 0 covers every user exactly once.
    assert sum(n for (c, o), n in got.items() if o == 0) == len(per_user)


def test_scd2_history_invariants(spark, sf_dir):
    per_user = _events(spark, sf_dir)
    out = defaultdict(list)
    for r in ts_scd2_history(spark, sf_dir).collect():
        out[r["user_id"]].append(r)
    assert set(out) == set(per_user)
    for uid, vs in out.items():
        vs.sort(key=lambda r: r["valid_from_us"])
        # Exactly one current version; chain links up.
        assert sum(v["is_current"] for v in vs) == 1
        assert vs[-1]["is_current"]
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
            assert a["cents"] != b["cents"]  # no-op versions collapsed
        # Naive run-length collapse gives the same version values.
        naive = []
        for r in per_user[uid]:
            if not naive or naive[-1] != r["cents"]:
                naive.append(r["cents"])
        assert [v["cents"] for v in vs] == naive


def test_range_join_matches_naive(spark, sf_dir):
    per_user = _events(spark, sf_dir)
    got = {
        r["event_id"]: r["n_purchases_1h"]
        for r in j11_range_join_bucketed(spark, sf_dir).collect()
    }
    expect = {}
    for rs in per_user.values():
        purch = [r["ts_us"] for r in rs if r["event_type"] == "purchase"]
        for r in rs:
            if r["event_type"] == "click":
                expect[r["event_id"]] = sum(
                    1 for p in purch if r["ts_us"] < p <= r["ts_us"] + HOUR_US
                )
    assert got == expect


def test_range_join_plan_has_no_nested_loop(spark):
    df = j11_range_join_bucketed(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_mix_allocation_sums_to_budget(spark, sf_dir):
    rows = corpus_mix_allocation(spark, sf_dir).collect()
    assert rows
    assert sum(r["final_alloc"] for r in rows) == MIX_BUDGET
    total = sum(r["n_tok"] for r in rows)
    for r in rows:
        ideal = MIX_BUDGET * r["n_tok"] / total
        assert r["final_alloc"] - r["base_alloc"] in (0, 1)
        # Hamilton apportionment never strays more than 1 from ideal.
        assert abs(r["final_alloc"] - ideal) < 1.0, r
