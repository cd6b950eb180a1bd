"""External reconciliation harness (VERDICT r3 missing #1).

No network in-container: sources are file fixtures, exercising the
same code path as http(s) locations (only the byte transport
differs). A clean source must reconcile 100%; a source with an
injected drift / dropped key / extra key must classify each case.
"""

from __future__ import annotations

import json
import os

from stakehouse_etl_spark.io import recon_harness as rh

SF = "/root/testdata/sf0.001"


def _dump(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        json.dump(rows, f)


def test_reconcile_clean_and_drifted_sources(spark, tmp_path):
    wh = rh.warehouse_user_totals(spark, SF)
    truth = {r["key"]: r["warehouse_cents"] for r in wh.collect()}
    assert len(truth) >= 3

    keys = sorted(truth)
    clean = [{"key": k, "value": truth[k]} for k in keys]
    drifted = [
        {"key": k, "value": truth[k] + (7 if i == 0 else 0)}
        for i, k in enumerate(keys)
    ]
    drifted = drifted[:-1]  # drop last key -> missing_in_source
    extra_key = max(keys) + 10_000
    drifted.append({"key": extra_key, "value": 123})  # missing_in_warehouse

    a, b = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    _dump(a, clean)
    _dump(b, drifted)

    report = str(tmp_path / "report.jsonl")
    summary = rh.run(
        spark,
        SF,
        f"clean={a},drift={b}",
        report,
        tol=0,
        max_bad=0,
    )
    assert summary["n_sources"] == 2
    assert summary["ok"] is False  # drifted source breaks the budget

    by = {}
    with open(report, encoding="utf-8") as f:
        for line in f:
            r = json.loads(line)
            by[(r["source_name"], r["key"])] = r["status"]
    # clean source: every key matches
    assert all(
        v == "match" for (s, _), v in by.items() if s == "clean"
    )
    # drifted source: one mismatch, one missing each way
    drift = {k: v for (s, k), v in by.items() if s == "drift"}
    assert drift[keys[0]] == "mismatch"
    assert drift[keys[-1]] == "missing_in_source"
    assert drift[extra_key] == "missing_in_warehouse"
    n_match = sum(1 for v in drift.values() if v == "match")
    assert n_match == len(keys) - 2


def test_tolerance_absorbs_small_drift(spark, tmp_path):
    wh = rh.warehouse_user_totals(spark, SF)
    truth = {r["key"]: r["warehouse_cents"] for r in wh.collect()}
    rows = [{"key": k, "value": v + 1} for k, v in truth.items()]
    p = str(tmp_path / "s.json")
    _dump(p, rows)
    report = str(tmp_path / "report.jsonl")
    summary = rh.run(spark, SF, f"s={p}", report, tol=1, max_bad=0)
    assert summary["ok"] is True
    assert summary["n_mismatch"] == 0


def test_env_gate_skips_cleanly(monkeypatch):
    monkeypatch.delenv("RECON_SOURCES", raising=False)
    assert rh.main([]) == 0


def test_malformed_sources_fail_loud():
    import pytest

    with pytest.raises(ValueError):
        rh.parse_sources_env("not-a-pair")
    with pytest.raises(ValueError):
        rh.parse_sources_env(" , ")
