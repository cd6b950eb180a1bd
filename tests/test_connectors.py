"""Connector-layer tests (SURVEY §2.1 S1–S4): normalizers over
injected transports — no network, exactly how deployments differ only
in the transport callable."""

from __future__ import annotations

import json

from stakehouse_etl_spark.io.connectors import (
    fetch_block_withdrawals,
    fetch_finalized_epoch,
    fetch_subgraph_entities,
    fetch_validator_balances,
)


def test_balances_normalization(spark):
    def transport(url):
        slot = int(url.split("/states/")[1].split("/")[0])
        epoch = (slot + 1) // 32
        return {
            "data": [
                {
                    "index": "7",
                    "balance": str(32_000_000_000 + epoch),
                    "validator": {"pubkey": "0xab", "activation_epoch": "3"},
                }
            ]
        }

    df = fetch_validator_balances(spark, transport, "http://n", [10, 11], ["0xab"])
    rows = {(r.bls_key, r.epoch): r.balance for r in df.collect()}
    assert rows == {("0xab", 10): 32_000_000_010, ("0xab", 11): 32_000_000_011}
    assert dict(df.dtypes) == {"bls_key": "string", "epoch": "bigint", "balance": "bigint"}


def test_withdrawals_missed_slots_produce_no_rows(spark):
    def transport(url):
        slot = int(url.rsplit("/", 1)[1])
        if slot % 2:  # odd slots missed (404 → None)
            return None
        return {
            "data": {
                "message": {
                    "body": {
                        "execution_payload": {
                            "withdrawals": [
                                {
                                    "index": "1",
                                    "validator_index": "5",
                                    "address": "0xr",
                                    "amount": str(slot * 10),
                                }
                            ]
                        }
                    }
                }
            }
        }

    df = fetch_block_withdrawals(spark, transport, "http://n", [100, 101, 102])
    got = sorted((r.slot, r.amount) for r in df.collect())
    assert got == [(100, 1000), (102, 1020)]


def test_finality_probe(spark):
    assert fetch_finalized_epoch(lambda u: {"data": {"finalized": {"epoch": "42"}}}, "x") == 42
    assert fetch_finalized_epoch(lambda u: None, "x") is None
    assert fetch_finalized_epoch(lambda u: {"data": {}}, "x") is None


def test_subgraph_pagination_past_reference_cap(spark):
    """The reference hard-caps at first:1000 unpaginated
    (src/utils/subgraph.py:18); our connector pages on id_gt cursors."""
    entities = [{"id": f"k{i:04d}", "n": i} for i in range(25)]

    calls = []

    def transport(url):
        body = json.loads(url.split("#", 1)[1])["query"]
        calls.append(body)
        # crude cursor parse: "$cursor" was substituted into the query
        cursor = body.split("CURSOR=", 1)[1].split(";", 1)[0]
        remaining = [e for e in entities if e["id"] > cursor]
        return {"data": {"things": remaining[:10]}}

    df = fetch_subgraph_entities(
        spark,
        transport,
        "http://sg",
        "query { things(first:$first, where:{id_gt:\"CURSOR=$cursor;\"}) }",
        "things",
        "id string, n long",
        page_size=10,
    )
    assert df.count() == 25
    assert len(calls) == 3  # 10 + 10 + 5
    assert df.agg({"n": "sum"}).collect()[0][0] == sum(range(25))


def test_validator_performance_batched_single_request(spark):
    """check-sweeps.js:104-112 comma-joins all indices into ONE
    performance request; the normalizer must do the same."""
    from stakehouse_etl_spark.io.connectors import fetch_validator_performance

    calls = []

    def transport(url):
        calls.append(url)
        return {
            "data": [
                {"validatorindex": "7", "performancetotal": "111"},
                {"validatorindex": "9", "performancetotal": "222"},
            ]
        }

    df = fetch_validator_performance(spark, transport, "http://b", [7, 9])
    assert len(calls) == 1 and "/validator/7,9/performance" in calls[0]
    got = {r.validator: r.performance_total for r in df.collect()}
    assert got == {7: 111, 9: 222}
    # empty index list → no request, empty typed frame
    empty = fetch_validator_performance(spark, transport, "http://b", [])
    assert empty.count() == 0 and len(calls) == 1


def test_mev_block_stats_normalizer(spark):
    from stakehouse_etl_spark.io.connectors import fetch_mev_block_stats

    def transport(url):
        body = json.loads(url.split("#", 1)[1])
        assert body == {"startTime": 10, "endTime": 20}
        return {"totalBlocks": 5, "censoredBlocks": 2, "censoredPct": "40.0"}

    row = fetch_mev_block_stats(spark, transport, 10, 20).collect()[0]
    assert (row.total_blocks, row.censored_blocks, row.censored_pct) == (5, 2, "40.0")
    # transport failure → empty typed frame, not a crash
    assert fetch_mev_block_stats(spark, lambda u: None, 10, 20).count() == 0


def test_reconcile_keyed_all_statuses(spark):
    from stakehouse_etl_spark.operators.reconcile import (
        reconcile_keyed,
        reconcile_summary,
    )

    wh = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 30)], "k string, wv long"
    )
    src = spark.createDataFrame(
        [("a", 10), ("b", 25), ("d", 5)], "k string, sv long"
    )
    rep = reconcile_keyed(wh, src, ["k"], "wv", "sv")
    got = {r.k: (r.diff, r.status) for r in rep.collect()}
    assert got == {
        "a": (0, "match"),
        "b": (-5, "mismatch"),
        "c": (None, "missing_in_source"),
        "d": (None, "missing_in_warehouse"),
    }
    s = reconcile_summary(rep).collect()[0]
    assert (s.n_keys, s.n_match, s.n_mismatch, s.n_missing) == (4, 1, 1, 2)
    # tolerance turns the near-miss into a match
    rep2 = reconcile_keyed(wh, src, ["k"], "wv", "sv", tol=5)
    assert {r.k: r.status for r in rep2.collect()}["b"] == "match"


def test_datasource_v2_partitions_per_epoch(spark):
    from stakehouse_etl_spark.io.datasource import (
        BeaconBalancesDataSource,
        BeaconBalancesReader,
    )

    try:
        spark.dataSource.register(BeaconBalancesDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("beacon_balances")
        .option("lo", 10)
        .option("hi", 14)
        .option("n_keys", 3)
        .load()
    )
    # one InputPartition per epoch -> executor-side parallel fetch
    reader = BeaconBalancesReader({"lo": "10", "hi": "14", "n_keys": "3"})
    assert len(reader.partitions()) == 5
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    assert len(rows) == 15
    assert {r.epoch for r in rows} == set(range(10, 15))
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchScan" in plan, plan


def test_datasource_arrow_path_equals_row_path(spark):
    from stakehouse_etl_spark.io.datasource import BeaconBalancesDataSource

    try:
        spark.dataSource.register(BeaconBalancesDataSource)
    except Exception:
        pass

    def load(arrow: str):
        return (
            spark.read.format("beacon_balances")
            .option("lo", 7)
            .option("hi", 9)
            .option("n_keys", 11)
            .option("arrow", arrow)
            .load()
        )

    rows = {tuple(r) for r in load("false").collect()}
    arws = {tuple(r) for r in load("true").collect()}
    assert rows == arws and len(rows) == 33


def test_pon_eligibility_degraded_transport(spark):
    """S7: a failing beacon (transport returns None) must yield typed
    NULL state + NULL eligibility, never a crash or a false verdict;
    boundary balances are ineligible."""
    from stakehouse_etl_spark.io.connectors import fetch_pon_eligibility

    def transport(url: str):
        key = url.rsplit("/", 1)[1]
        if key == "0xdead":
            return None  # endpoint down for this key
        if key == "0xslash":
            return {"data": {"validator": {
                "effective_balance": "32000000000", "slashed": True}}}
        if key == "0xlow":
            return {"data": {"validator": {
                "effective_balance": "31999999999", "slashed": False}}}
        return {"data": {"validator": {
            "effective_balance": "32000000000", "slashed": False}}}

    out = {
        r.bls_key: (r.effective_balance, r.slashed, r.eligible)
        for r in fetch_pon_eligibility(
            spark, transport, ["0xdead", "0xslash", "0xlow", "0xok"]
        ).collect()
    }
    assert out["0xdead"] == (None, None, None)
    assert out["0xslash"] == (32_000_000_000, True, False)
    assert out["0xlow"] == (31_999_999_999, False, False)
    assert out["0xok"] == (32_000_000_000, False, True)
