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
