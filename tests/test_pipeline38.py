"""Wave-38 invariants: association-rule identities, orphan-free
referential chain on the generated data, Simpson sign consistency."""

from __future__ import annotations


def test_rules_identities(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["ml_lift_confidence_rules"].fn(spark, "/root/testdata/sf0.001").collect()
    assert out, "support floor too high for sf0.001"
    for r in out:
        assert r["ante"] != r["cons"]
        assert r["n_both"] >= 3
        assert r["n_both"] <= min(r["n_ante"], r["n_cons"])
        assert r["confidence"] == r["n_both"] / r["n_ante"]
        assert 0.0 < r["confidence"] <= 1.0
    lifts = [r["lift"] for r in out]
    assert lifts == sorted(lifts, reverse=True)


def test_rules_directed_pairs_symmetric_support(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["ml_lift_confidence_rules"].fn(spark, "/root/testdata/sf0.001").collect()
    support = {(r["ante"], r["cons"]): r["n_both"] for r in out}
    for (a, c), n in support.items():
        if (c, a) in support:
            assert support[(c, a)] == n  # co-occurrence is symmetric


def test_referential_chain_clean(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["dq_referential_orphans"].fn(spark, "/root/testdata/sf0.001").collect()
    assert {r["fk"] for r in out} == {
        "lineitem->orders",
        "orders->customer",
        "customer->nation",
    }
    for r in out:
        assert r["n_orphan"] == 0  # generated data is referentially intact
        assert r["n_child"] > 0


def test_simpsons_signs_consistent(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    out = QUERIES["ml_simpsons_audit"].fn(spark, "/root/testdata/sf0.001").collect()
    assert out
    overall = {r["overall_sign"] for r in out}
    assert len(overall) == 1  # the overall sign is a single global fact
    for r in out:
        assert r["stratum_sign"] in (-1, 0, 1)
        # reversed flag must equal the sign product being -1
        assert r["reversed"] == (r["stratum_sign"] * r["overall_sign"] == -1)
        # the displayed means must agree with the cross-multiplied sign
        if r["stratum_sign"] == 1:
            assert r["avg_a"] > r["avg_b"]
        elif r["stratum_sign"] == -1:
            assert r["avg_a"] < r["avg_b"]
