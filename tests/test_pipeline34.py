"""Unit tests for the wave-3/4 operators: connected-components
convergence on deep graphs (pointer jumping), prefix-filter
losslessness, CDC compaction semantics, and the anomaly-flag kernel
against a naive Python reimplementation."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stakehouse_etl_spark.operators.dedup import (
    jaccard_pairs,
    prefix_filter_jaccard_pairs,
)
from stakehouse_etl_spark.operators.graph import connected_components


def test_cc_long_chain_converges(spark):
    # A 200-node path has diameter 199: plain min-propagation would need
    # 199 passes (max_iter=20 would silently under-merge); pointer
    # jumping must resolve it within the default iteration budget.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], ["src", "dst"]
    )
    out = connected_components(edges).collect()
    assert len(out) == 201
    assert {r["component"] for r in out} == {0}


def test_cc_two_components_and_star(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (10, 13)], ["src", "dst"]
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == comp[12] == comp[13] == 10


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_prefix_filter_matches_bruteforce(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,
        base,  # exact dup
        base + " extra",  # near dup
        "alpha beta gamma " + "unrelated words here now then",  # partial
        "completely different content with no shared shingles at all",
        base.replace("delta", "DELTA"),  # one-token change
    ]
    docs = _mkdocs(spark, texts)
    for t in (50, 70, 90):
        exact = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in jaccard_pairs(docs, threshold_pct=t).collect()
        }
        pf = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in prefix_filter_jaccard_pairs(docs, threshold_pct=t).collect()
        }
        assert pf == exact, f"threshold {t}: prefix filter lost/added pairs"


_words = st.sampled_from("aa bb cc dd ee ff gg hh".split())
_corpus = st.lists(
    st.lists(_words, min_size=3, max_size=10).map(" ".join),
    min_size=2,
    max_size=10,
)


@settings(max_examples=10, deadline=None)
@given(texts=_corpus, t=st.sampled_from([40, 70, 90]))
def test_prefix_filter_lossless_property(spark, texts, t):
    """Randomized losslessness proof of the full filter stack — prefix
    pigeonhole + length filter + PPJoin positional filter (r5) — vs the
    brute-force all-pairs join. Tiny vocabulary forces heavy shingle
    collisions, exactly where a wrong positional bound would drop
    true pairs."""
    docs = _mkdocs(spark, texts)
    exact = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs(docs, threshold_pct=t).collect()
    }
    pf = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in prefix_filter_jaccard_pairs(docs, threshold_pct=t).collect()
    }
    assert pf == exact


def test_anomaly_flag_matches_naive(spark, sf_dir):
    from stakehouse_etl_spark.queries.pipeline3 import ts_anomaly_zscore_q

    rows = ts_anomaly_zscore_q(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts_us"], r["event_id"])):
        hist = by_user.setdefault(r["user_id"], [])
        prev = hist[-8:]
        n = len(prev)
        if n >= 4:
            s = sum(prev)
            q = sum(c * c for c in prev)
            dev = n * r["cents"] - s
            want = dev * dev > 4 * n * (n * q - s * s)
        else:
            want = False
        assert r["is_anomaly"] == want, (r["user_id"], r["event_id"])
        assert r["n_prev"] == n
        hist.append(r["cents"])


def test_cdc_apply_tombstones(spark, sf_dir):
    from stakehouse_etl_spark.queries.pipeline3 import inc_cdc_apply_q

    from stakehouse_etl_spark.io.sources import load_table

    snap = {r["user_id"]: r for r in inc_cdc_apply_q(spark, sf_dir).collect()}
    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).collect()
    last: dict[int, tuple] = {}
    for r in events:
        key = (r["ts_us"], r["event_id"])
        if r["user_id"] not in last or key > last[r["user_id"]][0]:
            last[r["user_id"]] = (key, r["event_type"], r["cents"])
    for uid, (_, etype, cents) in last.items():
        if etype == "error":
            assert uid not in snap  # tombstone wins
        else:
            assert snap[uid]["last_cents"] == cents
