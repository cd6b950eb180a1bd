"""Tests for the fourth analytics wave: PageRank, RANGE-frame rolling
windows, group OLS trend, vocabulary overlap — each validated against a
naive driver-side recomputation on sf0.001."""

from __future__ import annotations

import re
from collections import defaultdict

from pyspark.sql import functions as F

from stakehouse_etl_spark.io.sources import load_table
from stakehouse_etl_spark.operators.dedup import jaccard_pairs
from stakehouse_etl_spark.queries.analytics2 import HOUR_US
from stakehouse_etl_spark.queries.analytics3 import (
    PR_BASE,
    PR_SCALE,
    graph_pagerank_2iter,
    ml_group_ols_trend,
    text_vocab_overlap,
    ts_rolling_1h_range,
)


def _events(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
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


def test_pagerank_matches_naive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold_pct=20).select("id_a", "id_b").collect()
    sym = set()
    for r in pairs:
        sym.add((r["id_a"], r["id_b"]))
        sym.add((r["id_b"], r["id_a"]))
    deg = defaultdict(int)
    for a, _ in sym:
        deg[a] += 1
    rank = {n: PR_SCALE for n in deg}
    for _ in range(2):
        contrib = defaultdict(int)
        for a, b in sym:
            contrib[b] += rank[a] // deg[a]
        rank = {n: PR_BASE + (85 * c) // 100 for n, c in contrib.items()}
    got = {
        r["doc_id"]: (r["deg"], r["rank_scaled"])
        for r in graph_pagerank_2iter(spark, sf_dir).collect()
    }
    assert got == {n: (deg[n], rank[n]) for n in rank}
    assert all(r >= PR_BASE for _, r in got.values())


def test_rolling_range_matches_naive(spark, sf_dir):
    per_user = _events(spark, sf_dir)
    got = {
        r["event_id"]: (r["n_1h"], r["sum_cents_1h"])
        for r in ts_rolling_1h_range(spark, sf_dir).collect()
    }
    for rs in per_user.values():
        for r in rs:
            # RANGE frame: every peer row within [ts-1h, ts], incl. ties.
            win = [x for x in rs if r["ts_us"] - HOUR_US <= x["ts_us"] <= r["ts_us"]]
            assert got[r["event_id"]] == (len(win), sum(x["cents"] for x in win))


def test_ols_trend_matches_naive(spark, sf_dir):
    per_user = _events(spark, sf_dir)
    got = {
        r["user_id"]: r for r in ml_group_ols_trend(spark, sf_dir).collect()
    }
    for uid, rs in per_user.items():
        if len(rs) < 2:
            assert uid not in got
            continue
        xs = list(range(1, len(rs) + 1))
        ys = [r["cents"] for r in rs]
        n, sx, sy = len(xs), sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        g = got[uid]
        assert g["n"] == n
        assert abs(g["slope_cents"] - slope) < 1e-9
        assert abs(g["intercept_cents"] - intercept) < 1e-9


def test_vocab_overlap_matches_naive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    vocab = defaultdict(set)
    for r in docs:
        vocab[r["source"]].update(re.split(r"\s+", r["text"].strip().lower()))
    got = {
        (r["src_a"], r["src_b"]): r
        for r in text_vocab_overlap(spark, sf_dir).collect()
    }
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            union = len(vocab[a] | vocab[b])
            if inter == 0:
                assert (a, b) not in got
                continue
            g = got[(a, b)]
            assert (g["inter"], g["union_sz"]) == (inter, union)
            assert abs(g["jaccard"] - inter / union) < 1e-12


def test_tree_rollup_recurrence(spark, sf_dir):
    """Subtree totals must satisfy the tree recurrence:
    subtree(p) = own(p) + subtree(2p) + subtree(2p+1)."""
    import re as _re

    from stakehouse_etl_spark.queries.analytics3 import graph_tree_rollup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    own = {
        r["doc_id"]: len(_re.split(r"\s+", r["text"].strip().lower())) for r in docs
    }
    got = {
        r["node"]: (r["n_desc"], r["subtree_tok"])
        for r in graph_tree_rollup(spark, sf_dir).collect()
    }
    # Root covers every document exactly once.
    assert got[0] == (len(own), sum(own.values()))
    for node, (n_desc, tok) in got.items():
        child_desc = sum(got[c][0] for c in (2 * node, 2 * node + 1) if c in got and node > 0)
        child_tok = sum(got[c][1] for c in (2 * node, 2 * node + 1) if c in got and node > 0)
        if node > 0:
            assert n_desc == (1 if node in own else 0) + child_desc, node
            assert tok == own.get(node, 0) + child_tok, node
