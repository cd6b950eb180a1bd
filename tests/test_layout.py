"""Tests for the layout wave: Z-order locality, partition pruning,
vocabulary coverage."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from stakehouse_etl_spark.io.sources import load_table
from stakehouse_etl_spark.queries.layout import (
    PRUNE_HI,
    PRUNE_LO,
    VOCAB_K,
    layout_zorder_stats,
    partitioned_scan_plan,
    sink_partitioned_prune,
    text_oov_rate,
)


def _interleave(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_naive_and_is_local(spark, sf_dir):
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            (F.col("o_custkey").cast("long") % 65536).alias("x"),
            F.expr(
                "CAST(datediff(cast(o_orderdate as date), date'1970-01-01')"
                " AS BIGINT) & 65535"
            ).alias("y"),
        )
        .collect()
    )
    boxes = defaultdict(lambda: [1 << 20, 0, 1 << 20, 0, 0])
    for r in orders:
        z = _interleave(r["x"], r["y"])
        b = boxes[z >> 12]
        b[0] = min(b[0], r["x"])
        b[1] = max(b[1], r["x"])
        b[2] = min(b[2], r["y"])
        b[3] = max(b[3], r["y"])
        b[4] += 1
    got = {
        r["zbucket"]: (r["min_x"], r["max_x"], r["min_y"], r["max_y"], r["n"])
        for r in layout_zorder_stats(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in boxes.items()}
    # The locality property that makes z-sorted files skippable: a
    # bucket's bounding box spans a small slice of each dimension.
    x_span = max(r["x"] for r in orders) - min(r["x"] for r in orders)
    for mn_x, mx_x, mn_y, mx_y, _ in got.values():
        assert mx_x - mn_x <= 64, (mn_x, mx_x)  # z>>12 fixes bits 6+ of x
        assert mx_y - mn_y <= 64, (mn_y, mx_y)
    assert x_span > 64  # the bound above is non-vacuous


def test_partitioned_prune_matches_plain_filter(spark, sf_dir):
    got = {
        (r["o_orderpriority"], r["day30"]): (r["n"], r["sum_cents"])
        for r in sink_partitioned_prune(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            F.expr(
                "CAST(datediff(cast(o_orderdate as date), date'1970-01-01')"
                " AS BIGINT) div 30"
            ).alias("day30"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .filter((F.col("day30") >= PRUNE_LO) & (F.col("day30") <= PRUNE_HI))
        .collect()
    )
    expect_n = Counter((r["o_orderpriority"], r["day30"]) for r in rows)
    expect_sum = defaultdict(int)
    for r in rows:
        expect_sum[(r["o_orderpriority"], r["day30"])] += r["cents"]
    assert got == {k: (expect_n[k], expect_sum[k]) for k in expect_n}


def test_partitioned_scan_plan_prunes(spark, sf_dir):
    plan = partitioned_scan_plan(spark, sf_dir)
    # The range predicate must land in PartitionFilters (directory
    # pruning), not in PushedFilters / a post-scan Filter.
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan
    assert "day30" in m.group(1), m.group(1)


def test_oov_rate_matches_naive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: re.split(r"\s+", r["text"].strip().lower()) for r in docs}
    counts = Counter(t for ts in toks.values() for t in ts)
    vocab = {
        t
        for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]
    }
    got = {r["doc_id"]: r for r in text_oov_rate(spark, sf_dir).collect()}
    assert set(got) == set(toks)
    for doc_id, ts in toks.items():
        n_oov = sum(1 for t in ts if t not in vocab)
        g = got[doc_id]
        assert (g["n_tok"], g["n_oov"]) == (len(ts), n_oov), doc_id
        assert abs(g["oov_rate"] - n_oov / len(ts)) < 1e-12
