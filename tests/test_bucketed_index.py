"""Mechanism pins for the bucketed gram-index arm (PLANS.md Round-9).

``stream_span_scrub_bucketed`` exists because a plain-parquet index
forces the per-batch probe join to SHUFFLE the whole stored index
(O(state) per micro-batch, measured as a ~+1.5%/batch rise in the
20-batch sf10 fuzz). The two properties that make the bucketed arm an
escalation — shuffle-free index side, partition-exact retry — are
pinned here at unit scale so a Spark upgrade or refactor that silently
loses either fails CI, not a cluster bill.
"""

from __future__ import annotations

import re
import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def idx_table(spark):
    tbl = f"test_gram_idx_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    yield tbl
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def _grams(spark, lo: int, hi: int, bid: int):
    return spark.range(lo, hi).select(
        F.md5(F.col("id").cast("string")).alias("gram"),
        F.lit(bid).alias("bid"),
    )


def _land(df, tbl: str, first: bool) -> None:
    if first:
        df.write.partitionBy("bid").bucketBy(8, "gram").sortBy(
            "gram"
        ).mode("overwrite").saveAsTable(tbl)
    else:
        df.select("gram", "bid").write.insertInto(tbl, overwrite=True)


def test_bucketed_probe_shuffles_only_the_batch_side(spark, idx_table):
    _land(_grams(spark, 0, 1000, 0), idx_table, first=True)
    _land(_grams(spark, 1000, 2000, 1), idx_table, first=False)
    probe = spark.range(500).select(
        F.md5(F.col("id").cast("string")).alias("gram")
    )
    idx = (
        spark.table(idx_table)
        .filter(F.col("bid") < 2)
        .select("gram")
        .hint("MERGE")
    )
    j = probe.join(idx, "gram", "left_semi")
    plan = j._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        j._jdf.queryExecution(), "formatted"
    )
    shuffles = len(re.findall(r"\(\d+\) Exchange", plan))
    assert shuffles == 1, plan  # batch side only; bucketed scan is free
    assert "SortMergeJoin" in plan, plan


def test_dynamic_overwrite_makes_batch_retry_idempotent(spark, idx_table):
    _land(_grams(spark, 0, 100, 0), idx_table, first=True)
    _land(_grams(spark, 100, 200, 1), idx_table, first=False)
    assert spark.table(idx_table).count() == 200
    # Micro-batch retry: re-insert bid=1 — replaces the partition, no
    # duplicate rows, other partitions untouched.
    _land(_grams(spark, 100, 200, 1), idx_table, first=False)
    assert spark.table(idx_table).count() == 200
    assert (
        spark.table(idx_table).filter(F.col("bid") == 0).count() == 100
    )


def test_bucketed_arm_matches_plain_arm(spark, sf_dir):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    plain = {
        (r["doc_id"], r["cleaned_fp"], r["n_kept"], r["batch_no"])
        for r in QUERIES["stream_span_scrub"].fn(spark, sf_dir).collect()
    }
    bucketed = {
        (r["doc_id"], r["cleaned_fp"], r["n_kept"], r["batch_no"])
        for r in QUERIES["stream_span_scrub_bucketed"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert plain == bucketed
