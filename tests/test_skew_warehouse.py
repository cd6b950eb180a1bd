"""Skew operators + partitioned-warehouse sink tests."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from stakehouse_etl_spark.io.sinks import with_epoch_bucket, write_time_partitioned
from stakehouse_etl_spark.operators.skew import salted_join, two_stage_agg


def test_salted_join_equals_plain_join(spark):
    # 90% of the large side is one hot key — the salting target.
    large = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = large.join(small, "k").select("k", "v", "w")
    salted = salted_join(large, small, on=["k"]).select("k", "v", "w")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_two_stage_agg_equals_plain(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 97).alias("x")
    )
    plain = df.groupBy("k").agg(
        F.sum("x").alias("sx"), F.count("x").alias("n"),
        F.min("x").alias("mn"), F.max("x").alias("mx"),
    )
    staged = two_stage_agg(
        df, ["k"],
        {"sx": ("x", "sum"), "n": ("x", "count"), "mn": ("x", "min"), "mx": ("x", "max")},
    )
    assert sorted(map(tuple, staged.collect())) == sorted(map(tuple, plain.collect()))


def test_two_stage_agg_rejects_non_decomposable(spark):
    df = spark.range(1).select(F.col("id").alias("k"), F.col("id").alias("x"))
    try:
        two_stage_agg(df, ["k"], {"a": ("x", "avg")})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_time_partitioned_upsert_touches_only_buckets(spark):
    wh = tempfile.mkdtemp(prefix="wh_")
    path = os.path.join(wh, "income")
    try:
        day0 = spark.createDataFrame(
            [("a", 10, 1.0), ("a", 200, 2.0), ("b", 10, 3.0)],
            "bls_key string, epoch long, earnings double",
        )
        write_time_partitioned(spark, day0, path, keys=["bls_key", "epoch"])
        assert sorted(
            d for d in os.listdir(path) if d.startswith("epoch_bucket=")
        ) == ["epoch_bucket=0"]

        # Second write: bucket 1 rows + an update to one bucket-0 row.
        day1 = spark.createDataFrame(
            [("a", 10, 9.0), ("a", 250, 4.0)],
            "bls_key string, epoch long, earnings double",
        )
        write_time_partitioned(spark, day1, path, keys=["bls_key", "epoch"])
        back = spark.read.parquet(path)
        got = {(r.bls_key, r.epoch): r.earnings for r in back.collect()}
        assert got == {
            ("a", 10): 9.0,   # upserted (newest wins)
            ("a", 200): 2.0,  # untouched row of the touched bucket survives
            ("b", 10): 3.0,
            ("a", 250): 4.0,  # new bucket
        }

        # Partition pruning: an epoch-bucket predicate reaches the scan.
        pruned = back.filter(F.col("epoch_bucket") == 1)
        plan = pruned._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "epoch_bucket" in plan
        assert {r.epoch for r in pruned.collect()} == {250}
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_with_epoch_bucket(spark):
    df = spark.createDataFrame([(0,), (224,), (225,), (450,)], "epoch long")
    got = [r.epoch_bucket for r in with_epoch_bucket(df).orderBy("epoch").collect()]
    assert got == [0, 0, 1, 2]


def test_bucketed_join_has_no_exchange(spark):
    from stakehouse_etl_spark.io.sinks import write_bucketed

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    wh = tempfile.mkdtemp(prefix="bucketed_wh_")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(left, "t_left_b", ["k"], 4, path=os.path.join(wh, "l"))
        write_bucketed(right, "t_right_b", ["k"], 4, path=os.path.join(wh, "r"))
        # Force a non-broadcast join so the shuffle would be visible.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a, b = spark.table("t_left_b"), spark.table("t_right_b")
        joined = a.join(b, "k").select("k", "v", "w")
        plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "Exchange" not in plan, plan
        got = {(r.k, r.v, r.w) for r in joined.collect()}
        assert len(got) == 1000 and (5, 10, 15) in got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_left_b")
        spark.sql("DROP TABLE IF EXISTS t_right_b")
        shutil.rmtree(wh, ignore_errors=True)


def test_skew_resistant_cumsum_equals_plain_window(spark):
    """Two-phase chunked running total must be value-identical to the
    plain per-key window — including a hot key with 60% of all rows,
    duplicate-free ordering, and negative values."""
    import random

    from pyspark.sql import Window

    from stakehouse_etl_spark.operators.windows import skew_resistant_cumsum

    rng = random.Random(7)
    rows = []
    t = 0
    for _ in range(3000):  # hot key: 3000 of ~5000 rows
        t += rng.randint(1, 3)
        rows.append(("hot", t, rng.randint(-50, 100)))
    for k in range(20):
        t = 0
        for _ in range(100):
            t += rng.randint(1, 5)
            rows.append((f"k{k}", t, rng.randint(-50, 100)))
    df = spark.createDataFrame(rows, "k string, t long, v long")

    got = skew_resistant_cumsum(df, key="k", time="t", value="v", out="cum")
    plain = df.withColumn(
        "cum",
        F.sum("v").over(
            Window.partitionBy("k").orderBy("t").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    a = {(r.k, r.t): r.cum for r in got.collect()}
    b = {(r.k, r.t): r.cum for r in plain.collect()}
    assert a == b


def test_skew_resistant_cumsum_single_timestamp_key(spark):
    """Degenerate key whose rows all share one timestamp value must not
    divide by zero in the chunk formula."""
    from stakehouse_etl_spark.operators.windows import skew_resistant_cumsum

    df = spark.createDataFrame([("a", 5, 1), ("b", 5, 2)], "k string, t long, v long")
    got = {r.k: r.cum for r in skew_resistant_cumsum(df, "k", "t", "v", "cum").collect()}
    assert got == {"a": 1, "b": 2}


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_adaptive_cumsum_dispatches_by_key_histogram(spark):
    """VERDICT r2 task 5: one entry point; the sampled key histogram
    picks the chunked plan for a hot key and the plain single-window
    plan for uniform keys — and both dispatch outcomes are
    value-identical to the plain window."""
    import random

    from pyspark.sql import Window

    from stakehouse_etl_spark.operators.windows import adaptive_cumsum

    rng = random.Random(11)

    def plain(df):
        return df.withColumn(
            "cum",
            F.sum("v").over(
                Window.partitionBy("k").orderBy("t").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )

    # HOT: one key holds ~60% of rows -> chunked plan (two window
    # specs, the (k, __chunk) within-chunk one present).
    rows = [("hot", t, rng.randint(-5, 9)) for t in range(1, 6001)]
    for k in range(40):
        rows += [(f"k{k}", t, rng.randint(-5, 9)) for t in range(1, 101)]
    hot_df = spark.createDataFrame(rows, "k string, t long, v long")
    hot_out = adaptive_cumsum(hot_df, key="k", time="t", value="v", out="cum")
    assert "__chunk" in _formatted_plan(hot_out)
    a = {(r.k, r.t): r.cum for r in hot_out.collect()}
    b = {(r.k, r.t): r.cum for r in plain(hot_df).collect()}
    assert a == b

    # UNIFORM: 40 keys, equal share -> plain single-window plan, no
    # chunk machinery.
    rows = []
    for k in range(40):
        rows += [(f"k{k}", t, rng.randint(-5, 9)) for t in range(1, 201)]
    uni_df = spark.createDataFrame(rows, "k string, t long, v long")
    uni_out = adaptive_cumsum(uni_df, key="k", time="t", value="v", out="cum")
    assert "__chunk" not in _formatted_plan(uni_out)
    a = {(r.k, r.t): r.cum for r in uni_out.collect()}
    b = {(r.k, r.t): r.cum for r in plain(uni_df).collect()}
    assert a == b


def test_adaptive_cumsum_empty_input_falls_back_plain(spark):
    from stakehouse_etl_spark.operators.windows import adaptive_cumsum

    df = spark.createDataFrame([], "k string, t long, v long")
    out = adaptive_cumsum(df, key="k", time="t", value="v", out="cum")
    assert out.count() == 0
    assert "__chunk" not in _formatted_plan(out)


def test_skew_resistant_cumsum_keeps_null_keys(spark):
    """NULL keys are an ordinary window group for the plain form; the
    chunked decomposition must not drop them through its key joins
    (null-safe equality throughout)."""
    from pyspark.sql import Window

    from stakehouse_etl_spark.operators.windows import skew_resistant_cumsum

    df = spark.createDataFrame(
        [(None, 1, 5), (None, 2, 7), ("a", 1, 1), ("a", 3, 2)],
        "k string, t long, v long",
    )
    got = {
        (r.k, r.t): r.cum
        for r in skew_resistant_cumsum(df, "k", "t", "v", "cum").collect()
    }
    plain = {
        (r.k, r.t): r.cum
        for r in df.withColumn(
            "cum",
            F.sum("v").over(
                Window.partitionBy("k").orderBy("t").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        ).collect()
    }
    assert got == plain
    assert (None, 2) in got and got[(None, 2)] == 12


def test_skew_resistant_rank_keeps_null_values(spark):
    """NULL rank-values are ranked last (desc) by the plain global
    window; the decomposition must agree and must not drop them."""
    from pyspark.sql import Window

    from stakehouse_etl_spark.operators.windows import skew_resistant_rank

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 10), (4, 7), (5, None)],
        "id long, v long",
    )
    got = {
        r.id: r.rank
        for r in skew_resistant_rank(df, value="v", id_col="id").collect()
    }
    plain = {
        r.id: r.rank
        for r in df.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("v"), F.asc("id"))),
        ).collect()
    }
    assert got == plain
    assert len(got) == 5


def test_aqe_splits_skewed_join(spark):
    """The session's AQE skew-join config actually fires: a 90%-hot
    join key gets split at runtime (SortMergeJoin(skew=true) +
    AQEShuffleRead skewed) instead of funneling the hot partition
    through one task. Executed-plan inspection needs collect() on the
    SAME QueryExecution — a noop write runs a different one."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(1_000_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(100_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0]["count"] == 910_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
