"""Property tests for the round-2-continuation operators against
naive Python reimplementations (same one-dataset-per-example strategy
as tests/test_properties.py)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# --- strategies -----------------------------------------------------------

interval_panels = st.dictionaries(
    st.integers(min_value=0, max_value=3),  # user
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # lo
            st.integers(min_value=1, max_value=50),  # length
        ),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=3,
)

value_series = st.dictionaries(
    st.integers(min_value=0, max_value=3),
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=20),
    min_size=1,
    max_size=3,
)


def _coalesce_naive(intervals):
    """Union of [lo, hi] closed intervals → disjoint spans."""
    spans = []
    for lo, hi in sorted(intervals):
        if spans and lo <= spans[-1][1]:
            spans[-1][1] = max(spans[-1][1], hi)
        else:
            spans.append([lo, hi])
    return [tuple(s) for s in spans]


@settings(max_examples=10, deadline=None)
@given(interval_panels)
def test_interval_coalesce_matches_naive(spark, panel):
    from pyspark.sql import Window

    rows = [
        (u, lo, lo + ln)
        for u, ivs in panel.items()
        for lo, ln in ivs
    ]
    df = spark.createDataFrame(rows, "user_id long, lo long, hi long")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("lo", "hi")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("lo", "hi")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = df.withColumn("pmh", F.max("hi").over(w_prev)).withColumn(
        "gid",
        F.sum(
            F.when(
                F.col("pmh").isNull() | (F.col("lo") > F.col("pmh")), 1
            ).otherwise(0)
        ).over(w_run),
    )
    got = {
        (r["user_id"], r["lo"], r["hi"])
        for r in grp.groupBy("user_id", "gid")
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
        .collect()
    }
    want = {
        (u, lo, hi)
        for u, ivs in panel.items()
        for lo, hi in _coalesce_naive([(lo, lo + ln) for lo, ln in ivs])
    }
    assert got == want


def _max_concurrency_naive(intervals):
    """Peak number of simultaneously-live closed intervals."""
    best = 0
    points = sorted({p for lo, hi in intervals for p in (lo, hi)})
    for p in points:
        live = sum(1 for lo, hi in intervals if lo <= p <= hi)
        best = max(best, live)
    return best


@settings(max_examples=10, deadline=None)
@given(interval_panels)
def test_sweep_line_matches_naive(spark, panel):
    from pyspark.sql import Window

    rows = []
    for u, ivs in panel.items():
        for i, (lo, ln) in enumerate(ivs):
            rows.append((u, i, lo, lo + ln))
    df = spark.createDataFrame(rows, "user_id long, iid long, lo long, hi long")
    starts = df.select(
        "user_id", F.col("lo").alias("t"), F.lit(1).alias("d"),
        F.lit(0).alias("tie"), "iid",
    )
    ends = df.select(
        "user_id", F.col("hi").alias("t"), F.lit(-1).alias("d"),
        F.lit(1).alias("tie"), "iid",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tie", "iid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        (r["user_id"], r["mx"])
        for r in starts.unionByName(ends)
        .withColumn("live", F.sum("d").over(w))
        .groupBy("user_id")
        .agg(F.max("live").alias("mx"))
        .collect()
    }
    want = {
        (u, _max_concurrency_naive([(lo, lo + ln) for lo, ln in ivs]))
        for u, ivs in panel.items()
    }
    assert got == want


def _ewma_naive(series, taps=8):
    out = []
    for t in range(len(series)):
        num = den = 0
        for k in range(min(taps, t + 1)):
            wgt = 1 << (taps - 1 - k)
            num += series[t - k] * wgt
            den += wgt
        out.append((num, den))
    return out


@settings(max_examples=10, deadline=None)
@given(value_series)
def test_dyadic_ewma_matches_naive(spark, panel):
    from pyspark.sql import Window

    rows = [
        (u, i, v)
        for u, vals in panel.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "user_id long, seq long, cents long")
    win = Window.partitionBy("user_id").orderBy("seq")
    lags = [F.lag("cents", k).over(win) for k in range(1, 8)]
    num = F.col("cents") * F.lit(128)
    den = F.lit(128)
    for k, lg in enumerate(lags, start=1):
        wgt = 1 << (7 - k)
        num = num + F.coalesce(lg, F.lit(0)) * F.lit(wgt)
        den = den + F.when(lg.isNull(), F.lit(0)).otherwise(F.lit(wgt))
    got = {
        (r["user_id"], r["seq"], r["num"], r["den"])
        for r in df.select(
            "user_id", "seq", num.alias("num"), den.alias("den")
        ).collect()
    }
    want = {
        (u, i, num_den[0], num_den[1])
        for u, vals in panel.items()
        for i, num_den in enumerate(_ewma_naive(vals))
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab "), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=6,
    )
)
def test_intradoc_dedup_idempotent(spark, texts):
    """The ACTUAL Spark intra-doc dedup expression agrees with a naive
    Python reference on arbitrary texts, and that cleaning is a fixed
    point (cleaning already-cleaned text changes nothing)."""
    import hashlib

    from stakehouse_etl_spark.queries.pipeline26 import (
        CHUNK_TOKS,
        intradoc_dedup,
    )

    def clean(text):
        toks = [t for t in text.lower().strip().split() if t]
        chunks = [
            " ".join(toks[i : i + CHUNK_TOKS])
            for i in range(0, len(toks), CHUNK_TOKS)
        ]
        seen, kept = set(), []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        return " ".join(kept)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["cleaned_fp"] for r in intradoc_dedup(df).collect()}
    for i, t in enumerate(texts):
        once = clean(t)
        assert clean(once) == once
        if not t.lower().strip().split():
            # zero chunks -> the doc produces no rows (matches oracle)
            assert i not in got
        else:
            expect = hashlib.md5(once.encode()).hexdigest()
            assert got[i] == expect, f"doc {i}: {t!r}"


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["h", "h", "h", "a", "b", "c"]),  # skewed keys
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_adaptive_cumsum_equals_plain_window_property(spark, rows):
    """adaptive_cumsum == plain per-key running total on arbitrary
    skewed integer inputs, whichever plan the dispatcher picks.
    (key, time) is deduplicated first — the engine-wide unique-time
    contract for ROWS-frame running totals."""
    from pyspark.sql import Window

    from stakehouse_etl_spark.operators.windows import adaptive_cumsum

    seen = {}
    for k, t, v in rows:
        seen[(k, t)] = v
    data = [(k, t, v) for (k, t), v in seen.items()]
    df = spark.createDataFrame(data, "k string, t long, v long")
    got = {
        (r.k, r.t): r.cum
        for r in adaptive_cumsum(df, key="k", time="t", value="v", out="cum").collect()
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


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("abc "), min_size=0, max_size=60),
        min_size=2,
        max_size=8,
    )
)
def test_minhash_lsh_pipeline_matches_naive(spark, texts):
    """THIRD-implementation check of the full MinHash-LSH pipeline:
    Spark vs a from-scratch Python mirror (shingle -> md5-prefix hash
    -> 16 affine permutations -> 4-band md5 keys -> bucket candidates
    -> exact-Jaccard verify). The DuckDB oracle shares the SQL design;
    this one shares nothing but the constants."""
    import hashlib

    from stakehouse_etl_spark.operators.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_PRIME,
        _MH_A,
        _MH_B,
        minhash_lsh_pairs,
    )

    def sh_set(text):
        toks = [t for t in text.lower().strip().split() if t is not None]
        toks = [t for t in toks if t != ""]
        if len(toks) < 3:
            return set()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } - {""}

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def sig(shs):
        hs = [h32(s) for s in shs]
        return [
            min((_MH_A[j] * h + _MH_B[j]) % MINHASH_PRIME for h in hs)
            for j in range(len(_MH_A))
        ]

    docs = [(i, t) for i, t in enumerate(texts)]
    sets = {i: sh_set(t) for i, t in docs}
    sigs = {i: sig(s) for i, s in sets.items() if s}
    buckets = {}
    for i, sg in sigs.items():
        for b in range(LSH_BANDS):
            key_txt = ",".join(
                str(sg[b * LSH_ROWS + r]) for r in range(LSH_ROWS)
            )
            buckets.setdefault(
                (b, hashlib.md5(key_txt.encode()).hexdigest()), []
            ).append(i)
    cands = set()
    for members in buckets.values():
        for x in members:
            for y in members:
                if x < y:
                    cands.add((x, y))
    expect = set()
    for a, b in cands:
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter * 100 >= union * 20:
            expect.add((a, b))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, threshold_pct=20).collect()
    }
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # a sequence of batches of (key, value, op)
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),
                st.integers(min_value=0, max_value=99),
                st.sampled_from(["U", "U", "U", "D"]),
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_sink_family_matches_dict_semantics(spark, batches):
    """K1 upsert + CDC apply vs naive dict semantics over random batch
    sequences, through the REAL staged-rename sinks (partitioned by
    key bucket, so the per-partition swap + drop_dirs paths run).
    Batches are made key-unique first — the documented within-batch
    contract for write_upsert; write_cdc resolves in-batch order via
    seq_cols and keeps the last op per key."""
    import os
    import shutil
    import tempfile

    from stakehouse_etl_spark.io.sinks import write_cdc, write_upsert

    work = tempfile.mkdtemp(prefix="sink_prop_")
    try:
        up_path = os.path.join(work, "up")
        cdc_path = os.path.join(work, "cdc")
        up_state: dict[int, int] = {}
        cdc_state: dict[int, int] = {}
        wrote_cdc = False
        for batch in batches:
            uniq = {}
            for k, v, op in batch:  # last occurrence wins, like a log
                uniq[k] = (v, op)
            rows = [
                (k, v, op, k % 2) for k, (v, op) in sorted(uniq.items())
            ]
            df = spark.createDataFrame(
                rows, "k long, v long, op string, bucket long"
            )
            write_upsert(
                spark,
                df.selectExpr("k", "v", "bucket"),
                up_path,
                keys=["k"],
                partition_cols=["bucket"],
            )
            write_cdc(
                spark, df, cdc_path, keys=["k"], seq_cols=["v"],
                partition_cols=["bucket"],
            )
            wrote_cdc = True
            for k, (v, op) in uniq.items():
                up_state[k] = v
                if op == "D":
                    cdc_state.pop(k, None)
                else:
                    cdc_state[k] = v
        got_up = {r.k: r.v for r in spark.read.parquet(up_path).collect()}
        assert got_up == up_state
        try:
            got_cdc = {
                r.k: r.v for r in spark.read.parquet(cdc_path).collect()
            }
        except Exception:
            got_cdc = {}  # table never materialized (all-delete start)
        assert got_cdc == cdc_state
        assert wrote_cdc
    finally:
        shutil.rmtree(work, ignore_errors=True)


@settings(max_examples=4, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=3),  # key
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=24),  # epoch
                st.integers(min_value=0, max_value=500),  # balance
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=3,
    ),
    st.lists(st.integers(min_value=0, max_value=24), min_size=1, max_size=3),
)
def test_incremental_runs_equal_batch_property(spark, panel, raw_cuts):
    """T1/T3/T5 property: any sequence of incremental runs over
    monotone data prefixes (plus a replay) produces exactly the
    single-shot batch income — gaps, mid-stream bootstraps, and
    arbitrary cut points included."""
    import os
    import shutil
    import tempfile

    from stakehouse_etl_spark.operators.windows import cumulative_income
    from stakehouse_etl_spark.streaming.incremental import (
        incremental_income_run,
    )

    rows = []
    for k, series in panel.items():
        dedup = {}
        for e, v in series:
            dedup[e] = float(v)
        rows += [(k, e, v) for e, v in sorted(dedup.items())]
    df = spark.createDataFrame(rows, "bls_key long, epoch long, balance double")
    hi = max(e for _, e, _ in rows)
    cuts = sorted(set(raw_cuts + [hi]))

    wh = tempfile.mkdtemp(prefix="incprop_")
    try:
        sp, ip = os.path.join(wh, "s"), os.path.join(wh, "i")
        for c in cuts + [cuts[-1]]:  # final replay = T5 no-op probe
            incremental_income_run(
                spark,
                df.filter(F.col("epoch") <= c),
                state_path=sp,
                income_path=ip,
                money_scale=100,
            )
        try:
            got = {
                (r.bls_key, r.epoch): (r.earnings, r.losses)
                for r in spark.read.parquet(ip).collect()
            }
        except Exception:
            got = {}  # no rows ever produced (every key single-epoch)
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    want = {
        (r.bls_key, r.epoch): (r.earnings, r.losses)
        for r in cumulative_income(
            df, compute_apr=False, money_scale=100
        ).collect()
    }
    # incremental writes only rows it computed; batch emits every
    # surviving row — compare on the batch's domain
    assert set(got) == set(want)
    for key in want:
        assert got[key] == want[key]
