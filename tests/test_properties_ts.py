"""Property tests for the time-series and graph operators against
naive Python reimplementations (same strategy as
tests/test_properties.py — one whole multi-key dataset per example,
one Spark job per example)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stakehouse_etl_spark.operators.graph import connected_components
from stakehouse_etl_spark.operators.timeseries import gap_fill_linear, sessionize

# --- strategies -----------------------------------------------------------

ts_lists = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30
)
ts_panels = st.dictionaries(
    st.integers(min_value=0, max_value=4), ts_lists, min_size=1, max_size=3
)

obs_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    ),
    min_size=1,
    max_size=15,
)
obs_panels = st.dictionaries(
    st.integers(min_value=0, max_value=3), obs_series, min_size=1, max_size=3
)

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=15),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)

GAP = 100


def _naive_sessions(panel):
    out = []
    for key, stamps in panel.items():
        stamps = sorted(stamps)
        seq, start, prev, n = 0, stamps[0], stamps[0], 0
        for t in stamps:
            if t - prev > GAP:
                out.append((key, seq, start, prev, n))
                seq, start, n = seq + 1, t, 0
            n += 1
            prev = t
        out.append((key, seq, start, prev, n))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(ts_panels)
def test_sessionize_matches_naive(spark, panel):
    rows = [(k, t) for k, ts in panel.items() for t in ts]
    df = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = sorted(
        tuple(r)
        for r in sessionize(df, key="user_id", ts_us="ts_us", gap_us=GAP)
        .select(
            "user_id", "session_seq", "session_start_us", "session_end_us", "n_events"
        )
        .collect()
    )
    # Duplicate timestamps collapse into the same session; the naive
    # model keeps duplicates as events too, so compare after rebuilding
    # from the same multiset.
    assert got == _naive_sessions(panel)


def _naive_gap_fill(panel):
    out = []
    for key, series in panel.items():
        obs = {}
        for e, v in series:
            obs[e] = v
        e0, e1 = min(obs), max(obs)
        pts = sorted(obs.items())
        for e in range(e0, e1 + 1):
            if e in obs:
                out.append((key, e, obs[e], False))
            else:
                prev = max(p for p in pts if p[0] < e)
                nxt = min(p for p in pts if p[0] > e)
                frac = (e - prev[0]) * 1.0 / (nxt[0] - prev[0])
                out.append((key, e, prev[1] + (nxt[1] - prev[1]) * frac, True))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(obs_panels)
def test_gap_fill_matches_naive(spark, panel):
    rows = []
    seen = set()
    for k, series in panel.items():
        for e, v in series:
            if (k, e) not in seen:
                seen.add((k, e))
                rows.append((k, e, v))
    # last-write-wins dedupe like the naive model
    dedup = {}
    for k, e, v in rows:
        dedup[(k, e)] = v
    panel2 = {}
    for (k, e), v in dedup.items():
        panel2.setdefault(k, []).append((e, v))
    df = spark.createDataFrame(
        [(k, e, v) for (k, e), v in dedup.items()],
        "key long, epoch long, balance double",
    )
    got = sorted(
        tuple(r)
        for r in gap_fill_linear(df, key="key", time="epoch", value="balance")
        .select("key", "epoch", "balance", "interpolated")
        .collect()
    )
    assert got == _naive_gap_fill(panel2)


def _naive_components(edges):
    nodes = sorted({n for e in edges for n in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((n, find(n)) for n in nodes)


@settings(max_examples=8, deadline=None)
@given(edge_lists)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        tuple(r)
        for r in connected_components(df).select("node", "component").collect()
    )
    assert got == _naive_components(edges)


# ------------------------------------------------- percentile kernel
pct_groups = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    min_size=1,
    max_size=3,
)


def _naive_pctl(values, num, den):
    xs = sorted(values)
    n = len(xs)
    pos_num = num * (n - 1)
    k, rem = divmod(pos_num, den)
    a = xs[k]
    b = xs[k + 1] if k + 1 < n else a
    return (a + (b - a) * (rem / den)) / 100.0


@settings(max_examples=10, deadline=None)
@given(pct_groups)
def test_percentile_kernel_matches_naive(spark, groups):
    from pyspark.sql import Window

    rows = [(g, i, v) for g, vs in groups.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    w = Window.partitionBy("g").orderBy("v", "id")
    wc = Window.partitionBy("g")
    s = df.select(
        "g",
        "v",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n"),
    )

    def hit(num, den, off):
        k = F.expr(f"({num} * (n - 1)) div {den}")
        return F.max(F.when(F.col("rn") == k + off, F.col("v")))

    agg = s.groupBy("g").agg(
        F.max("n").alias("n"),
        hit(1, 2, 1).alias("a50"),
        hit(1, 2, 2).alias("b50"),
        hit(9, 10, 1).alias("a90"),
        hit(9, 10, 2).alias("b90"),
    )

    def interp(a, b, num, den):
        frac = ((F.lit(num) * (F.col("n") - 1)) % den) / float(den)
        return (F.col(a) + (F.coalesce(F.col(b), F.col(a)) - F.col(a)) * frac) / 100.0

    out = {
        r["g"]: (r["p50"], r["p90"])
        for r in agg.select(
            "g",
            interp("a50", "b50", 1, 2).alias("p50"),
            interp("a90", "b90", 9, 10).alias("p90"),
        ).collect()
    }
    for g, vs in groups.items():
        assert out[g][0] == _naive_pctl(vs, 1, 2), g
        assert out[g][1] == _naive_pctl(vs, 9, 10), g
