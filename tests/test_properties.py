"""Property tests for the distributed kernels against naive Python
reimplementations (the reference's test strategy, SURVEY §5, extended
beyond the financial kernel to the window and sketch operators).

Each hypothesis example generates a whole multi-key dataset and runs
ONE Spark job, so example counts stay small but each example checks
many keys at once.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stakehouse_etl_spark.operators.dedup import (
    _MH_A,
    _MH_B,
    MINHASH_PERMS,
    MINHASH_PRIME,
    minhash_signatures,
)
from stakehouse_etl_spark.operators.windows import cumulative_income, spike_filter

# --- strategies -----------------------------------------------------------

series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # epoch
        st.floats(min_value=0, max_value=1e6, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
)
panels = st.dictionaries(
    st.integers(min_value=0, max_value=5), series, min_size=1, max_size=4
)

WORDS = ["aa", "bb", "cc", "dd", "ee"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _dedupe(series_):
    out = {}
    for e, v in series_:
        out[e] = v  # last write wins; unique (key, epoch)
    return sorted(out.items())


# --- W1 cumulative income -------------------------------------------------


def naive_income(rows, stop_at_gap):
    """rows: sorted (epoch, balance). Returns [(epoch, earnings, losses)]."""
    out, earn_c, loss_c = [], 0, 0
    prev_e, prev_c = None, None
    for e, v in rows:
        c = round(v * 100)
        if prev_e is not None and stop_at_gap and e - prev_e > 1:
            break
        if prev_c is not None:
            d = c - prev_c
            if d > 0:
                earn_c += d
            else:
                loss_c -= d
        out.append((e, earn_c / 100.0, loss_c / 100.0))
        prev_e, prev_c = e, c
    return out


@given(panels, st.booleans())
@settings(max_examples=8, deadline=None)
def test_cumulative_income_matches_naive(spark, panel, stop):
    rows = [
        (k, e, v) for k, s in panel.items() for e, v in _dedupe(s)
    ]
    df = spark.createDataFrame(rows, "bls_key long, epoch long, balance double")
    got = {
        (r.bls_key, r.epoch): (r.earnings, r.losses)
        for r in cumulative_income(
            df, stop_at_gap=stop, compute_apr=False, money_scale=100
        ).collect()
    }
    want = {}
    for k, s in panel.items():
        for e, earn, loss in naive_income(_dedupe(s), stop):
            want[(k, e)] = (earn, loss)
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == pytest.approx(want[key][0])
        assert got[key][1] == pytest.approx(want[key][1])


# --- W3 spike filter ------------------------------------------------------


def naive_spike_filter(rows, threshold=0.10):
    keep = []
    for i, (e, v) in enumerate(rows):
        if 0 < i < len(rows) - 1:
            pv, nv = rows[i - 1][1], rows[i + 1][1]
            rp = abs(v - pv) / abs(pv) if pv != 0 else None
            rn = abs(v - nv) / abs(nv) if nv != 0 else None
            if rp is not None and rn is not None and rp > threshold and rn > threshold:
                continue
        keep.append((e, v))
    return keep


@given(panels)
@settings(max_examples=8, deadline=None)
def test_spike_filter_matches_naive(spark, panel):
    rows = [(k, e, v) for k, s in panel.items() for e, v in _dedupe(s)]
    df = spark.createDataFrame(rows, "indexes long, epoch long, apr double")
    got = {
        (r.indexes, r.epoch) for r in spike_filter(df, threshold=0.10).collect()
    }
    want = {
        (k, e)
        for k, s in panel.items()
        for e, _ in naive_spike_filter(_dedupe(s))
    }
    assert got == want


# --- MinHash signatures ---------------------------------------------------


def naive_minhash(text):
    toks = re.split(r"\s+", text.strip().lower())
    shingles = {
        " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
    } - {""}
    if not shingles:
        return None
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles]
    return tuple(
        min((_MH_A[j] * h + _MH_B[j]) % MINHASH_PRIME for h in hs)
        for j in range(MINHASH_PERMS)
    )


@given(docs_strategy)
@settings(max_examples=8, deadline=None)
def test_minhash_signatures_match_naive(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: tuple(r[f"mh_{j}"] for j in range(MINHASH_PERMS))
        for r in minhash_signatures(df).collect()
    }
    want = {
        i: naive_minhash(t)
        for i, t in enumerate(texts)
        if naive_minhash(t) is not None
    }
    assert got == want


# --- J9 as-of / interval assignment ---------------------------------------

events_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=3),  # key
    st.dictionaries(  # block -> value (unique blocks per key)
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=100, max_value=105),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=3,
)


@given(events_strategy, st.integers(min_value=0, max_value=10), st.integers(min_value=0, max_value=15))
@settings(max_examples=8, deadline=None)
def test_interval_assignment_matches_naive(spark, evs, t0, span):
    from stakehouse_etl_spark.operators.joins import (
        assign_intervals_to_timeline,
        intervals_from_events,
    )

    t1 = t0 + span
    rows = [(k, b, v) for k, bs in evs.items() for b, v in bs.items()]
    df = spark.createDataFrame(rows, "bls_key long, block_number long, to_index long")
    out = assign_intervals_to_timeline(
        intervals_from_events(df), timeline_start=t0, timeline_end=t1
    )
    got = {(r.bls_key, r.epoch): r.to_index for r in out.collect()}

    want = {}
    for k, bs in evs.items():
        changes = sorted(bs.items())
        for t in range(t0, t1 + 1):
            in_force = [v for b, v in changes if b <= t]
            if in_force:
                want[(k, t)] = in_force[-1]
    assert got == want


asof_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=12),  # left times
    st.dictionaries(  # right: time -> value, unique times
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=99),
        min_size=1,
        max_size=8,
    ),
)


@given(st.dictionaries(st.integers(min_value=0, max_value=2), asof_strategy, min_size=1, max_size=3),
       st.sampled_from(["backward", "forward"]))
@settings(max_examples=8, deadline=None)
def test_asof_join_matches_naive(spark, panel, direction):
    from stakehouse_etl_spark.operators.joins import asof_join

    lrows = [(k, t, i) for k, (lts, _) in panel.items() for i, t in enumerate(lts)]
    rrows = [(k, t, v) for k, (_, rs) in panel.items() for t, v in rs.items()]
    left = spark.createDataFrame(lrows, "k long, lt long, lid long")
    right = spark.createDataFrame(rrows, "k long, rt long, val long")
    out = asof_join(left, right, key="k", left_time="lt", right_time="rt",
                    direction=direction)
    got = {(r.k, r.lid): r.val for r in out.collect()}

    want = {}
    for k, (lts, rs) in panel.items():
        for i, t in enumerate(lts):
            if direction == "backward":
                cand = [(rt, v) for rt, v in rs.items() if rt <= t]
                want[(k, i)] = max(cand)[1] if cand else None
            else:
                cand = [(rt, v) for rt, v in rs.items() if rt >= t]
                want[(k, i)] = min(cand)[1] if cand else None
    assert got == want


# --- round-2 operator properties -----------------------------------------

_url_chars = st.text(
    alphabet="abcXYZ019-._~/?&=#: %",
    min_size=0,
    max_size=30,
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["http", "https", "HTTPS", "ftp"]),
            st.sampled_from(["Ex.com", "WWW.ex.com", "ex.com:443", "ex.com:8080"]),
            _url_chars,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_url_normalize_idempotent(spark, urls):
    """normalize(normalize(u)) == normalize(u) — canonical forms are
    fixed points (the property that makes the output a join key)."""
    from stakehouse_etl_spark.operators.text import url_normalize

    rows = [(f"{s}://{h}/{t}",) for s, h, t in urls]
    df = spark.createDataFrame(rows, "url string")
    once = df.select(url_normalize(F.col("url")).alias("u1"))
    twice = once.select("u1", url_normalize(F.col("u1")).alias("u2"))
    for r in twice.collect():
        assert r.u2 == r.u1, (r.u1, r.u2)


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=4),       # key
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1000),   # t (deduped below)
                st.integers(min_value=-100, max_value=100),  # v
            ),
            min_size=1,
            max_size=60,
        ),
        min_size=1,
        max_size=3,
    ),
    st.integers(min_value=2, max_value=8),  # n_chunks
)
def test_skew_cumsum_matches_python(spark, panel, n_chunks):
    """Chunked running total == naive per-key Python prefix sum for any
    chunk count (including chunks larger than the data)."""
    from stakehouse_etl_spark.operators.windows import skew_resistant_cumsum

    rows = []
    for k, pts in panel.items():
        seen = {}
        for t, v in pts:
            seen[t] = v  # unique t per key
        rows.extend((str(k), t, v) for t, v in seen.items())
    df = spark.createDataFrame(rows, "k string, t long, v long")
    got = {
        (r.k, r.t): r.cum
        for r in skew_resistant_cumsum(
            df, "k", "t", "v", "cum", n_chunks=n_chunks
        ).collect()
    }
    for k, pts in panel.items():
        seen = dict(pts)
        acc = 0
        for t in sorted(seen):
            acc += seen[t]
            assert got[(str(k), t)] == acc


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=0, max_size=120),
    st.integers(min_value=2, max_value=12),   # chunk_tokens
    st.integers(min_value=0, max_value=6),    # overlap (< chunk_tokens enforced)
)
def test_chunk_docs_invariants(spark, lens, chunk_tokens, overlap):
    """Every token covered exactly once per its positions; consecutive
    chunks overlap by exactly `overlap`; reassembling non-overlap
    spans reconstructs the document."""
    from stakehouse_etl_spark.operators.text import chunk_docs

    overlap = min(overlap, chunk_tokens - 1)
    n = len(lens)
    text = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        (r.chunk_idx, r.token_start, r.chunk_text.split() if r.chunk_text else [])
        for r in chunk_docs(df, chunk_tokens=chunk_tokens, overlap=overlap).collect()
    )
    toks = text.split()
    stride = chunk_tokens - overlap
    for idx, start, body in chunks:
        assert start == idx * stride
        assert body == toks[start : start + chunk_tokens]
    covered = set()
    for _, start, body in chunks:
        covered.update(range(start, start + len(body)))
    assert covered == set(range(len(toks)))
