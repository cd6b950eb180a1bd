"""Local testdata generator for the scale ladder (VERDICT r2 task 2).

The driver ships sf0.001/0.01/0.1 under /root/testdata (read-only, no
generator source). To measure a DATA-DOMINATED rung — where per-query
time stops being ~1 s of fixed scheduler overhead — we need sf1+,
which this script synthesizes locally with the same schemas, key
relationships, and distribution shapes as the shipped tables
(measured in-repo via DuckDB: row-count ratios per SF, value ranges,
category weights, join fan-outs, dup rates).

Methodology note: growth RATIOS are only meaningful within one
generator. tools/scaling.py therefore compares rungs generated HERE
(localdata/sf0.1 vs localdata/sf1 [vs sf3]) and reports the shipped
sf0.1 timing alongside as a cross-generator sanity anchor.

Usage: python tools/gen_testdata.py SF [outdir]
  e.g. python tools/gen_testdata.py 1        -> localdata/sf1/
       python tools/gen_testdata.py 0.1      -> localdata/sf0.1/

Deterministic: numpy PCG64 seeded per (table, sf). Vectorized
generation + single-file parquet per table (matches the shipped
layout; Spark splits single files by row-group, so local[32] still
parallelizes scans).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
PADJ = ["large", "hot", "blue", "old", "new", "red", "small", "shiny"]
PNOUN = ["ring", "bolt", "plate", "case", "cap", "disk", "bar", "tube"]
# The shipped documents draw from a ~31-word engine vocabulary.
VOCAB = (
    "spark batch part line column order small sort fast value scan hash "
    "slow group query table vector agg stream filter big merge the key "
    "window join customer a g topk index"
).split()

DAY_US = 86_400_000_000


def _rng(table: str, sf: float) -> np.random.Generator:
    # zlib.crc32, NOT hash(): str hashing is salted per interpreter
    # run (PYTHONHASHSEED), crc32 is stable -> reproducible datasets.
    import zlib

    return np.random.default_rng(
        zlib.crc32(f"{table}:{round(sf * 1000)}:42".encode())
    )


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))



# How many row groups a big table should carry. MEASUREMENT HAZARD
# (r10 zipf ladder, fixed r11): a parquet byte-range split only
# produces rows when a ROW-GROUP start falls inside it, so the old
# fixed row_group_size=200_000 gave single-file rungs 1–3 row groups
# and every CPU-heavy pipeline ran at parallelism 1–3/32 — the ladder
# measured parallelism, not plans. Target well above local[32] so
# scans parallelize like the many-file 100 TB shape; floor keeps tiny
# tables from degenerating into per-row groups.
_TARGET_ROW_GROUPS = 64
_MIN_ROW_GROUP = 4096


def _n_files() -> int:
    """--files N: write each table as a DIRECTORY of N parquet files
    (the multi-file 100 TB shape — exercises fan_out's metadata
    pass-through instead of the repartition fallback)."""
    return int(os.environ.get("_GEN_N_FILES", "1"))


def _write(outdir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    rg = max(_MIN_ROW_GROUP, -(-table.num_rows // _TARGET_ROW_GROUPS))
    n_files = _n_files()
    if n_files > 1 and table.num_rows >= n_files * _MIN_ROW_GROUP:
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        per = -(-table.num_rows // n_files)
        for i in range(n_files):
            chunk = table.slice(i * per, per)
            if chunk.num_rows == 0:
                break
            pq.write_table(
                chunk,
                os.path.join(path, f"part-{i:05d}.parquet"),
                row_group_size=max(_MIN_ROW_GROUP, -(-chunk.num_rows // 2)),
            )
        print(
            f"  {name}: {table.num_rows} rows -> {path} "
            f"({n_files} files)"
        )
        return
    pq.write_table(table, path, row_group_size=rg)
    print(f"  {name}: {table.num_rows} rows -> {path} (rg={rg})")


def gen(sf: float, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    r = _rng("customer", sf)
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(r.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(r.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[r.integers(0, 5, n_cust)]),
    }))

    r = _rng("supplier", sf)
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(r.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(r.uniform(-1000, 10000, n_supp), 2),
    }))

    r = _rng("part", sf)
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{PADJ[i % 8]} {PNOUN[(i // 8) % 8]}" for i in range(n_part)
        ],
        "p_brand": [f"Brand#{int(b)}" for b in r.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(PTYPES)[r.integers(0, len(PTYPES), n_part)]),
        "p_size": pa.array(r.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1 % 1100, 2),
    }))

    r = _rng("orders", sf)
    odate_lo = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    odate_hi = np.datetime64("2001-08-02").astype("datetime64[us]").astype(np.int64)
    odays = r.integers(0, (odate_hi - odate_lo) // DAY_US, n_ord)
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(r.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[r.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(r.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_col(odate_lo + odays * DAY_US),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[r.integers(0, 5, n_ord)]),
    }))

    r = _rng("lineitem", sf)
    # per-order line counts 1..7 (mean ~4, matching the shipped ~4.07
    # fan-out); l_linenumber 1..k per order.
    counts = r.integers(1, 8, n_ord)
    okeys = np.repeat(np.arange(n_ord), counts)
    n_li = okeys.size
    # vectorized within-order line numbers (a per-order Python loop is
    # minutes at sf10): position minus the order's start offset + 1
    starts = np.concatenate(([0], np.cumsum(counts)[:-1])) if n_ord else np.array([], np.int64)
    linenos = (np.arange(n_li) - np.repeat(starts, counts) + 1) if n_ord else np.array([], np.int64)
    sdate_lo = np.datetime64("1995-01-02").astype("datetime64[us]").astype(np.int64)
    sdate_hi = np.datetime64("2001-11-05").astype("datetime64[us]").astype(np.int64)
    sdays = r.integers(0, (sdate_hi - sdate_lo) // DAY_US, n_li)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(r.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(r.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenos, pa.int32()),
        "l_quantity": r.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(r.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(r.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(r.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(RETURNFLAGS)[r.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(LINESTATUSES)[r.integers(0, 2, n_li)]),
        "l_shipdate": _ts_col(sdate_lo + sdays * DAY_US),
    }))

    r = _rng("events", sf)
    ts_lo = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span = 30 * DAY_US
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": _ts_col(ts_lo + r.integers(0, span, n_events)),
        "user_id": pa.array(r.integers(0, n_users, n_events), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[r.integers(0, 5, n_events)]),
        "value": np.round(r.exponential(50.0, n_events), 2),
        "props": [f'{{"k": {int(k)}}}' for k in r.integers(0, 100, n_events)],
    }))

    r = _rng("documents", sf)
    vocab = np.array(VOCAB)
    lens = r.integers(8, 101, n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        texts.append(" ".join(vocab[r.integers(0, len(vocab), lens[i])]))
    # exact dups ~0.2% + near-dups ~1% (single-token mutation of an
    # earlier doc) so the dedup tiers have real work at every rung.
    for i in range(n_docs):
        u = r.random()
        if i > 10 and u < 0.002:
            texts[i] = texts[int(r.integers(0, i))]
        elif i > 10 and u < 0.012:
            toks = texts[int(r.integers(0, i))].split()
            toks[int(r.integers(0, len(toks)))] = str(vocab[int(r.integers(0, len(vocab)))])
            texts[i] = " ".join(toks)
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[r.choice(5, n_docs, p=LANG_W)]),
        "source": [f"src{int(x)}" for x in r.integers(0, 20, n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    r = _rng("embeddings", sf)
    dim, n_lab = 64, 10
    cents = r.normal(0, 1, (n_lab, dim))
    labels = r.integers(0, n_lab, n_emb)
    vecs = cents[labels] + r.normal(0, 0.35, (n_emb, dim))
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            list(vecs.astype(np.float32)), pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


def gen_zipf_documents(sf: float, outdir: str) -> None:
    """Skewed-text arm (VERDICT r8 task 8): a ``documents`` table whose
    token/shingle distributions look like real web text instead of the
    uniform 31-word engine vocabulary — Zipf rank-frequency over a
    10k-type vocabulary (s≈1.05, the published English slope) and
    lognormal doc lengths (median ~60 tokens, heavy right tail). Hot
    shingles are exactly what the prefix filter's df-ordering and the
    LSH hot-bucket caps guard against; the uniform corpus never
    exercises them. Same schema and the same 0.2% exact / 1% near-dup
    injection as ``gen`` so the dedup ladder runs unchanged.
    """
    os.makedirs(outdir, exist_ok=True)
    n_docs = int(50_000 * sf)
    r = _rng("zipf_documents", sf)
    v = 10_000
    # Explicit normalized Zipf over a FIXED vocab (np's r.zipf is
    # unbounded); ranks 1..v, p(rank) ∝ rank^-1.05.
    ranks = np.arange(1, v + 1, dtype=np.float64)
    p = ranks ** -1.05
    p /= p.sum()
    vocab = np.array([f"w{i:05d}" for i in range(v)])
    # Lognormal lengths: median exp(4.1)≈60 tokens, σ=0.8 → p99 ≈ 390.
    lens = np.clip(
        r.lognormal(4.1, 0.8, n_docs).astype(np.int64), 8, 2000
    )
    # Web-style boilerplate: 5 fixed 30-token templates (cookie
    # banners, footers). 15% of docs carry one as a prefix; 2% are
    # TEMPLATE-ONLY (template + <=3 random tokens) — the tight
    # near-dup clusters (error pages, stub pages) that actually
    # create hot LSH band buckets and hot grams. Token skew alone
    # does not (measured: max band bucket 3 on both the uniform and
    # the plain-Zipf corpus at sf1).
    templates = [
        " ".join(vocab[r.choice(v, 30, p=p)]) for _ in range(5)
    ]
    texts: list[str] = []
    for i in range(n_docs):
        u = r.random()
        body = " ".join(vocab[r.choice(v, lens[i], p=p)])
        if u < 0.02:
            tail = " ".join(vocab[r.choice(v, int(r.integers(0, 4)), p=p)])
            texts.append(
                (templates[int(r.integers(0, 5))] + " " + tail).strip()
            )
        elif u < 0.17:
            texts.append(templates[int(r.integers(0, 5))] + " " + body)
        else:
            texts.append(body)
    for i in range(n_docs):
        u = r.random()
        if i > 10 and u < 0.002:
            texts[i] = texts[int(r.integers(0, i))]
        elif i > 10 and u < 0.012:
            toks = texts[int(r.integers(0, i))].split()
            toks[int(r.integers(0, len(toks)))] = str(
                vocab[int(r.choice(v, p=p))]
            )
            texts[i] = " ".join(toks)
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[r.choice(5, n_docs, p=LANG_W)]),
        "source": [f"src{int(x)}" for x in r.integers(0, 20, n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def main(argv: list[str]) -> int:
    zipf = "--zipf" in argv
    argv = [a for a in argv if a != "--zipf"]
    n_files = 1
    for a in list(argv):
        if a.startswith("--files="):
            n_files = int(a.split("=", 1)[1])
            argv.remove(a)
    os.environ["_GEN_N_FILES"] = str(n_files)
    sf = float(argv[0]) if argv else 1.0
    sfname = ("zipf_" if zipf else "") + f"sf{sf:g}" + (
        f"x{n_files}" if n_files > 1 else ""
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = argv[1] if len(argv) > 1 else os.path.join(repo, "localdata", sfname)
    print(f"generating {sfname} -> {outdir}")
    if zipf:
        gen_zipf_documents(sf, outdir)
    else:
        gen(sf, outdir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
