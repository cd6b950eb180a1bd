"""Empirical scale-ladder evidence.

Two ladders:

1. Shipped rungs (/root/testdata/sf0.001..0.1): 100× end-to-end, but
   the top rung is still scheduler-dominated (~1 s fixed cost per
   query — BASELINE.md).
2. Local rungs (localdata/sf0.1, sf1, sf3 — `tools/gen_testdata.py`,
   same generator and seeds across rungs): the DATA-DOMINATED regime
   the 100 TB design claims live in. Growth ratios are only
   meaningful within one generator, so `r10_local` compares
   localdata/sf1 against localdata/sf0.1 (10× data) and `r3_local`
   sf3 against sf1 (3× data); the shipped sf0.1 column doubles as a
   cross-generator sanity anchor (near-equal times on the two sf0.1
   rungs ⇒ the generated data is a fair stand-in).

A query whose local ratio is at or below the data ratio scales
linearly-or-better here (per-core throughput constant as partitions
fill); one whose ratio exceeds the data ratio is superlinear — the
one to investigate before believing any 1000-executor claim.

Usage: python tools/scaling.py [--bench | query ...]
  --bench runs every bench-flagged catalog query.
Env knobs:
  SPARK_GRAFT_SCALING_RUNS   cells are BEST-of-N (default 2) — NOT
                             single-shot; single-shot local cells are
                             bimodal (±70% swing with GC phase), so
                             best-of-N compares plans, not noise.
                             Pre-r5 SCALING artifacts were single-shot
                             and read systematically higher.
  SPARK_GRAFT_SCALING_FRESH=1 one SUBPROCESS (fresh JVM) per
                             (rung, query) cell. The shared-session
                             mode inherits heap residue from heavy
                             predecessors — measured r8: the sf30
                             corpus_drop_ledger cell OOM'd the shared
                             8 g JVM after five sf10 cells, yet runs
                             in 98 s (flat vs sf10!) in a fresh
                             session. Mandatory for the sf10/sf30
                             rungs; the page cache still carries the
                             rung warm-read across processes.
  SPARK_GRAFT_SCALING_SF10=1 adds the localdata/sf10 rung (minutes per
                             query — opt-in).
  SPARK_GRAFT_SCALING_SF30=1 adds the localdata/sf30 rung (~6 GB,
                             3x sf10 — the r8 heavy-tier decade).
  SPARK_GRAFT_SCALING_RUNGS  comma list (e.g. "sf3,sf10") restricting
                             to named rungs for a top-rung-only pass.
Prints one JSON line {"queries": {name: {rung: sec, ...,
"r10_local": r, "r3_local": r, "r3.3_local": r}}, "rungs": [...]}
(r3.3_local appears when the sf10 rung ran; one measurement hazard to
know: cells run in ONE session inherit heap residue from heavy
predecessors — re-measure suspicious cells in a fresh session).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stakehouse_etl_spark.queries.catalog import QUERIES  # noqa: E402
from stakehouse_etl_spark.caches import release_tracked  # noqa: E402
from stakehouse_etl_spark.session import get_spark  # noqa: E402

SHIPPED = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
LOCAL = [
    os.path.join(REPO, "localdata", d) for d in ("sf0.1", "sf1", "sf3")
]
# sf10/sf30 are opt-in (SPARK_GRAFT_SCALING_SF10=1 / _SF30=1): the top
# rungs cost minutes per query and not every ladder refresh needs them.
if os.environ.get("SPARK_GRAFT_SCALING_SF10") == "1":
    LOCAL.append(os.path.join(REPO, "localdata", "sf10"))
if os.environ.get("SPARK_GRAFT_SCALING_SF30") == "1":
    LOCAL.append(os.path.join(REPO, "localdata", "sf30"))
# Multi-file twin of sf10 (VERDICT r10 stretch #8): same rows, each
# table as 64 parquet files — the 100 TB shape, where fan_out's
# metadata fast path passes scans through untouched instead of the
# single-file repartition fallback. Generate with
# `python tools/gen_testdata.py 10 --files=64`.
if os.environ.get("SPARK_GRAFT_SCALING_SF10X64") == "1":
    LOCAL.append(os.path.join(REPO, "localdata", "sf10x64"))
# Zipf rungs (VERDICT r9 task 4): the non-saturated skewed-text corpus
# — 10k-type Zipf vocabulary that grows its gram space with size — for
# ladders whose uniform-corpus cells are confounded by vocabulary
# saturation (the span family). Select via SPARK_GRAFT_SCALING_RUNGS
# with the local_zipf_sf* keys.
if os.environ.get("SPARK_GRAFT_SCALING_ZIPF") == "1":
    for _z in ("zipf_sf1", "zipf_sf3", "zipf_sf10"):
        LOCAL.append(os.path.join(REPO, "localdata", _z))

DEFAULT = [
    "w1_user_income",
    "j3_order_lineitem_agg",
    "a1_pricing_summary",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "pipeline_corpus_clean",
    "tpch_q3_shipping_priority",
    "text_bm25_topk",
]


# One (rung, query) cell in its own Python + JVM: best-of-N inside the
# process (so JVM/codegen warmup is excluded by the min, same as the
# shared-session mode), result on the last stdout line.
_CELL_SNIPPET = """
import json, sys, time
sys.path.insert(0, sys.argv[4])
from stakehouse_etl_spark.session import get_spark
from stakehouse_etl_spark.caches import release_tracked
from stakehouse_etl_spark.queries.catalog import QUERIES
spark = get_spark("scaling_cell")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
name, sf_dir, n_runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
best = None
for _ in range(n_runs):
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
    release_tracked()
    spark.catalog.clearCache()
print("CELL_RESULT " + json.dumps({"best": best}))
"""


def _cell_fresh(name: str, sf_dir: str, n_runs: int) -> float:
    import subprocess

    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            _CELL_SNIPPET,
            name,
            sf_dir,
            str(n_runs),
            REPO,
        ],
        capture_output=True,
        text=True,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("CELL_RESULT "):
            return float(json.loads(line[len("CELL_RESULT "):])["best"])
    raise RuntimeError(
        f"fresh cell {name} @ {sf_dir} failed "
        f"(exit {proc.returncode}): {proc.stderr[-500:]}"
    )


def main(argv: list[str]) -> int:
    if argv and argv[0] == "--bench":
        names = [n for n, q in QUERIES.items() if q.bench]
    else:
        names = argv or DEFAULT
    rungs = SHIPPED + [d for d in LOCAL if os.path.isdir(d)]
    # SPARK_GRAFT_SCALING_RUNGS=sf3,sf10 restricts to named rungs so a
    # top-rung-only refresh doesn't re-pay the full ladder.
    only = os.environ.get("SPARK_GRAFT_SCALING_RUNGS")
    if only:
        keep = {r.strip() for r in only.split(",")}
        # Match on the disambiguated output key (local_sf0.1 vs sf0.1),
        # not the basename — shipped and localdata rungs share the
        # basename "sf0.1", and a bare basename filter ran both
        # (ADVICE r5). A bare "sf0.1" still selects only the shipped
        # rung; the local twin needs the explicit "local_sf0.1".
        def _key(d: str) -> str:
            return ("local_" if d.startswith(REPO) else "") + os.path.basename(d)

        rungs = [d for d in rungs if _key(d) in keep]
    fresh = os.environ.get("SPARK_GRAFT_SCALING_FRESH") == "1"
    # Fresh mode exists to isolate each cell's heap; keeping a shared
    # full-heap outer JVM alive alongside each cell subprocess would
    # mean two heaps coexist and can OOM the constrained boxes the
    # mode targets (ADVICE r8) — so the shared session is only created
    # for in-process mode, and fresh mode warms the page cache with
    # plain file reads.
    spark = None
    if not fresh:
        spark = get_spark("scaling")
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict[str, float]] = {}
    for sf_dir in rungs:
        key = ("local_" if sf_dir.startswith(REPO) else "") + os.path.basename(
            sf_dir
        )
        # warm the page cache per rung so rung-to-rung ratios compare
        # compute, not cold reads. In fresh mode there is no outer
        # JVM — plain sequential file reads touch the same pages.
        import glob

        for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            try:
                if spark is None:
                    paths = (
                        [p]
                        if os.path.isfile(p)
                        else [
                            os.path.join(r, fn)
                            for r, _d, fs in os.walk(p)
                            for fn in fs
                            if fn.endswith(".parquet")
                        ]
                    )
                    for fp in paths:
                        with open(fp, "rb") as fh:
                            while fh.read(1 << 22):
                                pass
                else:
                    spark.read.parquet(p).count()
            except Exception:
                pass
        # Best-of-N cells (SPARK_GRAFT_SCALING_RUNS, default 2):
        # single-shot timings at the local rungs are bimodal — the
        # same query in the same session swings ±70% with GC phase and
        # box load (measured r5: capped-prefix sf1 24.0 s then 14.5 s
        # back-to-back). The MIN is the stable compute-bound estimate;
        # growth ratios computed from mins compare plans, not noise.
        n_runs = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "2")))
        fresh = os.environ.get("SPARK_GRAFT_SCALING_FRESH") == "1"
        for name in names:
            q = QUERIES[name]
            if fresh:
                print(
                    f"[scaling] {key} {name} (fresh JVM, best of "
                    f"{n_runs})",
                    file=sys.stderr,
                    flush=True,
                )
                # One cell's failure must not discard the completed
                # cells of a 45-minute ladder (r9: an sf30 cell died
                # after 7 green cells and the whole run's results were
                # lost — the JSON printed only at the end). Record the
                # error in the row, log the result incrementally, and
                # keep going.
                try:
                    best = _cell_fresh(name, sf_dir, n_runs)
                except RuntimeError as e:
                    out.setdefault(name, {})[f"{key}_error"] = str(e)[-300:]
                    print(
                        f"[scaling] RESULT {key} {name} FAILED: "
                        f"{str(e)[-300:]}",
                        file=sys.stderr,
                        flush=True,
                    )
                    continue
                out.setdefault(name, {})[key] = round(best, 3)
                print(
                    f"[scaling] RESULT {key} {name} {round(best, 3)}",
                    file=sys.stderr,
                    flush=True,
                )
                continue
            best = None
            for run_i in range(n_runs):
                print(
                    f"[scaling] {key} {name} run {run_i + 1}/{n_runs}",
                    file=sys.stderr,
                    flush=True,
                )
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
                release_tracked()
                spark.catalog.clearCache()
            out.setdefault(name, {})[key] = round(best, 3)
    for name, row in out.items():
        if row.get("sf0.01") and row.get("sf0.1"):
            row["ratio_10x"] = round(row["sf0.1"] / row["sf0.01"], 2)
        if row.get("local_sf0.1") and row.get("local_sf1"):
            row["r10_local"] = round(row["local_sf1"] / row["local_sf0.1"], 2)
        if row.get("local_sf1") and row.get("local_sf3"):
            row["r3_local"] = round(row["local_sf3"] / row["local_sf1"], 2)
        if row.get("local_sf3") and row.get("local_sf10"):
            # 3.33x data step; at-or-below 3.33 is linear-or-better
            row["r3.3_local"] = round(row["local_sf10"] / row["local_sf3"], 2)
        if row.get("local_sf10") and row.get("local_sf30"):
            # 3x data step at the ~6 GB rung (r8: one more decade on
            # the heavy tier); at-or-below 3 is linear-or-better
            row["r3_local_30"] = round(
                row["local_sf30"] / row["local_sf10"], 2
            )
    print(json.dumps({"queries": out, "rungs": rungs}))
    if spark is not None:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
