"""Serving under concurrent refresh (VERDICT r6 task #5).

`tools/loadtest.py` measured the serving path IDLE; the reference's
real regime is reads DURING the 6-min ingest cadence
(`reference/serverless.yaml:119,163` — the API handlers and the
income/APR ingest handlers are SEPARATE compute sharing one store).
This tool reproduces that architecture: the r3 soak loop (S1→W1→J3
through the real staged-rename sinks) runs as a separate WRITER
process (its own 16-thread SparkSession) while the parent READER
session (16 threads, FAIR mode) hammers the same bucketed income
warehouse from N threads — so the only coupling is the storage
layer, which is exactly what the staged-rename isolation claim is
about. Contracts verified:

- zero torn reads, two probes per read: (a) a duplicate (bls_key,
  epoch) group — old+new file visible at once; (b) a row-count DIP
  vs any earlier read by the same thread — rows only grow across
  soak cycles, so a dip means a partition vanished mid-swap;
- zero UNRECOVERED read failures: a path table is list-then-open, so
  a listing that predates a partition swap can FNF (measured —
  tests/test_sinks_scale.py pins both this and the retry contract);
  the immediate re-read re-lists and must succeed. `retried_reads`
  counts the transient window hits; lock-free readers belong on the
  versioned snapshot sink (`write_snapshot`/`read_snapshot`);
- read latency: p95 under concurrent refresh vs the idle p95
  measured immediately after on the same warehouse, same session.

Earlier single-JVM variant (writer thread + readers in ONE session,
32 threads): 0 torn / 0 errors / 12-15 transient retries, but p95
degraded to ~3× idle from driver-side contention (one Catalyst, one
py4j gateway, one GIL) — evidence for separating serving compute,
not against the sink.

Usage: python tools/loadtest_concurrent.py [sf_dir] [readers] [cycles]
Prints ONE JSON line (recorded in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from stakehouse_etl_spark.session import get_spark  # noqa: E402

_WRITER_SCRIPT = """
import os, sys
sys.path.insert(0, sys.argv[4])
from pyspark.sql import functions as F
from stakehouse_etl_spark.io.sinks import write_snapshot
from stakehouse_etl_spark.queries.soak import _hourly_balances, run_soak_cycles
from stakehouse_etl_spark.session import get_spark
sf_dir, warehouse, n_cycles = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark("refresh_writer", master="local[16]",
                  shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
income_path = os.path.join(warehouse, "income")
serve_path = os.path.join(warehouse, "serve")

# The reference's serving architecture: each ingest cycle PUBLISHES the
# aggregated serve table (leaderboard) as an immutable snapshot version
# — the analog of its transactional MySQL serve store. Readers on the
# snapshot path never see a rename window.
def publish(i, wall, census):
    top = (spark.read.parquet(income_path)
           .groupBy("bls_key")
           .agg(F.max_by("earnings", "epoch").alias("earnings")))
    write_snapshot(spark, top, serve_path)

run_soak_cycles(spark, _hourly_balances(spark, sf_dir), warehouse,
                n_cycles=n_cycles, cycle_hook=publish).count()
spark.stop()
"""

# Control arm: the same compute footprint (16-thread Spark JVM doing
# shuffle-heavy work) with ZERO warehouse writes — separates "reads
# slow down because the box is half-busy" from "reads slow down
# because of the sink's renames".
_BURNER_SCRIPT = """
import sys, time
sys.path.insert(0, sys.argv[2])
from stakehouse_etl_spark.session import get_spark
spark = get_spark("cpu_burner", master="local[16]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
deadline = time.time() + float(sys.argv[1])
while time.time() < deadline:
    (spark.range(0, 30_000_000)
         .selectExpr("id % 97 AS k", "id AS v")
         .groupBy("k").sum("v").count())
spark.stop()
"""


def _pct(xs: list[float], p: float) -> float:
    if not xs:
        return 0.0
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p * (len(xs) - 1))))]


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    n_readers = int(argv[1]) if len(argv) > 1 else 4
    n_cycles = int(argv[2]) if len(argv) > 2 else 10

    spark = get_spark(
        "loadtest_reader",
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    warehouse = tempfile.mkdtemp(prefix="serve_refresh_")
    income_path = os.path.join(warehouse, "income")

    proc = subprocess.Popen(
        [
            sys.executable,
            "-c",
            _WRITER_SCRIPT,
            sf_dir,
            warehouse,
            str(n_cycles),
            REPO,
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE,
    )

    lock = threading.Lock()
    lat: list[float] = []
    errors: list[str] = []
    torn_dup = 0
    dips = 0
    retried = 0
    n_reads = 0

    def one_read() -> tuple[int, int]:
        """(total_rows, n_dup_groups) of the income warehouse — the
        leaderboard read plus the torn-read probes in one pass."""
        grouped = (
            spark.read.parquet(income_path)
            .groupBy("bls_key", "epoch")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        row = grouped.agg(
            F.sum("n").alias("rows"),
            F.sum((F.col("n") > 1).cast("int")).alias("dups"),
        ).collect()[0]
        return int(row["rows"] or 0), int(row["dups"] or 0)

    def reader() -> None:
        nonlocal torn_dup, dips, retried, n_reads
        local_max = 0
        while proc.poll() is None:
            if not os.path.isdir(income_path):
                time.sleep(0.05)
                continue
            t0 = time.perf_counter()
            try:
                rows, dup = one_read()
            except Exception:
                # Path-table contract (tests/test_sinks_scale.py): a
                # listing that predates a partition swap can FNF; the
                # immediate re-read re-lists and MUST succeed. Only an
                # unrecovered failure counts against the gate.
                with lock:
                    retried += 1
                try:
                    rows, dup = one_read()
                except Exception as e:
                    with lock:
                        errors.append(f"{type(e).__name__}: {e}")
                    continue
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)
                n_reads += 1
                if dup:
                    torn_dup += 1
                if rows < local_max:
                    dips += 1
                local_max = max(local_max, rows)

    # Snapshot-serving arm: half the read load goes to the published
    # serve table through read_snapshot — the lock-free path. Zero
    # retries and zero errors are HARD contracts here (immutable
    # version dirs; readers resolve the max committed version).
    from stakehouse_etl_spark.io.sinks import read_snapshot

    serve_path = os.path.join(warehouse, "serve")
    snap_lat: list[float] = []
    snap_errors: list[str] = []
    snap_reads = 0

    def snap_reader() -> None:
        nonlocal snap_reads
        while proc.poll() is None:
            if not os.path.isdir(serve_path):
                time.sleep(0.05)
                continue
            t0 = time.perf_counter()
            try:
                read_snapshot(spark, serve_path).count()
            except FileNotFoundError:
                time.sleep(0.05)  # no committed version yet
                continue
            except Exception as e:
                with lock:
                    snap_errors.append(f"{type(e).__name__}: {e}")
                continue
            with lock:
                snap_lat.append(time.perf_counter() - t0)
                snap_reads += 1

    rts = [threading.Thread(target=reader) for _ in range(n_readers)]
    rts += [threading.Thread(target=snap_reader) for _ in range(2)]
    t_start = time.perf_counter()
    for r in rts:
        r.start()
    _, werr = proc.communicate()
    for r in rts:
        r.join()
    wall = time.perf_counter() - t_start
    writer_err = []
    if proc.returncode != 0:
        writer_err.append(
            f"writer exit {proc.returncode}: "
            f"{(werr or b'').decode(errors='replace')[-500:]}"
        )

    # Control arm: reads while a write-free CPU burner occupies the
    # writer's exact compute footprint. If these latencies match the
    # concurrent-refresh ones, the inflation is CPU sharing, not the
    # sink's renames.
    loaded: list[float] = []
    burner = subprocess.Popen(
        [sys.executable, "-c", _BURNER_SCRIPT, "20", REPO],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    time.sleep(6.0)  # let the burner JVM warm up and start burning
    try:
        while burner.poll() is None and len(loaded) < 40:
            t0 = time.perf_counter()
            try:
                one_read()
            except Exception:
                continue
            loaded.append(time.perf_counter() - t0)
    finally:
        burner.wait()

    # Idle baseline: same read, same session/warehouse, writer gone.
    # Guarded: if the writer died before the first staged rename the
    # warehouse may not exist — the tool must still print its JSON
    # line and clean up (review r7).
    idle: list[float] = []
    idle_err: str | None = None
    for _ in range(20):
        t0 = time.perf_counter()
        try:
            one_read()
        except Exception as e:
            idle_err = f"{type(e).__name__}: {e}"
            break
        idle.append(time.perf_counter() - t0)

    out = {
        "metric": "serving_under_refresh",
        "sf_dir": sf_dir,
        "readers": n_readers,
        "cycles": n_cycles,
        "wall_sec": round(wall, 2),
        "reads": n_reads,
        "retried_reads": retried,
        "read_errors": len(errors),
        "error_samples": errors[:3],
        "torn_dup_reads": torn_dup,
        "row_count_dips": dips,
        "writer_err": writer_err,
        "p50_ms": round(_pct(lat, 0.5) * 1000, 1),
        "p95_ms": round(_pct(lat, 0.95) * 1000, 1),
        "cpu_loaded_p50_ms": round(_pct(loaded, 0.5) * 1000, 1),
        "cpu_loaded_p95_ms": round(_pct(loaded, 0.95) * 1000, 1),
        "idle_p50_ms": round(_pct(idle, 0.5) * 1000, 1),
        "idle_p95_ms": round(_pct(idle, 0.95) * 1000, 1),
        "idle_err": idle_err,
        "p95_vs_idle": round(_pct(lat, 0.95) / _pct(idle, 0.95), 2)
        if idle and _pct(idle, 0.95) > 0
        else None,
        "p95_vs_cpu_loaded": round(
            _pct(lat, 0.95) / _pct(loaded, 0.95), 2
        )
        if loaded and _pct(loaded, 0.95) > 0
        else None,
        "snapshot_reads": snap_reads,
        "snapshot_read_errors": len(snap_errors),
        "snapshot_error_samples": snap_errors[:3],
        "snapshot_p50_ms": round(_pct(snap_lat, 0.5) * 1000, 1),
        "snapshot_p95_ms": round(_pct(snap_lat, 0.95) * 1000, 1),
    }
    print(json.dumps(out))
    shutil.rmtree(warehouse, ignore_errors=True)
    spark.stop()
    ok = (
        not errors
        and not torn_dup
        and not dips
        and not writer_err
        and not snap_errors
        and idle_err is None
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
