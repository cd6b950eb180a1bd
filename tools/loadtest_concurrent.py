"""Serving under concurrent refresh (VERDICT r6 task #5).

`tools/loadtest.py` measured the serving path IDLE; the reference's
real regime is reads DURING the 6-min ingest cadence
(`reference/serverless.yaml:119,163` — the API handlers serve while
the income/APR handlers upsert). This tool runs the r3 soak loop
(S1→W1→J3 through the real staged-rename sinks) as the WRITER while
N reader threads hammer the same bucketed income warehouse with the
leaderboard read, in one FAIR-scheduler session, and verifies the
sink's snapshot-isolation contract under readers:

- zero failed reads (a reader never observes a half-renamed
  partition dir: the sink parks the old leaf at .__undo__ and renames
  the staged leaf in — an FNF here would be the torn window);
- zero torn reads, detected two ways: (a) a duplicate (bls_key,
  epoch) group — old+new file visible at once; (b) a row-count DIP
  vs any earlier read — rows only ever grow across soak cycles, so a
  dip means a reader saw a partition mid-swap;
- read latency: p95 under concurrent refresh within 2× of the idle
  p95 measured immediately after on the same warehouse.

Usage: python tools/loadtest_concurrent.py [sf_dir] [readers] [cycles]
Prints ONE JSON line (recorded in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from stakehouse_etl_spark.queries.soak import (  # noqa: E402
    _hourly_balances,
    run_soak_cycles,
)
from stakehouse_etl_spark.session import get_spark  # noqa: E402


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
        "loadtest_concurrent", extra_conf={"spark.scheduler.mode": "FAIR"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    warehouse = tempfile.mkdtemp(prefix="serve_refresh_")
    income_path = os.path.join(warehouse, "income")
    balances = _hourly_balances(spark, sf_dir)

    writer_done = threading.Event()
    writer_err: list[str] = []

    def writer() -> None:
        try:
            run_soak_cycles(
                spark, balances, warehouse, n_cycles=n_cycles
            ).count()
        except Exception as e:  # surfaced in the JSON
            writer_err.append(f"{type(e).__name__}: {e}")
        finally:
            writer_done.set()

    lock = threading.Lock()
    lat: list[float] = []
    errors: list[str] = []
    torn_dup = 0
    dips = 0
    max_rows_seen = 0
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
        nonlocal torn_dup, dips, max_rows_seen, n_reads
        local_max = 0
        while not writer_done.is_set():
            if not os.path.isdir(income_path):
                time.sleep(0.05)
                continue
            t0 = time.perf_counter()
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
                max_rows_seen = max(max_rows_seen, rows)

    wt = threading.Thread(target=writer)
    rts = [threading.Thread(target=reader) for _ in range(n_readers)]
    t_start = time.perf_counter()
    wt.start()
    for r in rts:
        r.start()
    wt.join()
    for r in rts:
        r.join()
    wall = time.perf_counter() - t_start

    # Idle baseline: same read, same warehouse, nothing writing.
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
        "read_errors": len(errors),
        "error_samples": errors[:3],
        "torn_dup_reads": torn_dup,
        "row_count_dips": dips,
        "writer_err": writer_err,
        "p50_ms": round(_pct(lat, 0.5) * 1000, 1),
        "p95_ms": round(_pct(lat, 0.95) * 1000, 1),
        "idle_p50_ms": round(_pct(idle, 0.5) * 1000, 1),
        "idle_p95_ms": round(_pct(idle, 0.95) * 1000, 1),
        "idle_err": idle_err,
        "p95_vs_idle": round(
            _pct(lat, 0.95) / _pct(idle, 0.95), 2
        )
        if idle and _pct(idle, 0.95) > 0
        else None,
    }
    print(json.dumps(out))
    shutil.rmtree(warehouse, ignore_errors=True)
    spark.stop()
    ok = (
        not errors
        and not torn_dup
        and not dips
        and not writer_err
        and idle_err is None
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
