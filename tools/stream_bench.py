"""Structured Streaming throughput measurement.

The catalog proves streaming CORRECTNESS (13+ topologies, each with a
batch/DuckDB oracle); this tool measures streaming THROUGHPUT — the
sustained rows/sec the windowed-aggregate topology processes from a
`rate` source (Spark's built-in load generator) through the engine's
standard watermark + event-time window + integer-cents aggregate, on
the same session config as the batch engine.

Method: a rate stream at ``rows_per_sec`` feeds the real
``windowed_event_aggregate`` (1-minute windows over synthetic
event-time derived from the rate timestamp, 5 event-type groups);
after a warm-up trigger we average ``processedRowsPerSecond`` over
the next N progress reports, and separately drain a bounded burst in
availableNow mode to get an ingest-bound rows/sec (how fast the
operator chews a backlog, which is the 100 TB-relevant number —
steady-state throughput is source-limited by design).

Usage: python tools/stream_bench.py [rows_per_sec] [n_reports]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from stakehouse_etl_spark.session import get_spark  # noqa: E402
from stakehouse_etl_spark.streaming.structured import (  # noqa: E402
    windowed_event_aggregate,
)


def _synthetic_events(stream):
    """rate rows -> the engine's event shape (ts, event_type, value)."""
    return stream.select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("t"), (F.col("value") % 5).cast("string")).alias(
            "event_type"
        ),
        (F.col("value") % 1000).cast("double").alias("value"),
    )


def main(argv: list[str]) -> int:
    rows_per_sec = int(argv[0]) if argv else 500_000
    n_reports = int(argv[1]) if len(argv) > 1 else 5
    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="stream_bench_")
    out: dict[str, float] = {"target_rows_per_sec": rows_per_sec}
    try:
        # 1) steady-state: rate-limited source, measure processed rate
        stream = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_sec)
            .option("numPartitions", 8)
            .load()
        )
        agg = windowed_event_aggregate(
            _synthetic_events(stream), window="1 minute", watermark="2 minutes"
        )
        q = (
            agg.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", os.path.join(workdir, "ck1"))
            .start()
        )
        rates: list[float] = []
        deadline = time.time() + 120
        while len(rates) < n_reports + 2 and time.time() < deadline:
            time.sleep(2)
            p = q.lastProgress
            if p and p.get("numInputRows", 0) > 0:
                r = p.get("processedRowsPerSecond")
                if r:
                    rates.append(r)
        q.stop()
        steady = rates[2:] or rates  # drop warm-up triggers
        out["steady_processed_rows_per_sec"] = round(
            sum(steady) / max(len(steady), 1)
        )
        out["n_progress_reports"] = len(steady)

        # 2) backlog drain: a real parquet backlog (20M rows) drained
        # in availableNow mode through the same topology — the
        # ingest-bound rows/sec (steady-state above is source-limited
        # by design; a 100 TB reprocess is backlog-shaped).
        n_burst = 20_000_000
        backlog_dir = os.path.join(workdir, "backlog")
        (
            spark.range(n_burst)
            .select(
                (
                    F.lit("2024-01-01 00:00:00").cast("timestamp")
                    + (F.col("id") % 3600).cast("int")
                    * F.expr("INTERVAL 1 SECOND")
                ).alias("ts"),
                F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
                    "event_type"
                ),
                (F.col("id") % 1000).cast("double").alias("value"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(backlog_dir)
        )
        burst = (
            spark.readStream.schema(
                "ts timestamp, event_type string, value double"
            )
            .parquet(backlog_dir)
        )
        agg2 = windowed_event_aggregate(
            burst, window="1 minute", watermark="2 minutes"
        )
        t0 = time.perf_counter()
        q2 = (
            agg2.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", os.path.join(workdir, "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(300)
        drain_s = time.perf_counter() - t0
        rows = sum(
            p["numInputRows"] for p in q2.recentProgress if p
        ) if q2.recentProgress else 0
        out["drain_rows"] = rows
        out["drain_wall_sec"] = round(drain_s, 2)
        out["drain_rows_per_sec"] = round(rows / drain_s) if drain_s else 0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
