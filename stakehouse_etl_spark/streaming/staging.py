"""File-source staging for the foreachBatch test loops.

The streaming corpus-maintenance queries (``stream_incremental_dedup``,
``stream_span_scrub``, ``stream_snapshot_publish``, …) feed Structured
Streaming's file source from a staged directory of single-file parquet
chunks — one file per intended micro-batch, mtime-ordered so
``maxFilesPerTrigger=1`` replays them in batch order. Review r8: two
queries carried this ~25-line scaffold verbatim; any fix to the
batching scheme (cut-edge handling, file ordering) had to be applied
twice. It lives here once.

The batch count defaults to 3 (the DuckDB oracles unroll exactly 3
greedy stages); ``SPARK_GRAFT_STREAM_BATCHES`` exists for the
long-horizon fuzz harness only (tools/stream_fuzz.py --batches,
VERDICT r7 task 2) — the correctness gates always run the default.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_batch_count(default: int = 3) -> int:
    """The micro-batch count for the staged file source."""
    return int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", str(default)))


def stage_id_range_batches(
    df: DataFrame,
    workdir: str,
    id_col: str = "doc_id",
    n_batches: int | None = None,
) -> str:
    """Land ``df`` as ``n_batches`` mtime-ordered single-file parquet
    chunks under ``workdir/src`` and return that source directory.

    Chunk ``i`` holds the rows whose ``id_col`` falls in the i-th
    id-range tercile (half-open ``(lo, hi]`` cuts at ``mx * i // n``),
    matching the oracle's batch_no CASE. Files are named ``<i>.parquet``
    with strictly increasing mtimes so the file source's
    ``maxFilesPerTrigger=1`` + latestFirst=false default replays them
    as batches 0..n-1 in order.
    """
    n_b = n_batches if n_batches is not None else stream_batch_count()
    if n_b < 1:
        raise ValueError(
            f"stage_id_range_batches: n_batches must be >= 1, got {n_b} "
            f"(check SPARK_GRAFT_STREAM_BATCHES)"
        )
    mx = df.agg(F.max(id_col)).collect()[0][0]
    if mx is None:
        raise ValueError(
            f"stage_id_range_batches: input has no rows (max({id_col}) is "
            f"NULL) — nothing to stage under {workdir!r}"
        )
    cuts = [mx * i // n_b for i in range(1, n_b)]
    edges = [None] + cuts + [None]
    src = os.path.join(workdir, "src")
    # Idempotent re-stage (r10 crash-resume): a restarted run reusing
    # the same workdir must see the IDENTICAL already-staged source —
    # chunk content is a deterministic function of (df, n_b), so a
    # COMPLETED prior staging with the same parameters is that
    # function's output and restaging would only disturb the mtime
    # order the file source already checkpointed against. Presence of
    # chunk files alone is not enough (ADVICE r10): a resume with a
    # different SPARK_GRAFT_STREAM_BATCHES would silently reuse (or
    # rewrite under checkpointed paths) chunks cut at different id
    # ranges, and a file torn mid-copy passes a presence check. The
    # manifest is written LAST, so its presence certifies a completed
    # staging and records the parameters it was cut with.
    manifest = os.path.join(src, "_staging_manifest.json")
    params = {"n_batches": n_b, "id_col": id_col, "max_id": int(mx)}
    if os.path.isdir(src):
        if os.path.exists(manifest):
            with open(manifest) as fh:
                staged = json.load(fh)
            if staged == params:
                return src
            raise RuntimeError(
                f"stage_id_range_batches: {src} was staged with {staged} "
                f"but this run wants {params}; restaging over a source a "
                "checkpoint may have processed would make resumed output "
                "inconsistent — use a fresh workdir (or the original "
                "SPARK_GRAFT_STREAM_BATCHES) instead"
            )
        # No manifest: the prior staging never completed, so no stream
        # (and no checkpoint) ever read it — safe to rebuild cleanly.
        shutil.rmtree(src)
    os.makedirs(src, exist_ok=True)
    for i in range(1, n_b + 1):
        lo, hi = edges[i - 1], edges[i]
        chunk = df
        if lo is not None:
            chunk = chunk.filter(F.col(id_col) > lo)
        if hi is not None:
            chunk = chunk.filter(F.col(id_col) <= hi)
        tmp = os.path.join(workdir, f"chunk{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, f"{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    # Written last: certifies completion. The leading underscore keeps
    # Spark's file listing (and therefore the streaming file source)
    # from treating it as data.
    with open(manifest, "w") as fh:
        json.dump(params, fh)
    return src
