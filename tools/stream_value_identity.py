"""Long-horizon value identity for tiered index compaction
(VERDICT r10 task 6).

r10's 40-batch STREAMFUZZ runs compared per-batch WALLS; value
identity of compaction-on vs compaction-off was proved only at the
12-batch horizon. This tool closes that gap: run
``stream_incremental_dedup`` at the given rung and horizon twice —
tiered compaction at its shipped cadence (every 8 batches) and
compaction OFF — and compare the kept row SETS (doc_id, batch_no)
exactly via order-insensitive sha256. At 40 batches the cadence fires
5 fold events (bno 8/16/24/32/40), including folds OF folded state,
so a compaction bug that silently drops or duplicates index rows
would change which later-batch docs get deduped and flip the hash.

Usage: python tools/stream_value_identity.py [sf_dir] [n_batches]
  defaults: localdata/sf10, 40. Prints ONE JSON line; exit 1 on
  mismatch.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _run(sf_dir: str, n_batches: int, compact_every: int) -> tuple[str, int, float]:
    """One child-process run; returns (hash, n_rows, wall_s)."""
    import subprocess
    import tempfile

    out_file = tempfile.mktemp(suffix=".json")
    env = dict(
        os.environ,
        SPARK_GRAFT_STREAM_BATCHES=str(n_batches),
        SPARK_GRAFT_DEDUP_COMPACT_EVERY=str(compact_every),
        _VI_OUT=out_file,
    )
    t0 = time.perf_counter()
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", sf_dir],
        env=env,
        capture_output=True,
        text=True,
    )
    wall = round(time.perf_counter() - t0, 1)
    if p.returncode != 0:
        raise RuntimeError(f"child failed: {p.stderr[-800:]}")
    with open(out_file) as fh:
        rec = json.load(fh)
    os.remove(out_file)
    return rec["hash"], rec["rows"], wall


def _child(sf_dir: str) -> int:
    from stakehouse_etl_spark.queries.catalog import QUERIES
    from stakehouse_etl_spark.session import get_spark

    spark = get_spark("stream_value_identity_child")
    spark.sparkContext.setLogLevel("ERROR")
    rows = QUERIES["stream_incremental_dedup"].fn(spark, sf_dir).collect()
    canon = sorted((int(r.doc_id), int(r.batch_no)) for r in rows)
    h = hashlib.sha256(
        "\n".join(f"{d},{b}" for d, b in canon).encode()
    ).hexdigest()
    with open(os.environ["_VI_OUT"], "w") as fh:
        json.dump({"hash": h, "rows": len(canon)}, fh)
    spark.stop()
    return 0


def main(argv: list[str]) -> int:
    if argv and argv[0] == "--child":
        return _child(argv[1])
    sf_dir = argv[0] if argv else os.path.join(REPO, "localdata", "sf10")
    n_batches = int(argv[1]) if len(argv) > 1 else 40
    rec: dict = {
        "protocol": (
            f"VERDICT r10 task 6: stream_incremental_dedup at "
            f"{os.path.basename(sf_dir)}/{n_batches} batches, tiered "
            f"compaction every 8 (5 fold events incl. folds of folded "
            f"state at 40 batches) vs compaction OFF; kept row sets "
            f"(doc_id, batch_no) must hash-identical."
        ),
        "sf_dir": sf_dir,
        "n_batches": n_batches,
    }
    h_on, n_on, w_on = _run(sf_dir, n_batches, compact_every=8)
    h_off, n_off, w_off = _run(sf_dir, n_batches, compact_every=0)
    rec.update(
        {
            "compaction_on": {"hash": h_on, "rows": n_on, "wall_s": w_on},
            "compaction_off": {"hash": h_off, "rows": n_off, "wall_s": w_off},
            "hash_identical": h_on == h_off,
            "rows_identical": n_on == n_off,
        }
    )
    rec["pass"] = rec["hash_identical"] and rec["rows_identical"]
    print(json.dumps(rec))
    return 0 if rec["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
