"""Kill/resume exercise for the restartable corpus export (VERDICT r8
task 5).

The ``pipeline_corpus_export_landed`` twin lands every stage as
parquet with Spark's ``_SUCCESS`` commit markers; the resume contract
(tests/test_pipeline77.py pins it at sf0.01) says a re-run with
``resume=True`` recomputes only from the first stage without a marker
and the final ledger is value-identical to a single-shot run. This
tool exercises that contract AT SCALE:

1. run the landed ladder with an injected crash after stage N
   (``fail_after=N`` — raises immediately after the N-th stage's
   parquet commit, the worst-case driver death);
2. record the mtimes of every landed ``_SUCCESS`` marker;
3. re-run with ``resume=True`` in the SAME scratch dir, collecting
   which stages actually recomputed;
4. assert stages 1..N kept their marker mtimes (not rewritten), the
   resumed run recomputed ONLY stages > N, and the resumed ledger's
   order-insensitive sha256 equals a clean single-shot reference run.

Usage: python tools/export_resume.py [sf_dir] [fail_after]
  default sf_dir localdata/sf10, fail_after 4. Prints ONE JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402

from stakehouse_etl_spark.caches import release_tracked  # noqa: E402
from stakehouse_etl_spark.queries.pipeline77 import (  # noqa: E402
    _export_ledger,
    _land_stage_factory,
)
from stakehouse_etl_spark.session import get_spark  # noqa: E402


def _ledger_hash(df) -> str:
    """Order-insensitive sha256 over the stringified, column-sorted,
    row-sorted pandas frame — the same canonical shape the driver
    hashes."""
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return hashlib.sha256(
        pdf.to_csv(index=False).encode()
    ).hexdigest()


def _success_mtimes(base: str) -> dict[str, float]:
    out = {}
    for name in sorted(os.listdir(base)):
        marker = os.path.join(base, name, "_SUCCESS")
        if os.path.exists(marker):
            out[name] = os.path.getmtime(marker)
    return out


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else os.path.join(REPO, "localdata", "sf10")
    fail_after = int(argv[1]) if len(argv) > 1 else 4

    spark = get_spark("export_resume")
    spark.sparkContext.setLogLevel("ERROR")

    # Reference: clean single-shot landed run in its own scratch dir.
    ref_dir = tempfile.mkdtemp(prefix="export_resume_ref_")
    t0 = time.perf_counter()
    ref_hash = _ledger_hash(
        _export_ledger(spark, sf_dir, _land_stage_factory(ref_dir))
    )
    t_ref = round(time.perf_counter() - t0, 1)
    shutil.rmtree(ref_dir, ignore_errors=True)
    release_tracked()
    spark.catalog.clearCache()

    # Crash run: die right after the fail_after-th stage commit.
    workdir = tempfile.mkdtemp(prefix="export_resume_")
    wrote_first: list[str] = []
    t0 = time.perf_counter()
    crashed = False
    try:
        _export_ledger(
            spark,
            sf_dir,
            _land_stage_factory(
                workdir, fail_after=fail_after, written=wrote_first
            ),
        ).collect()
    except RuntimeError as e:
        crashed = "injected crash" in str(e)
    t_crash = round(time.perf_counter() - t0, 1)
    release_tracked()
    spark.catalog.clearCache()
    pre = _success_mtimes(workdir)

    # Resume run: same dir, resume=True.
    wrote_resume: list[str] = []
    t0 = time.perf_counter()
    led = _export_ledger(
        spark,
        sf_dir,
        _land_stage_factory(workdir, resume=True, written=wrote_resume),
    )
    resumed_hash = _ledger_hash(led)
    t_resume = round(time.perf_counter() - t0, 1)
    post = _success_mtimes(workdir)

    surviving = sorted(pre)
    recomputed_survivors = [
        s for s in surviving if s in wrote_resume or post[s] != pre[s]
    ]
    record = {
        "metric": "export_resume_sf_ladder",
        "sf_dir": sf_dir,
        "fail_after": fail_after,
        "crash_injected": crashed,
        "stages_landed_before_crash": wrote_first,
        "stages_recomputed_on_resume": wrote_resume,
        "survivor_stages": surviving,
        "survivors_recomputed": recomputed_survivors,
        "ledger_hash_matches_single_shot": resumed_hash == ref_hash,
        "ref_hash": ref_hash[:16],
        "resumed_hash": resumed_hash[:16],
        "wall_ref_sec": t_ref,
        "wall_crash_sec": t_crash,
        "wall_resume_sec": t_resume,
    }
    ok = (
        crashed
        and not recomputed_survivors
        and resumed_hash == ref_hash
        and len(wrote_first) == fail_after
    )
    record["ok"] = ok
    print(json.dumps(record))
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
