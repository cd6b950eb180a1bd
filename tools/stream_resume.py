"""Kill/resume exercise for the foreachBatch streaming loops
(VERDICT r9 task 6).

The export ladder has crash evidence (EXPORTRESUME_r09); the streaming
loops' dynamic-partition-overwrite retry path was claimed but never
exercised under a real process death. This tool kills
``stream_span_scrub_bucketed`` MID-BATCH at sf10 — an injected raise
inside batch K after the scrubbed-output write but before the index
landing, i.e. the torn state — in a CHILD PROCESS (real JVM death),
then restarts a fresh child on the same workdir. The fresh session
re-registers the surviving bucketed index table
(``_ensure_gram_table`` — the local stand-in for a persistent
metastore) and the file-source checkpoint replays batch K.

Asserts:
1. the crash child dies with the injected error after committing
   exactly K batches (checkpoint commit log);
2. the resume child starts from batch K (commit log grows K → N,
   batches 0..K-1 are NOT re-executed);
3. the resumed run's final output is hash-identical (order-insensitive
   sha256, driver-canonical shape) to an uninterrupted reference run.

r11 extension (VERDICT r10 task 5): ``--arm plain`` runs the same
exercise on the PLAIN incremental-dedup loop
(``incremental_dedup_run``), whose torn states differ — band + set
index generations plus the tiered compaction folds of
``_compact_plain_index``. Three kill scenarios, each hash-compared to
one uninterrupted reference run:

1. ``mid_batch``   — raise after the kept-ids write, before the index
   landings (batch 6 of 12);
2. ``compact_post_commit`` — env-injected raise inside the bno-8
   compaction fold AFTER the folded run committed but BEFORE the
   positive generations were deleted (the torn state the merge path
   exists for);
3. ``compact_double_crash`` — scenario 2's crash, then the RESUME is
   itself killed between the target's rename-aside and the merged
   run's rename-in (the window where folded content exists only in
   the ``.merge_`` sibling — the ADVICE r10 data-loss window), then a
   third clean resume must recover via the entry orphan sweep.

Usage: python tools/stream_resume.py [--arm plain|span] [sf_dir]
         [n_batches] [fail_batch]
  defaults: span, localdata/sf10, 12, 6. Prints ONE JSON line.
Child mode (internal):
  --child <workdir> <tbl> <sf_dir> [fail_batch]          (span arm)
  --child-plain <workdir> <sf_dir> [fail_batch]          (plain arm)
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _out_hash(out_dir: str) -> str:
    """Order-insensitive sha256 over the scrubbed output, canonicalized
    the way the driver does (column-name sort, stringify, row sort)."""
    import duckdb

    pdf = duckdb.sql(
        f"SELECT doc_id, n_tokens, n_kept, n_scrubbed, cleaned_fp, batch_no "
        f"FROM read_parquet('{out_dir}/*/*.parquet')"
    ).df()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()


def _n_commits(workdir: str) -> int:
    d = os.path.join(workdir, "ckpt", "commits")
    if not os.path.isdir(d):
        return 0
    return len([f for f in os.listdir(d) if not f.startswith(".")])


def _child(argv: list[str]) -> int:
    workdir, tbl, sf_dir = argv[0], argv[1], argv[2]
    fail = int(argv[3]) if len(argv) > 3 else None
    from stakehouse_etl_spark.queries.pipeline75 import (
        span_scrub_bucketed_run,
    )
    from stakehouse_etl_spark.session import get_spark

    spark = get_spark("stream_resume_child")
    spark.sparkContext.setLogLevel("ERROR")
    out = span_scrub_bucketed_run(
        spark, sf_dir, workdir, tbl, fail_mid_batch=fail
    )
    out.count()  # materialize to prove readability before exit
    spark.stop()
    return 0


def _run_child(
    workdir: str, tbl: str, sf_dir: str, n_batches: int, fail: int | None
) -> subprocess.CompletedProcess:
    env = dict(os.environ, SPARK_GRAFT_STREAM_BATCHES=str(n_batches))
    cmd = [sys.executable, os.path.abspath(__file__), "--child", workdir, tbl, sf_dir]
    if fail is not None:
        cmd.append(str(fail))
    return subprocess.run(cmd, env=env, capture_output=True, text=True)


def _child_plain(argv: list[str]) -> int:
    workdir, sf_dir = argv[0], argv[1]
    fail = int(argv[2]) if len(argv) > 2 else None
    from stakehouse_etl_spark.queries.datapipe import incremental_dedup_run
    from stakehouse_etl_spark.session import get_spark

    spark = get_spark("stream_resume_plain_child")
    spark.sparkContext.setLogLevel("ERROR")
    out = incremental_dedup_run(spark, sf_dir, workdir, fail_mid_batch=fail)
    out.count()  # materialize to prove readability before exit
    spark.stop()
    return 0


def _run_plain_child(
    workdir: str,
    sf_dir: str,
    n_batches: int,
    fail: int | None = None,
    extra_env: dict | None = None,
) -> subprocess.CompletedProcess:
    env = dict(os.environ, SPARK_GRAFT_STREAM_BATCHES=str(n_batches))
    # The compaction fail-point envs leak into reference runs unless
    # explicitly cleared per child.
    env.pop("SPARK_GRAFT_COMPACT_FAIL_POINT", None)
    env.pop("SPARK_GRAFT_COMPACT_FAIL_BNO", None)
    env.update(extra_env or {})
    cmd = [sys.executable, os.path.abspath(__file__), "--child-plain", workdir, sf_dir]
    if fail is not None:
        cmd.append(str(fail))
    return subprocess.run(cmd, env=env, capture_output=True, text=True)


def _kept_hash(kept_dir: str) -> str:
    """Order-insensitive sha256 over the plain arm's kept output
    (doc_id, batch_no from the hive bno partition), driver-canonical."""
    import duckdb

    pdf = duckdb.sql(
        f"SELECT doc_id, CAST(bno AS INT) AS batch_no FROM "
        f"read_parquet('{kept_dir}/*/*.parquet', hive_partitioning=1)"
    ).df()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()


def _plain_suite(sf_dir: str, n_batches: int, fail_batch: int) -> int:
    compact_every = 8
    fold_bno = compact_every  # first fold event: bno 8 (batch_id 7)
    rec: dict = {
        "protocol": (
            f"VERDICT r10 task 5: kill the PLAIN incremental-dedup loop "
            f"(incremental_dedup_run, tiered compaction every "
            f"{compact_every}) in a child process at "
            f"{os.path.basename(sf_dir)}/{n_batches} batches; three kill "
            f"scenarios (mid-batch at batch {fail_batch}; inside the "
            f"bno-{fold_bno} compaction fold after the folded run "
            f"committed; double-crash where the resume dies between the "
            f"fold target's rename-aside and the merge's rename-in); each "
            f"resumed run's kept output must hash-identical to an "
            f"uninterrupted reference run."
        ),
        "sf_dir": sf_dir,
        "n_batches": n_batches,
        "scenarios": {},
    }

    # Reference: uninterrupted run.
    ref_dir = tempfile.mkdtemp(prefix="plain_resume_ref_")
    t0 = time.perf_counter()
    p = _run_plain_child(ref_dir, sf_dir, n_batches)
    rec["ref_wall_s"] = round(time.perf_counter() - t0, 1)
    if p.returncode != 0:
        print(json.dumps({"error": "ref run failed", "stderr": p.stderr[-800:]}))
        return 1
    ref_hash = _kept_hash(os.path.join(ref_dir, "kept"))
    rec["ref_hash"] = ref_hash
    rec["ref_commits"] = _n_commits(ref_dir)
    shutil.rmtree(ref_dir, ignore_errors=True)

    def finish(workdir: str, s: dict, crashes: list[int]) -> None:
        """Clean resume + checks shared by every scenario."""
        pre_mtimes = {
            b: os.path.getmtime(
                os.path.join(workdir, "kept", f"bno={b}", "_SUCCESS")
            )
            for b in range(1, min(crashes) + 1)
            if os.path.exists(
                os.path.join(workdir, "kept", f"bno={b}", "_SUCCESS")
            )
        }
        t0 = time.perf_counter()
        p = _run_plain_child(workdir, sf_dir, n_batches)
        s["resume_wall_s"] = round(time.perf_counter() - t0, 1)
        s["resume_exit"] = p.returncode
        s["commits_after_resume"] = _n_commits(workdir)
        if p.returncode != 0:
            s["resume_stderr"] = p.stderr[-800:]
            s["pass"] = False
            return
        s["resume_hash"] = _kept_hash(os.path.join(workdir, "kept"))
        post_mtimes = {
            b: os.path.getmtime(
                os.path.join(workdir, "kept", f"bno={b}", "_SUCCESS")
            )
            for b in pre_mtimes
        }
        s["survivor_batches_checked"] = len(pre_mtimes)
        # Sibling tmp dirs (fold orphans) must all be folded back in.
        leftovers = [
            n
            for n in os.listdir(workdir)
            for d in ("band_index", "set_index")
            if n.startswith(f"{d}.")
        ]
        s["orphan_tmp_dirs_after_resume"] = leftovers
        s["checks"] = {
            "crash_children_died_nonzero": all(c != 0 for c in crashes_exit),
            "injected_error_surfaced": s["crash_err_seen"],
            "resume_completed_all_batches": (
                s["commits_after_resume"] == n_batches
            ),
            "survivor_outputs_not_rewritten": pre_mtimes == post_mtimes,
            "no_orphan_fold_tmp_dirs": not leftovers,
            "hash_identical_to_uninterrupted": s["resume_hash"] == ref_hash,
        }
        s["pass"] = all(s["checks"].values())

    # --- scenario 1: mid-batch kill (output committed, index not) ---
    s: dict = {}
    workdir = tempfile.mkdtemp(prefix="plain_resume_mb_")
    p = _run_plain_child(workdir, sf_dir, n_batches, fail=fail_batch)
    s["crash_exit"] = p.returncode
    s["crash_err_seen"] = "injected mid-batch crash" in (p.stderr + p.stdout)
    s["commits_after_crash"] = _n_commits(workdir)
    crashes_exit = [p.returncode]
    finish(workdir, s, [fail_batch])
    shutil.rmtree(workdir, ignore_errors=True)
    rec["scenarios"]["mid_batch"] = s

    # --- scenario 2: kill inside the compaction fold (post-commit) ---
    s = {}
    workdir = tempfile.mkdtemp(prefix="plain_resume_cp_")
    p = _run_plain_child(
        workdir,
        sf_dir,
        n_batches,
        extra_env={
            "SPARK_GRAFT_COMPACT_FAIL_POINT": "post_commit",
            "SPARK_GRAFT_COMPACT_FAIL_BNO": str(fold_bno),
        },
    )
    s["crash_exit"] = p.returncode
    s["crash_err_seen"] = "injected compaction crash at post_commit" in (
        p.stderr + p.stdout
    )
    s["commits_after_crash"] = _n_commits(workdir)
    crashes_exit = [p.returncode]
    finish(workdir, s, [fold_bno - 1])
    shutil.rmtree(workdir, ignore_errors=True)
    rec["scenarios"]["compact_post_commit"] = s

    # --- scenario 3: double crash — fold post-commit, then the
    # resume's merge-path retry dies between its two renames (the
    # ADVICE r10 window where content exists only in `.merge_`) ---
    s = {}
    workdir = tempfile.mkdtemp(prefix="plain_resume_dc_")
    p1 = _run_plain_child(
        workdir,
        sf_dir,
        n_batches,
        extra_env={
            "SPARK_GRAFT_COMPACT_FAIL_POINT": "post_commit",
            "SPARK_GRAFT_COMPACT_FAIL_BNO": str(fold_bno),
        },
    )
    p2 = _run_plain_child(
        workdir,
        sf_dir,
        n_batches,
        extra_env={
            "SPARK_GRAFT_COMPACT_FAIL_POINT": "mid_merge",
            "SPARK_GRAFT_COMPACT_FAIL_BNO": str(fold_bno),
        },
    )
    s["crash_exits"] = [p1.returncode, p2.returncode]
    s["crash_err_seen"] = (
        "injected compaction crash at post_commit" in (p1.stderr + p1.stdout)
        and "injected compaction crash at mid_merge" in (p2.stderr + p2.stdout)
    )
    s["second_crash_reached_merge_window"] = (
        "mid_merge" in (p2.stderr + p2.stdout)
    )
    s["commits_after_crash"] = _n_commits(workdir)
    crashes_exit = [p1.returncode, p2.returncode]
    finish(workdir, s, [fold_bno - 1])
    shutil.rmtree(workdir, ignore_errors=True)
    rec["scenarios"]["compact_double_crash"] = s

    rec["pass"] = all(
        sc.get("pass") for sc in rec["scenarios"].values()
    )
    print(json.dumps(rec))
    return 0 if rec["pass"] else 1


def main(argv: list[str]) -> int:
    if argv and argv[0] == "--child":
        return _child(argv[1:])
    if argv and argv[0] == "--child-plain":
        return _child_plain(argv[1:])

    arm = "span"
    if argv and argv[0] == "--arm":
        arm = argv[1]
        argv = argv[2:]
    elif argv and argv[0].startswith("--arm="):
        arm = argv[0].split("=", 1)[1]
        argv = argv[1:]

    sf_dir = argv[0] if argv else os.path.join(REPO, "localdata", "sf10")
    n_batches = int(argv[1]) if len(argv) > 1 else 12
    fail_batch = int(argv[2]) if len(argv) > 2 else 6

    if arm == "plain":
        return _plain_suite(sf_dir, n_batches, fail_batch)

    rec: dict = {
        "protocol": (
            f"VERDICT r9 task 6: kill stream_span_scrub_bucketed mid-batch "
            f"(injected raise in batch {fail_batch} after the output write, "
            f"before the index landing) in a child process at "
            f"{os.path.basename(sf_dir)}/{n_batches} batches; restart a "
            f"fresh child on the same workdir (fresh catalog -> index table "
            f"re-registered from the landed location; file-source checkpoint "
            f"replays the torn batch); compare final output hash to an "
            f"uninterrupted reference run."
        ),
        "sf_dir": sf_dir,
        "n_batches": n_batches,
        "fail_batch": fail_batch,
    }

    # Reference: uninterrupted run.
    ref_dir = tempfile.mkdtemp(prefix="stream_resume_ref_")
    t0 = time.perf_counter()
    p = _run_child(ref_dir, "gram_idx_resume_ref", sf_dir, n_batches, None)
    rec["ref_wall_s"] = round(time.perf_counter() - t0, 1)
    if p.returncode != 0:
        print(json.dumps({"error": "ref run failed", "stderr": p.stderr[-800:]}))
        return 1
    rec["ref_hash"] = _out_hash(os.path.join(ref_dir, "out"))
    rec["ref_commits"] = _n_commits(ref_dir)
    shutil.rmtree(ref_dir, ignore_errors=True)

    # Crash run.
    workdir = tempfile.mkdtemp(prefix="stream_resume_")
    t0 = time.perf_counter()
    p = _run_child(workdir, "gram_idx_resume", sf_dir, n_batches, fail_batch)
    rec["crash_wall_s"] = round(time.perf_counter() - t0, 1)
    rec["crash_exit"] = p.returncode
    rec["crash_err_seen"] = "injected mid-batch crash" in (p.stderr + p.stdout)
    rec["commits_after_crash"] = _n_commits(workdir)

    # Survivor evidence: the committed batches' output markers must not
    # be rewritten by the resume (only the torn batch K replays).
    pre_mtimes = {
        b: os.path.getmtime(
            os.path.join(workdir, "out", f"bid={b}", "_SUCCESS")
        )
        for b in range(fail_batch)
        if os.path.exists(
            os.path.join(workdir, "out", f"bid={b}", "_SUCCESS")
        )
    }

    # Resume run: fresh process, same workdir, no injection.
    t0 = time.perf_counter()
    p = _run_child(workdir, "gram_idx_resume", sf_dir, n_batches, None)
    rec["resume_wall_s"] = round(time.perf_counter() - t0, 1)
    rec["resume_exit"] = p.returncode
    rec["commits_after_resume"] = _n_commits(workdir)
    if p.returncode != 0:
        rec["resume_stderr"] = p.stderr[-800:]
        print(json.dumps(rec))
        return 1
    rec["resume_hash"] = _out_hash(os.path.join(workdir, "out"))
    post_mtimes = {
        b: os.path.getmtime(
            os.path.join(workdir, "out", f"bid={b}", "_SUCCESS")
        )
        for b in pre_mtimes
    }
    rec["survivor_batches_checked"] = len(pre_mtimes)
    survivors_untouched = pre_mtimes == post_mtimes
    shutil.rmtree(workdir, ignore_errors=True)

    rec["checks"] = {
        "crash_child_died_nonzero": rec["crash_exit"] != 0,
        "injected_error_surfaced": rec["crash_err_seen"],
        "crash_committed_exactly_fail_batch": (
            rec["commits_after_crash"] == fail_batch
        ),
        "resume_started_from_torn_batch_not_zero": (
            rec["commits_after_resume"] == n_batches
        ),
        "survivor_outputs_not_rewritten": survivors_untouched,
        "hash_identical_to_uninterrupted": (
            rec.get("resume_hash") == rec["ref_hash"]
        ),
    }
    rec["pass"] = all(rec["checks"].values())
    print(json.dumps(rec))
    return 0 if rec["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
