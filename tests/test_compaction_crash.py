"""Crash windows of the tiered index compactions (ADVICE r10).

``_compact_plain_index`` (queries/datapipe.py) folds positive
pre-batch generations into one ``bno=-b`` run. The r10 torn-state
merge path deleted the committed target before renaming its
replacement in — a second crash in that window lost rows whose
positive generations the first torn run had already dropped. The fix
renames the target ASIDE, renames the merge in, then drops the aside,
and sweeps orphaned sibling tmp dirs at entry. These tests drive each
crash window directly on a tiny on-disk index and assert the folded
content is always the union of what was committed.

``_compact_gram_index`` (queries/pipeline75.py) keeps its fold tmp
under the run's workdir; the early-return retry guard used to leak
tmp dirs from prior torn folds — pinned here via the entry sweep.
"""

from __future__ import annotations

import os
import shutil

import pytest

from stakehouse_etl_spark.queries.datapipe import _compact_plain_index


def _mk_index(spark, root, generations):
    """Write {bno: [ids]} as a partition-discovery parquet index."""
    idx = os.path.join(root, "index")
    os.makedirs(idx, exist_ok=True)
    for bno, ids in generations.items():
        spark.createDataFrame(
            [(i,) for i in ids], "doc_id long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(idx, f"bno={bno}")
        )
    return idx


def _ids(spark, idx):
    return {
        r.doc_id for r in spark.read.parquet(idx).select("doc_id").collect()
    }


def _runs(idx):
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(idx)
        if d.startswith("bno=")
    )


def test_normal_fold(spark, tmp_path):
    idx = _mk_index(spark, str(tmp_path), {1: [1, 2], 2: [3], 3: [4]})
    _compact_plain_index(spark, idx, 3)
    # positives 1,2 folded into -3; generation 3 (the current batch)
    # untouched
    assert _runs(idx) == [-3, 3]
    assert _ids(spark, idx) == {1, 2, 3, 4}


def test_retry_after_positives_dropped_keeps_superset(spark, tmp_path):
    # First execution completed fully; the retried batch re-runs
    # compaction with the same bno_cur — no positives remain, the
    # committed -3 run must be kept as-is.
    idx = _mk_index(spark, str(tmp_path), {1: [1, 2], 2: [3], 3: [4]})
    _compact_plain_index(spark, idx, 3)
    _compact_plain_index(spark, idx, 3)
    assert _runs(idx) == [-3, 3]
    assert _ids(spark, idx) == {1, 2, 3, 4}


def test_torn_target_with_surviving_positives_merges(spark, tmp_path):
    # Crash after the target landed but before the positives were
    # deleted: retry must merge target + positives, losing nothing.
    idx = _mk_index(
        spark, str(tmp_path), {-3: [1, 2], 1: [1, 2], 2: [3], 3: [4]}
    )
    _compact_plain_index(spark, idx, 3)
    assert _runs(idx) == [-3, 3]
    assert _ids(spark, idx) == {1, 2, 3, 4}


def test_crash_between_aside_and_rename_recovers_from_merge(spark, tmp_path):
    # The exact double-crash window ADVICE r10 flagged: the merge tmp
    # is fully written and the committed target was moved aside, then
    # the process died before the merge was renamed in. Rows 1,2 exist
    # ONLY in the orphans (their positive generations are gone). The
    # entry sweep must rename the merge in, not resynthesize from the
    # surviving positives.
    root = str(tmp_path)
    idx = _mk_index(spark, root, {2: [3], 3: [4]})
    # orphan merge tmp: full intended content of -3 (old target 1,2 + fold 3)
    spark.createDataFrame(
        [(1,), (2,), (3,)], "doc_id long"
    ).coalesce(1).write.parquet(idx + ".merge_3")
    # orphan aside: the pre-merge -3 target content
    spark.createDataFrame([(1,), (2,)], "doc_id long").coalesce(
        1
    ).write.parquet(idx + ".old_3")
    _compact_plain_index(spark, idx, 3)
    assert _ids(spark, idx) == {1, 2, 3, 4}
    assert not os.path.exists(idx + ".merge_3")
    assert not os.path.exists(idx + ".old_3")


def test_crash_after_rename_drops_subset_aside(spark, tmp_path):
    # Crash between the rename-in and the aside cleanup: target holds
    # the merged superset, the aside is a stale subset — swept.
    root = str(tmp_path)
    idx = _mk_index(spark, root, {-3: [1, 2, 3], 2: [3], 3: [4]})
    spark.createDataFrame([(1,), (2,)], "doc_id long").coalesce(
        1
    ).write.parquet(idx + ".old_3")
    _compact_plain_index(spark, idx, 3)
    assert _ids(spark, idx) == {1, 2, 3, 4}
    assert not os.path.exists(idx + ".old_3")


def test_stale_compact_tmp_swept(spark, tmp_path):
    # Crash before the fold committed: comp_tmp orphan is derivable
    # from the still-present positives — swept, then refolded.
    idx = _mk_index(spark, str(tmp_path), {1: [1, 2], 2: [3], 3: [4]})
    spark.createDataFrame([(1,), (2,), (3,)], "doc_id long").coalesce(
        1
    ).write.parquet(idx + ".compact_3")
    _compact_plain_index(spark, idx, 3)
    assert _runs(idx) == [-3, 3]
    assert _ids(spark, idx) == {1, 2, 3, 4}
    assert not os.path.exists(idx + ".compact_3")


def test_gram_index_stale_fold_tmp_swept(spark, tmp_path):
    """pipeline75._compact_gram_index entry sweep: a fold tmp left by
    a prior torn run must not accumulate across retry cycles."""
    from stakehouse_etl_spark.queries.pipeline75 import _compact_gram_index

    workdir = str(tmp_path / "wd")
    os.makedirs(os.path.join(workdir, "compact_8"))
    os.makedirs(os.path.join(workdir, "compact_16"))
    tbl = "t_gram_sweep"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    loc = os.path.join(workdir, "idx_tbl")
    spark.createDataFrame(
        [("g1", 0), ("g2", 1)], "gram string, bid int"
    ).write.partitionBy("bid").option("path", loc).saveAsTable(tbl)
    try:
        _compact_gram_index(spark, tbl, 16, workdir)
        # both stale dirs (bid <= bno0) swept; the fold itself landed
        assert not os.path.exists(os.path.join(workdir, "compact_8"))
        assert not os.path.exists(os.path.join(workdir, "compact_16"))
        grams = {
            r.gram for r in spark.table(tbl).select("gram").collect()
        }
        assert grams == {"g1", "g2"}
        bids = {r.bid for r in spark.table(tbl).select("bid").collect()}
        assert bids == {-16}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
