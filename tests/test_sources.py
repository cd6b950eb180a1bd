"""io/sources.py contracts.

``table_num_rows`` feeds input-scaled sizing decisions (partition
counts for near-unique-key aggs, guard bounds); ADVICE r8 found it
silently returned 0 for the partitioned (subdirectory) layout the
module docstring promises loaders accept — collapsing every sizing
decision to its 32-partition minimum, the exact sf30 hash-agg spill
the sizing was added to fix.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stakehouse_etl_spark.io.sources import table_num_rows, table_num_rows_or


def _write_chunk(path: str, n: int) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({"x": list(range(n))}), path)


def test_num_rows_single_file(tmp_path):
    _write_chunk(str(tmp_path / "t.parquet"), 7)
    assert table_num_rows(str(tmp_path), "t") == 7


def test_num_rows_flat_directory(tmp_path):
    d = tmp_path / "t"
    _write_chunk(str(d / "part-0.parquet"), 3)
    _write_chunk(str(d / "part-1.parquet"), 4)
    assert table_num_rows(str(tmp_path), "t") == 7


def test_num_rows_partitioned_layout(tmp_path):
    # The time-bucket subdirectory layout: footers live one (or more)
    # levels down. The pre-fix walk summed only top-level files → 0.
    d = tmp_path / "t"
    _write_chunk(str(d / "bucket=1" / "part-0.parquet"), 5)
    _write_chunk(str(d / "bucket=2" / "part-0.parquet"), 6)
    _write_chunk(str(d / "bucket=2" / "part-1.parquet"), 2)
    assert table_num_rows(str(tmp_path), "t") == 13


def test_num_rows_refuses_footerless_directory(tmp_path):
    # Returning 0 rows for a sizing decision is never right — an empty
    # or wrongly-pathed directory must raise, not minimize partitions.
    d = tmp_path / "t"
    os.makedirs(d / "empty_sub")
    with open(d / "README.txt", "w") as f:
        f.write("no parquet here")
    with pytest.raises(FileNotFoundError):
        table_num_rows(str(tmp_path), "t")
    shutil.rmtree(d)
    with pytest.raises(FileNotFoundError):
        table_num_rows(str(tmp_path), "t")


def test_num_rows_or_degrades_not_crashes(tmp_path):
    # Sizing call sites use the sized-or-default form (ADVICE r9:
    # pipeline41 crashed on footerless layouts while pipeline3 fell
    # back — the helper makes the hardening uniform).
    assert table_num_rows_or(str(tmp_path), "missing", 0) == 0
    _write_chunk(str(tmp_path / "t.parquet"), 7)
    assert table_num_rows_or(str(tmp_path), "t", 0) == 7
