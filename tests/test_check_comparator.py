"""Mutation tests for the oracle comparator (tools/check.py).

The whole correctness story rides on ``compare`` actually detecting
wrong answers — a comparator that vacuously passes would green-light
every query. Each test perturbs a correct result in one way a buggy
engine could and asserts the comparator flags it, plus the
equal-input no-flag baseline. Pure pandas; no Spark session.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check import compare  # noqa: E402


def _base() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "k": [1, 2, 3, 4],
            "name": ["a", "b", "c", "d"],
            "total": [10.5, np.nan, 0.25, -3.0],
            "n": pd.array([7, 0, 2, 9], dtype="int64"),
        }
    )


def test_identical_frames_pass():
    assert compare("q", _base(), _base()) == ""


def test_row_order_is_irrelevant():
    shuffled = _base().iloc[[2, 0, 3, 1]].reset_index(drop=True)
    assert compare("q", shuffled, _base()) == ""


def test_nan_equals_nan():
    assert compare("q", _base(), _base()) == ""
    b = _base()
    b.loc[1, "total"] = 99.0  # NaN vs value must NOT be equal
    assert "total" in compare("q", _base(), b)


def test_missing_row_flagged():
    assert "rowcount" in compare("q", _base().iloc[:3], _base())


def test_extra_row_flagged():
    extra = pd.concat([_base(), _base().iloc[[0]]], ignore_index=True)
    assert "rowcount" in compare("q", extra, _base())


def test_renamed_column_flagged():
    rn = _base().rename(columns={"total": "sum_total"})
    assert "columns" in compare("q", rn, _base())


def test_single_value_diff_flagged():
    b = _base()
    b.loc[2, "n"] = 3
    msg = compare("q", _base(), b)
    assert "col n" in msg


def test_tiny_float_drift_flagged():
    # The driver hashes values — 1e-13 drift is a real failure, not
    # tolerance noise. The comparator must be exact.
    b = _base()
    b.loc[0, "total"] = 10.5 + 1e-13
    assert "total" in compare("q", _base(), b)


def test_string_diff_flagged():
    b = _base()
    b.loc[3, "name"] = "D"
    assert "name" in compare("q", _base(), b)


def test_swapped_values_across_rows_flagged():
    # Same multiset per column except pairing broken across columns:
    # row-sorted normalization must still catch mispaired rows.
    b = _base()
    b.loc[0, "n"], b.loc[2, "n"] = 2, 7
    assert compare("q", _base(), b) != ""


def test_int_vs_float_dtype_drift_warned():
    b = _base()
    b["n"] = b["n"].astype("float64")
    msg = compare("q", _base(), b)
    assert "DTYPE" in msg or "col n" in msg
