"""Property tests for the financial kernel — mirrors the reference's
test strategy (test/utils/financials_test.py:14-64, SURVEY §5): hand
cases plus randomized arrays checked against a naive reimplementation,
and calc_apr re-derived from the constants.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stakehouse_etl_spark.functions.financials import (
    DETH_PRINCIPAL,
    EPOCHS_PER_YEAR,
    ONE_GWEI,
    calc_apr_py,
    calc_earnings_py,
    calc_losses_py,
)

balances = st.lists(
    st.floats(min_value=0, max_value=64e9, allow_nan=False), min_size=2, max_size=50
)


def naive_earnings(desc):
    total = 0.0
    for newer, older in zip(desc, desc[1:]):
        d = newer - older
        if d > 0:
            total += d
    return total


def naive_losses(desc):
    total = 0.0
    for newer, older in zip(desc, desc[1:]):
        d = newer - older
        if d < 0:
            total -= d
    return total


def test_hand_cases():
    # monotonic growth: all delta positive, no losses
    assert calc_earnings_py([5.0, 3.0, 1.0]) == 4.0
    assert calc_losses_py([5.0, 3.0, 1.0]) == 0.0
    # dip then recovery
    assert calc_earnings_py([4.0, 2.0, 3.0]) == 2.0
    assert calc_losses_py([4.0, 2.0, 3.0]) == 1.0
    # flat: nothing
    assert calc_earnings_py([1.0, 1.0]) == 0.0
    assert calc_losses_py([1.0, 1.0]) == 0.0


@given(balances)
@settings(max_examples=200, deadline=None)
def test_earnings_matches_naive(xs):
    assert calc_earnings_py(xs) == pytest.approx(naive_earnings(xs))


@given(balances)
@settings(max_examples=200, deadline=None)
def test_losses_matches_naive(xs):
    assert calc_losses_py(xs) == pytest.approx(naive_losses(xs))


@given(balances)
@settings(max_examples=100, deadline=None)
def test_net_delta_identity(xs):
    """earnings − losses == first − last (telescoping sum)."""
    net = calc_earnings_py(xs) - calc_losses_py(xs)
    # float error accumulates ~eps·|x|·n at 64e9 gwei magnitudes; 1 gwei
    # of slack is far below any meaningful quantum here
    assert net == pytest.approx(xs[0] - xs[-1], abs=1.0)


@given(
    st.floats(min_value=0, max_value=1e12, allow_nan=False),
    st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=200, deadline=None)
def test_apr_rederived(earnings, n):
    expected = ((earnings * ONE_GWEI) / n) / DETH_PRINCIPAL * EPOCHS_PER_YEAR * 100
    assert calc_apr_py(earnings, n) == pytest.approx(expected)


def test_apr_guard():
    assert calc_apr_py(100.0, 0) == 0.0
    assert calc_apr_py(100.0, -5) == 0.0
