"""Unit tests for bench.py's budget machinery.

bench.py is the driver's measurement contract; its module level is
import-safe (no jax import, no device work), so the pure helpers are
testable on CPU without touching an accelerator.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_extended_budget_respects_explicit():
    # an explicitly configured budget is never second-guessed
    assert bench.extended_budget(450.0, 900.0, explicit=True) == 450.0


def test_extended_budget_small_debt_unchanged():
    # cheap warmup: the default budget already leaves >750s of work
    assert bench.extended_budget(1100.0, 120.0, explicit=False) == 1100.0


def test_extended_budget_large_debt_extends_to_cap():
    # a ~900s warmup would leave ~200s of work; extension hits the cap
    assert bench.extended_budget(1100.0, 930.0, explicit=False) == bench.BUDGET_CAP


def test_extended_budget_moderate_debt_partial_extension():
    # 500s elapsed -> 500+750 = 1250 capped to 1200
    assert bench.extended_budget(1100.0, 500.0, explicit=False) == 1200.0
    # 300s elapsed -> 1050 < 1100, stays at the default
    assert bench.extended_budget(1100.0, 300.0, explicit=False) == 1100.0


def test_cap_is_under_driver_kill_threshold():
    # r02's driver killed past ~20 min; the cap must stay at/below 1200s
    assert bench.BUDGET_CAP <= 1200.0
