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


def test_save_costs_writes_only_changed_keys(tmp_path, monkeypatch):
    """The r5 clobber bug, pinned: bench.py loads the WHOLE memo (including
    bench_register's keys) into its in-memory dict, so a blanket write or a
    blanket merge re-imposes stale snapshot values over corrections other
    processes made on disk mid-run. save_costs must write only keys whose
    value changed in THIS process."""
    import json

    p = tmp_path / "costs.json"
    p.write_text(json.dumps({"register:batch_cold_s": 284.1, "train": 100.0}))
    monkeypatch.setattr(bench, "COSTS_PATH", p)

    costs = bench.load_costs()
    monkeypatch.setattr(bench.save_costs, "baseline", dict(costs), raising=False)

    # someone else (bench_register / a manual sanitize) corrects a key on disk
    on_disk = json.loads(p.read_text())
    on_disk["register:batch_cold_s"] = 150.0
    p.write_text(json.dumps(on_disk))

    # this process changes only "train"; the stale 284.1 snapshot of the
    # batch key must NOT resurrect over the 150.0 correction
    costs["train"] = 90.0
    bench.save_costs(costs)
    final = json.loads(p.read_text())
    assert final["train"] == 90.0
    assert final["register:batch_cold_s"] == 150.0

    # and a key this process DID change is written
    costs["register:batch_cold_s"] = 120.0
    bench.save_costs(costs)
    assert json.loads(p.read_text())["register:batch_cold_s"] == 120.0
