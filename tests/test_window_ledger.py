"""Staleness ledger for the driver correctness window.

VERDICT r10 task 7: with 256 registry entries and a 50-row driver
window, the re-witness cadence is >5 rounds and growing — this test
makes the bound explicit.  It unions every CORRECTNESS_r*.json artifact
in the repo root to compute each entry's last-witnessed round, then
asserts that AFTER the current window lands (every `_WINDOW_R{N}` entry
gets a row in round N) no entry's driver row is more than
MAX_STALENESS rounds old.

The test reads evaluator artifacts — that is fine for a *test* (it runs
after the artifacts exist); the workload module itself never does (the
round-3 verdict banned artifact-sniffing at import time).
"""
from __future__ import annotations

import json
import re
from pathlib import Path

import duckdb_nsql_spark.workload as w

REPO = Path(__file__).resolve().parent.parent
CURRENT_ROUND = 13  # bump when freezing the next _WINDOW_R{N}
MAX_STALENESS = 6


def _last_witnessed() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", f.name)
        rnd = int(m.group(1))
        if rnd >= CURRENT_ROUND:
            continue  # only prior rounds count as history
        for name in json.loads(f.read_text()):
            last[name] = max(last.get(name, 0), rnd)
    return last


def test_window_matches_current_round():
    # the frozen literal the driver will run this round
    window = getattr(w, f"_WINDOW_R{CURRENT_ROUND}")
    assert len(window) == 50
    assert tuple(w._registry_order()[:50]) == tuple(window)


def test_no_entry_staler_than_bound_after_window_lands():
    last = _last_witnessed()
    window = set(getattr(w, f"_WINDOW_R{CURRENT_ROUND}"))
    post_freeze = set(getattr(w, f"_POST_FREEZE_R{CURRENT_ROUND}", ()))
    registry = set(w.ENGINE_SQL) | set(w.OPERATORS)
    # simulate the current window landing; post-freeze entries are brand
    # new (no row possible until next round) and exempt by construction
    projected = {
        n: (CURRENT_ROUND if n in window else last.get(n, 0))
        for n in registry - post_freeze
    }
    stale = {
        n: r for n, r in projected.items()
        if CURRENT_ROUND - r > MAX_STALENESS
    }
    assert not stale, (
        f"entries whose driver row would be >{MAX_STALENESS} rounds old "
        f"after round {CURRENT_ROUND}: {sorted(stale.items())} — "
        "re-witness them in the window"
    )


def test_never_witnessed_entries_lead_the_window():
    # every registry entry with NO prior driver row must be in the
    # current window (first-witness priority — the r10 verdict's #1) or
    # explicitly declared as a post-freeze registration destined for the
    # next round's window head
    last = _last_witnessed()
    window = set(getattr(w, f"_WINDOW_R{CURRENT_ROUND}"))
    post_freeze = set(getattr(w, f"_POST_FREEZE_R{CURRENT_ROUND}", ()))
    registry = set(w.ENGINE_SQL) | set(w.OPERATORS)
    unwitnessed = {n for n in registry if n not in last}
    missing = unwitnessed - window - post_freeze
    assert not missing, (
        f"never-driver-witnessed entries NOT in _WINDOW_R{CURRENT_ROUND} "
        f"and NOT declared in _POST_FREEZE_R{CURRENT_ROUND}: "
        f"{sorted(missing)}"
    )
