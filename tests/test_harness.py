"""Run every execution-match case from harness.cases against live DuckDB
— the reference's evaluation protocol (SURVEY §5) with our engine as the
system under test."""

import pytest

from harness import cases as case_mod
from harness.fixtures import DATABASES
from harness.oracle import OracleRunner

ALL = case_mod.all_cases()


@pytest.fixture(scope="module")
def runners(spark, tmp_path_factory):
    made = {}

    def get(db_id: str) -> OracleRunner:
        if db_id not in made:
            made[db_id] = OracleRunner(spark, DATABASES[db_id])
        return made[db_id]

    return get


@pytest.mark.parametrize("case", ALL, ids=[c.name for c in ALL])
def test_case(case, runners, tmp_path):
    runner = runners(case.db_id)
    runner.run_case(case, tmp_dir=str(tmp_path))


def test_registry_order_fixed_and_complete():
    # The registry order is a hand-maintained static literal —
    # deterministic, no dependence on files in the repo root (the r3
    # rotation scheme was flagged as harness-gaming and removed). The
    # round-13 window is a FULL 50-entry literal (see _WINDOW_R13's
    # comment for its composition: changed-row re-witnesses, the 15
    # post-freeze q147-q161, and the staleness-bound blocks); the
    # remainder runs in plain numeric order from q126.
    import duckdb_nsql_spark.workload as w

    order = w._registry_order()
    assert order == w._registry_order()  # stable across calls
    assert len(order) == len(set(order))  # no dups, nothing dropped
    assert len(order) == len(w.ENGINE_SQL) + len(w.OPERATORS)
    n = len(w._WINDOW_R13)
    assert n == 50  # exactly the driver's correctness window
    assert tuple(order[:n]) == w._WINDOW_R13
    # the refill after the head starts at the re-witness rotation point
    # (round 13: the stalest SQL outside the window is the round-8 pair
    # q126/q127)
    assert order[n] == "q126_series_step_arith"
    # everything outside the hand-ordered head must still carry a
    # pytest-side oracle or rows-only check (test_oracle_parity runs all)
    assert set(order[n:]) == (
        (set(w.ENGINE_SQL) | set(w.OPERATORS)) - set(w._WINDOW_R13)
    )
