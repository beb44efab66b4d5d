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
    # round-12 window is a FULL 50-entry literal: the 8 entries
    # registered after _WINDOW_R11 froze (first driver witness) plus
    # the 42 stalest re-witnesses (the round-7-witnessed q43..q84
    # block); the remainder runs in plain numeric order from q85.
    import duckdb_nsql_spark.workload as w

    order = w._registry_order()
    assert order == w._registry_order()  # stable across calls
    assert len(order) == len(set(order))  # no dups, nothing dropped
    assert len(order) == len(w.ENGINE_SQL) + len(w.OPERATORS)
    n = len(w._WINDOW_R12)
    assert n == 50  # exactly the driver's correctness window
    assert tuple(order[:n]) == w._WINDOW_R12
    # the refill after the head starts at the re-witness rotation point
    assert order[n] == "q85_union_type"
    # everything outside the hand-ordered head must still carry a
    # pytest-side oracle or rows-only check (test_oracle_parity runs all)
    assert set(order[n:]) == (
        (set(w.ENGINE_SQL) | set(w.OPERATORS)) - set(w._WINDOW_R12)
    )
