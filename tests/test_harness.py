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


def test_registry_rotation_covers_all_entries():
    # the driver checks only the first 50 queries() entries per round; the
    # order rotates by 50 per round (round inferred from CORRECTNESS_r*
    # files) so every entry is witnessed within ceil(N/50) rounds
    import glob as globmod

    import duckdb_nsql_spark.workload as w

    real_glob = globmod.glob
    windows: set[str] = set()
    base_len = len(w._registry_order())
    try:
        for n_files in (2, 3, 4):
            globmod.glob = lambda pat, _n=n_files: (
                ["x"] * _n if "CORRECTNESS_r" in pat else real_glob(pat)
            )
            order = w._registry_order()
            assert len(order) == base_len  # rotation permutes, never drops
            windows |= set(order[:50])
    finally:
        globmod.glob = real_glob
    assert len(windows) == base_len
