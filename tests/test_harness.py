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
