import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

# Default the parity sweep to the driver's sf0.01 so the local gate runs
# the same scale the per-round correctness window does (round-4 review:
# sf0.001 default let a scale-sensitive mismatch hide until driver time).
# Override with SPARK_GRAFT_SF_DIR_TEST for quick sf0.001 iteration.
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from duckdb_nsql_spark.session import build_spark

    s = build_spark(app_name="tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def engine(spark):
    from duckdb_nsql_spark import DuckSparkSession

    return DuckSparkSession(spark=spark)


@pytest.fixture(scope="session")
def loaded_engine(spark):
    """Engine with the SF_DIR star schema registered (read-only tests)."""
    from duckdb_nsql_spark import DuckSparkSession

    eng = DuckSparkSession(spark=spark)
    eng.register_parquet_dir(SF_DIR)
    return eng
