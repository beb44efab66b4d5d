"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real registry lives in ``duckdb_nsql_spark.workload``:
- ENGINE_SQL entries execute DuckDB-dialect SQL through the engine's own
  frontend (most oracles are the *same SQL text* run on DuckDB).
- OPERATORS entries are Spark-first pipelines (dedup / similarity / text /
  asof / streaming) with hand-matched oracle SQL where cross-engine
  determinism allows, rows-only otherwise.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# path-robust: the driver may load this module by file path from any cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_nsql_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape in DuckDB dialect, GROUP BY ALL /
    ORDER BY ALL) on /root/testdata/sf0.001 through the engine frontend."""
    eng = workload.engine_for(spark, "/root/testdata/sf0.001")
    return eng.execute(workload.ENGINE_SQL["q01_pricing_summary"][0])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.build_queries()


def oracle_sql() -> dict[str, str]:
    return workload.build_oracles()
