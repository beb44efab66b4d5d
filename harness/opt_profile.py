#!/usr/bin/env python
"""Optimization-round profiler: per-statement component timings for every
headline bench query at $SPARK_GRAFT_SF_DIR.

For each bench row, after one untimed warm-up pass, measures (best-of-N):
  rewrite   - engine frontend rewrite only (_rewrite_query; no Spark jobs
              except plan-time counts such as percent-LIMIT)
  build     - execute() up to an analyzed DataFrame (no action). NOTE:
              build SUBSUMES rewrite (the statement cache is cleared
              first, so execute() re-runs the frontend rewrite before
              Catalyst analysis) — the two components overlap by the
              rewrite time rather than partitioning the total.
  fetch     - toPandas() on the built DataFrame (Arrow full fetch)
  total     - clear_statement_cache + execute + toPandas (the bench.py
              protocol, end to end)

Also optionally dumps .explain('formatted') per query to --plans-dir.
Prints one JSON line with all components.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_nsql_spark import workload  # noqa: E402
from duckdb_nsql_spark.session import build_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# bench.py rows -> workload names (SQL rows only get rewrite/build split;
# operator rows are timed end-to-end only)
import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    spark = build_spark(app_name="opt-profile", cpus=CPUS)
    queries = workload.build_queries()
    eng = workload.engine_for(spark, SF_DIR)

    # warm-up identical to bench.py
    eng.table("lineitem").limit(1000).toPandas()
    for qname in bench.BENCH_QUERIES.values():
        queries[qname](spark, SF_DIR).toPandas()
    eng.execute("SUMMARIZE orders").toPandas()

    rows: dict[str, dict[str, float]] = {}
    for key, qname in bench.BENCH_QUERIES.items():
        comp: dict[str, float] = {}
        is_sql = qname in workload.ENGINE_SQL
        sql = workload.ENGINE_SQL[qname][0] if is_sql else None
        for _ in range(args.runs):
            if is_sql:
                eng.clear_statement_cache()
                t0 = time.perf_counter()
                eng._rewrite_query(sql)
                t1 = time.perf_counter()
                comp["rewrite"] = min(
                    comp.get("rewrite", 9e9), t1 - t0
                )
                eng.clear_statement_cache()
                t0 = time.perf_counter()
                df = eng.execute(sql)
                t1 = time.perf_counter()
                df.toPandas()
                t2 = time.perf_counter()
                comp["build"] = min(comp.get("build", 9e9), t1 - t0)
                comp["fetch"] = min(comp.get("fetch", 9e9), t2 - t1)
                comp["total"] = min(comp.get("total", 9e9), t2 - t0)
            else:
                eng.clear_statement_cache()
                t0 = time.perf_counter()
                df = queries[qname](spark, SF_DIR)
                t1 = time.perf_counter()
                df.toPandas()
                t2 = time.perf_counter()
                comp["build"] = min(comp.get("build", 9e9), t1 - t0)
                comp["fetch"] = min(comp.get("fetch", 9e9), t2 - t1)
                comp["total"] = min(comp.get("total", 9e9), t2 - t0)
        rows[key] = {k: round(v, 4) for k, v in comp.items()}
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = queries[qname](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(
                    args.plans_dir, f"{key}{args.tag}.txt"
                ),
                "w",
            ) as f:
                f.write(buf.getvalue())

    # floor: SELECT 1 through the whole path
    comp = {}
    for _ in range(args.runs):
        eng.clear_statement_cache()
        t0 = time.perf_counter()
        eng.execute("SELECT 1 AS one").toPandas()
        dt = time.perf_counter() - t0
        comp["total"] = min(comp.get("total", 9e9), dt)
    rows["floor_select1"] = {k: round(v, 4) for k, v in comp.items()}

    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "rows": rows}))


if __name__ == "__main__":
    main()
