#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query best-of-2 sec...}, "sf": <sf>}

Query keys map onto BASELINE.md rows (B1..B12 measured on DuckDB at the
same scale factor) plus the pipeline-operator headliners. Timings fully
fetch the result into Python via Arrow — the SAME protocol as the
DuckDB baseline ("result fully fetched", BASELINE.md §2). A full fetch
materializes every result row, so none of the measured computation can
be pruned (unlike count()); the previous noop-sink protocol was measured
to add 0.1-0.6s/query of DSv2 write-path overhead that DuckDB's fetch
protocol does not pay (docs/PLANS.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
SWEEPS = 3  # interleaved sweeps x runs: this VM shows multi-second
RUNS_PER_SWEEP = 2  # host-contention EPISODES (identical code draws
# 1.4s and 7s minutes apart; steal/GC clean). Consecutive draws all land
# inside one episode, so best-of-N back-to-back runs is a poor noise
# floor — instead the full query list is swept SWEEPS times and each
# query keeps its min across sweeps, spreading every query's draws over
# the whole bench window. Same total executions as best-of-6.

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_nsql_spark import workload  # noqa: E402
from duckdb_nsql_spark.session import build_spark  # noqa: E402

# baseline row -> workload query (BASELINE.md §2)
BENCH_QUERIES = {
    "q1_pricing_summary": "q01_pricing_summary",        # B1
    "q2_join_group_topk": "q05_join_group_topk",        # B2
    "q3_having_alias": "q08_having_on_alias",           # B3
    "q4_cte_subquery": "q22_cte_scalar_subquery",       # B4
    "q5_regexp_extract": "q21_regexp_extract",          # B5
    "q6_datediff_minute": "q20_datediff_minute",        # B6
    "q7_group_by_all": "q09_group_by_all_exclude",      # B7
    "q8_order_by_all": "q11_distinct_order",            # B8
    "q9_sample": "q34_sample_percent",                  # B9
    "q11_list_literal_index": "q16_list_ops",           # B11
    "q12_window_topk": "q27_window_topk_per_group",     # B12
    "q13_multiway_join": "q06_multiway_join",
    # op-row cache semantics (round-11 protocol note): the minhash
    # banded-signature store is persisted inside the operator
    # (_persist_small) and Spark's CacheManager deduplicates by plan, so
    # timed re-runs reuse the at-rest signature store and measure the
    # LSH candidate generation (round 13: a single scan of the
    # pre-grouped per-bucket store + pair transform + distinct;
    # clear_statement_cache clears SQL plans, not the dataset cache).
    # The DuckDB pair (harness/bench_duckdb.py) mirrors this with an
    # untimed TEMP TABLE of the same banded CTE; the one-time
    # signature-build cost is reported separately there and in
    # BASELINE.md §9.
    "op_dedup_minhash": "op_dedup_minhash_lsh",
    "op_text_profile": "op_text_profile",
    "op_similarity_topk": "op_similarity_topk",
    "op_asof_join": "op_asof_join",
}
SUMMARIZE_KEY = "q10_summarize"  # B10 — routed through the engine directly

# q13 over CLUSTER BY tables: same query (same result rows) as
# q13_multiway_join but over bucketed-at-rest fact tables — the at-rest
# answer a 100 TB deployment would choose. Round 13 extends the seam to
# the FULL join chain (the r12 verdict's #1): customer_c and orders_c
# are CO-BUCKETED on the custkey join key, lineitem_c on orderkey, so
# customer⋈orders plans with ZERO exchange (bucket-to-bucket) and the
# only data exchange left is the c⋈o output re-keyed to lineitem's
# buckets. Before (r12 layout: orders_c on o_orderkey, customer
# unbucketed) the plan shuffled customer AND orders AND the join output
# — 3 data exchanges; measured at sf10: 2.27-5.7 s -> 2.15-2.31 s, plan
# Exchange count (data-carrying) 3 -> 1. Setup (the CTAS writes) is
# untimed, like DuckDB's own at-rest table load. Broadcast threshold
# stays at the session default: measured at sf10, forcing the 1.5M-row
# customer dim to broadcast costs ~2.5 s/run of driver collect+build
# (5.3 s vs 2.7 s total) — the co-bucketed join is the cheaper plan.
CLUSTERED_KEY = "q13_clustered"
CLUSTERED_SQL = """
    SELECT r.r_name, n.n_name, count(*) AS n_orders,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer_c c ON c.c_nationkey = n.n_nationkey
    JOIN orders_c o ON o.o_custkey = c.c_custkey
    JOIN lineitem_c l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
"""

# q3 over a CLUSTER BY table: same query as q3_having_alias but orders is
# bucketed-at-rest on the GROUP BY key (recommend_layout says 'cluster'
# for orders/o_custkey at >=10M rows, tests/test_skew.py agg decision
# test) — the bucketed scan's HashPartitioning satisfies the aggregate's
# ClusteredDistribution, so the 1.5M-group aggregation runs with ZERO
# exchanges (plan-pinned). The at-rest answer for a hot grouping key at
# 100 TB; setup (the CTAS write) is untimed, like DuckDB's table load.
AGG_CLUSTERED_KEY = "q3_clustered"
AGG_CLUSTERED_SQL = """
    SELECT o_custkey, round(sum(o_totalprice), 2) AS balance
    FROM orders_g GROUP BY o_custkey
    HAVING balance > 1500000 ORDER BY o_custkey
"""


def _setup_clustered(eng) -> None:
    eng.execute(
        "CREATE OR REPLACE TABLE customer_c CLUSTER BY (c_custkey)"
        " INTO 32 BUCKETS AS SELECT c_custkey, c_nationkey FROM customer"
    )
    eng.execute(
        "CREATE OR REPLACE TABLE orders_c CLUSTER BY (o_custkey)"
        " INTO 32 BUCKETS AS SELECT o_orderkey, o_custkey FROM orders"
    )
    eng.execute(
        "CREATE OR REPLACE TABLE lineitem_c CLUSTER BY (l_orderkey)"
        " INTO 32 BUCKETS AS SELECT l_orderkey, l_extendedprice,"
        " l_discount FROM lineitem"
    )
    eng.execute(
        "CREATE OR REPLACE TABLE orders_g CLUSTER BY (o_custkey)"
        " INTO 32 BUCKETS AS SELECT o_custkey, o_totalprice FROM orders"
    )


def materialize(df) -> None:
    df.toPandas()  # Arrow-batched full fetch, mirrors duckdb fetchdf()


def main() -> None:
    spark = build_spark(app_name="bench", cpus=CPUS)
    queries = workload.build_queries()
    eng = workload.engine_for(spark, SF_DIR)

    # warm-up: JVM/codegen/Python-worker spin-up outside the timings.
    # One untimed pass over every headline query — whole-stage-codegen
    # compilation and JIT dominate first execution at these latencies
    # (round-2 post-mortem: 30-80% "regressions" on sub-400ms queries were
    # first-run compile cost landing inside an n=2 minimum, docs/PLANS.md).
    materialize(eng.table("lineitem").limit(1000))
    for qname in BENCH_QUERIES.values():
        materialize(queries[qname](spark, SF_DIR))
    materialize(eng.execute("SUMMARIZE orders"))
    _setup_clustered(eng)

    def run_clustered() -> None:
        materialize(eng.execute(CLUSTERED_SQL))

    def run_agg_clustered() -> None:
        materialize(eng.execute(AGG_CLUSTERED_SQL))

    run_clustered()  # untimed warm-up
    run_agg_clustered()

    best: dict[str, float] = {}
    for _sweep in range(SWEEPS):
        for key, qname in BENCH_QUERIES.items():
            for _ in range(RUNS_PER_SWEEP):
                # full re-execution per run: a statement-cache hit
                # returns the SAME Dataset and AQE reuses its
                # materialized shuffle stages, silently skipping the
                # scan/partial-agg work DuckDB re-executes every
                # statement — clear between timed runs so both engines
                # run the whole plan each iteration
                eng.clear_statement_cache()
                t0 = time.perf_counter()
                materialize(queries[qname](spark, SF_DIR))
                dt = time.perf_counter() - t0
                best[key] = min(best.get(key, float("inf")), dt)
        for _ in range(RUNS_PER_SWEEP):
            eng.clear_statement_cache()
            t0 = time.perf_counter()
            materialize(eng.execute("SUMMARIZE orders"))
            dt = time.perf_counter() - t0
            best[SUMMARIZE_KEY] = min(
                best.get(SUMMARIZE_KEY, float("inf")), dt
            )
        for _ in range(RUNS_PER_SWEEP):
            eng.clear_statement_cache()
            t0 = time.perf_counter()
            run_clustered()
            dt = time.perf_counter() - t0
            best[CLUSTERED_KEY] = min(
                best.get(CLUSTERED_KEY, float("inf")), dt
            )
        for _ in range(RUNS_PER_SWEEP):
            eng.clear_statement_cache()
            t0 = time.perf_counter()
            run_agg_clustered()
            dt = time.perf_counter() - t0
            best[AGG_CLUSTERED_KEY] = min(
                best.get(AGG_CLUSTERED_KEY, float("inf")), dt
            )
    for t in ("customer_c", "orders_c", "lineitem_c", "orders_g"):
        try:
            eng.execute(f"DROP TABLE IF EXISTS {t}")
        except Exception:  # noqa: BLE001 — cleanup only
            pass
    # q13_clustered / q3_clustered are ALTERNATE-LAYOUT data, not extra
    # baseline rows: they rerun B13/B3's queries over bucketed-at-rest
    # tables, so they are reported per-query but EXCLUDED from the
    # headline total (which maps 1:1 onto BASELINE.md's 13 rows).
    results = {
        key: round(best[key], 4)
        for key in list(BENCH_QUERIES)
        + [SUMMARIZE_KEY, CLUSTERED_KEY, AGG_CLUSTERED_KEY]
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(
        sum(
            v
            for k, v in results.items()
            if k not in (CLUSTERED_KEY, AGG_CLUSTERED_KEY)
        ),
        4,
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_latency",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf_val,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
