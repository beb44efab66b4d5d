#!/usr/bin/env python
"""DuckDB side of the headline bench, under the EXACT protocol bench.py
uses for the Spark engine: same DuckDB-dialect statement text (the
workload's ENGINE_SQL — which is what our engine executes), same parquet
inputs, one untimed warm-up pass, best-of-5, result fully fetched into
pandas (fetchdf, Arrow) — so per-row ratios compare like with like.
BASELINE.md's original §2 table was measured with median-of-3 fetchall
and (for B9) a count-only fetch; round-4 review flagged the protocol
mismatch (q9's 1 ms row produced a fake 162x ratio). This script is the
refreshed, protocol-parity baseline.

Prints ONE JSON line mirroring bench.py's shape.

Usage: [SPARK_GRAFT_SF_DIR=...] python harness/bench_duckdb.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from duckdb_nsql_spark import workload  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SWEEPS = 3
RUNS_PER_SWEEP = 2
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# same bench-key -> workload-entry mapping as bench.py's SQL rows
SQL_ROWS = {
    "q1_pricing_summary": "q01_pricing_summary",
    "q2_join_group_topk": "q05_join_group_topk",
    "q3_having_alias": "q08_having_on_alias",
    "q4_cte_subquery": "q22_cte_scalar_subquery",
    "q5_regexp_extract": "q21_regexp_extract",
    "q6_datediff_minute": "q20_datediff_minute",
    "q7_group_by_all": "q09_group_by_all_exclude",
    "q8_order_by_all": "q11_distinct_order",
    "q9_sample": "q34_sample_percent",
    "q11_list_literal_index": "q16_list_ops",
    "q12_window_topk": "q27_window_topk_per_group",
    "q13_multiway_join": "q06_multiway_join",
}

# Pipeline-operator headliners (r10 verdict task 5): bench.py times the
# Spark side of these four; the DuckDB pair runs each operator's ORACLE
# SQL — the same computation the correctness gate replays — under the
# identical fetch protocol, so the 2x discipline that governs q1-q13
# covers the op rows too. Set SPARK_GRAFT_BENCH_OPS=0 to skip (e.g. on
# a box where the sf10 md5-minhash replay is impractical).
#
# op_dedup_minhash protocol note: on the Spark side the banded
# signature table is persisted (_persist_small) and Spark's
# CacheManager reuses it across bench.py's timed runs — so that row
# measures the LSH candidate JOIN over an at-rest signature store, not
# signature construction (r10's sf10 sitting: 0.66 s for 500 k docs,
# impossible for the md5 loop — caught in round 11). For a like-for-
# like pair, the DuckDB side materializes the same banded CTE into a
# TEMP TABLE untimed and times the join over it; the ONE-TIME
# signature-build cost is reported separately as op_minhash_sigbuild
# (Spark's twin numbers live in BASELINE.md §9: 25.9 s md5-UDF /
# 2.88 s xxhash64-JVM at 500 k docs, 32 partitions).
OP_ROWS = {
    "op_dedup_minhash": "op_dedup_minhash_lsh",
    "op_text_profile": "op_text_profile",
    "op_similarity_topk": "op_similarity_topk",
    "op_asof_join": "op_asof_join",
}


def _minhash_split(oracle_sql: str) -> tuple[str, str]:
    """Split ORACLE_MINHASH_LSH into (sig-store CTAS, timed join)."""
    ctes, final = oracle_sql.rsplit("SELECT DISTINCT", 1)
    setup = (
        "CREATE OR REPLACE TEMP TABLE r11_banded AS "
        + ctes
        + "SELECT * FROM banded"
    )
    timed = "SELECT DISTINCT" + final.replace("banded", "r11_banded")
    return setup, timed


def main() -> None:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    # warm-up pass (OS page cache + catalog), then SWEEPS interleaved
    # sweeps x RUNS_PER_SWEEP — the same episode-resistant schedule as
    # bench.py (host-contention episodes are time-local; each query's
    # min is taken over draws spread across the whole bench window)
    bench_ops = os.environ.get("SPARK_GRAFT_BENCH_OPS", "1") != "0"
    op_rows = (
        {k: workload.OPERATORS[q][1] for k, q in OP_ROWS.items()}
        if bench_ops
        else {}
    )
    sigbuild = None
    if bench_ops:
        setup, timed = _minhash_split(op_rows["op_dedup_minhash"])
        t0 = time.perf_counter()
        con.execute(setup)
        sigbuild = round(time.perf_counter() - t0, 4)
        op_rows["op_dedup_minhash"] = timed
    for key, qname in SQL_ROWS.items():
        con.execute(workload.ENGINE_SQL[qname][0]).fetchdf()
    con.execute("SUMMARIZE orders").fetchdf()
    for key, sql in op_rows.items():
        con.execute(sql).fetchdf()

    best: dict[str, float] = {}
    for _sweep in range(SWEEPS):
        for key, qname in SQL_ROWS.items():
            sql = workload.ENGINE_SQL[qname][0]
            for _ in range(RUNS_PER_SWEEP):
                t0 = time.perf_counter()
                con.execute(sql).fetchdf()
                dt = time.perf_counter() - t0
                best[key] = min(best.get(key, float("inf")), dt)
        for _ in range(RUNS_PER_SWEEP):
            t0 = time.perf_counter()
            con.execute("SUMMARIZE orders").fetchdf()
            dt = time.perf_counter() - t0
            best["q10_summarize"] = min(
                best.get("q10_summarize", float("inf")), dt
            )
        for key, sql in op_rows.items():
            for _ in range(RUNS_PER_SWEEP):
                t0 = time.perf_counter()
                con.execute(sql).fetchdf()
                dt = time.perf_counter() - t0
                best[key] = min(best.get(key, float("inf")), dt)
    results = {
        key: round(best[key], 4)
        for key in list(SQL_ROWS) + ["q10_summarize"] + list(op_rows)
    }
    if sigbuild is not None:
        results["op_minhash_sigbuild"] = sigbuild

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1].lstrip("_")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_queries_total_latency",
                "value": round(
                    sum(
                        v
                        for k, v in results.items()
                        if k != "op_minhash_sigbuild"
                    ),
                    4,
                ),
                "unit": "sec",
                "queries": results,
                "sf": sf_val,
                "duckdb": duckdb.__version__,
            }
        )
    )


if __name__ == "__main__":
    main()
