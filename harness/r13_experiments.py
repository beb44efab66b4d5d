#!/usr/bin/env python
"""Round-13 optimization experiments at $SPARK_GRAFT_SF_DIR.

Targeted decompositions for the VERDICT r12 "Next round" list:
  q3c   - q3_clustered: is the residual the bucketed agg itself, or the
          trailing range sort whose sampling pass re-executes the
          zero-exchange child (scan+agg run TWICE)?  Times the agg-only
          plan (noop sink), the current statement, and a
          REPARTITION(1)+SORT BY variant (one single-partition shuffle of
          the agg output, no sampling).
  q13c  - q13_clustered: current layout (orders_c on o_orderkey, customer
          unbucketed) vs the co-bucketed seam (customer_c + orders_c both
          on custkey, lineitem_c on orderkey) — exchange counts + timings.
  q6    - q6_datediff_minute: agg-only vs full statement at scale.
  q10   - SUMMARIZE orders: is it one scan? noop vs fetch split.
  minhash - op_dedup_minhash: store-build vs candidate-join split.

Each experiment prints one JSON line; plans go to --plans-dir.
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


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _dump_plan(df, plans_dir: str | None, name: str) -> None:
    if not plans_dir:
        return
    os.makedirs(plans_dir, exist_ok=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
        f.write(buf.getvalue())


def _best(fn, runs: int, eng=None) -> float:
    best = 9e9
    for _ in range(runs):
        if eng is not None:
            eng.clear_statement_cache()
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def exp_q3c(eng, spark, runs, plans_dir) -> dict:
    eng.execute(
        "CREATE OR REPLACE TABLE orders_g CLUSTER BY (o_custkey)"
        " INTO 32 BUCKETS AS SELECT o_custkey, o_totalprice FROM orders"
    )
    agg_sql = (
        "SELECT o_custkey, round(sum(o_totalprice), 2) AS balance"
        " FROM orders_g GROUP BY o_custkey HAVING balance > 1500000"
    )
    full_sql = agg_sql + " ORDER BY o_custkey"
    out: dict = {}
    df_full = eng.execute(full_sql)
    out["n_rows"] = df_full.count()
    df_full.toPandas()  # warm
    _dump_plan(eng.execute(full_sql), plans_dir, "q3_clustered_current")
    spark.sparkContext.setJobDescription("q3c: full current")
    out["full_current"] = _best(
        lambda: eng.execute(full_sql).toPandas(), runs, eng
    )
    spark.sparkContext.setJobDescription("q3c: agg only noop")
    out["agg_noop"] = _best(lambda: _noop(eng.execute(agg_sql)), runs, eng)
    spark.sparkContext.setJobDescription("q3c: agg only fetch")
    out["agg_fetch"] = _best(
        lambda: eng.execute(agg_sql).toPandas(), runs, eng
    )

    def rep1():
        inner = eng.execute(agg_sql)
        inner.createOrReplaceTempView("__r13_q3c")
        spark.sql(
            "SELECT /*+ REPARTITION(1) */ * FROM __r13_q3c"
            " SORT BY o_custkey NULLS LAST"
        ).toPandas()

    spark.sparkContext.setJobDescription("q3c: repartition1 sort")
    out["rep1_sort"] = _best(rep1, runs, eng)

    # materialize the zero-exchange agg into a shuffle stage below the
    # range sort: the sampling pass then reads shuffle files instead of
    # re-executing scan+agg (the double-execution seen in the current
    # plan), and the sort stays parallel.
    def repkey():
        inner = eng.execute(agg_sql)
        inner.createOrReplaceTempView("__r13_q3c")
        spark.sql(
            "SELECT * FROM (SELECT /*+ REPARTITION(o_custkey) */ *"
            " FROM __r13_q3c) b ORDER BY o_custkey NULLS LAST"
        ).toPandas()

    spark.sparkContext.setJobDescription("q3c: repartition-key + range sort")
    out["repkey_sort"] = _best(repkey, runs, eng)
    inner = eng.execute(agg_sql)
    inner.createOrReplaceTempView("__r13_q3c")
    _dump_plan(
        spark.sql(
            "SELECT * FROM (SELECT /*+ REPARTITION(o_custkey) */ *"
            " FROM __r13_q3c) b ORDER BY o_custkey NULLS LAST"
        ),
        plans_dir,
        "q3_clustered_repkey",
    )
    spark.sparkContext.setJobDescription(None)
    return out


def exp_q13c(eng, spark, runs, plans_dir) -> dict:
    out: dict = {}
    # current layout
    eng.execute(
        "CREATE OR REPLACE TABLE orders_c CLUSTER BY (o_orderkey)"
        " INTO 32 BUCKETS AS SELECT o_orderkey, o_custkey FROM orders"
    )
    eng.execute(
        "CREATE OR REPLACE TABLE lineitem_c CLUSTER BY (l_orderkey)"
        " INTO 32 BUCKETS AS SELECT l_orderkey, l_extendedprice,"
        " l_discount FROM lineitem"
    )
    cur_sql = """
        SELECT r.r_name, n.n_name, count(*) AS n_orders,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders_c o ON o.o_custkey = c.c_custkey
        JOIN lineitem_c l ON l.l_orderkey = o.o_orderkey
        GROUP BY r.r_name, n.n_name
        ORDER BY r.r_name, n.n_name
    """
    eng.execute(cur_sql).toPandas()  # warm
    _dump_plan(eng.execute(cur_sql), plans_dir, "q13_clustered_current")
    spark.sparkContext.setJobDescription("q13c: current layout")
    out["current"] = _best(lambda: eng.execute(cur_sql).toPandas(), runs, eng)

    # co-bucketed seam: customer_c + orders_k both on custkey
    eng.execute(
        "CREATE OR REPLACE TABLE customer_c CLUSTER BY (c_custkey)"
        " INTO 32 BUCKETS AS SELECT c_custkey, c_nationkey FROM customer"
    )
    eng.execute(
        "CREATE OR REPLACE TABLE orders_k CLUSTER BY (o_custkey)"
        " INTO 32 BUCKETS AS SELECT o_orderkey, o_custkey FROM orders"
    )
    cob_sql = cur_sql.replace("customer c", "customer_c c").replace(
        "orders_c o", "orders_k o"
    )
    eng.execute(cob_sql).toPandas()  # warm
    _dump_plan(eng.execute(cob_sql), plans_dir, "q13_clustered_cobucket")
    spark.sparkContext.setJobDescription("q13c: co-bucketed seam")
    out["cobucket"] = _best(
        lambda: eng.execute(cob_sql).toPandas(), runs, eng
    )

    # decompositions on the co-bucketed layout
    co_sql = """
        SELECT n.n_name, o.o_orderkey
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer_c c ON c.c_nationkey = n.n_nationkey
        JOIN orders_k o ON o.o_custkey = c.c_custkey
    """
    spark.sparkContext.setJobDescription("q13c: c-join-o only noop")
    out["co_join_noop"] = _best(lambda: _noop(eng.execute(co_sql)), runs, eng)
    spark.sparkContext.setJobDescription("q13c: lineitem_c scan noop")
    out["lineitem_scan_noop"] = _best(
        lambda: _noop(
            eng.execute(
                "SELECT l_orderkey, l_extendedprice, l_discount"
                " FROM lineitem_c"
            )
        ),
        runs,
        eng,
    )

    # c-join-o PLUS the exchange by orderkey (the 736MiB shuffle):
    def co_ex():
        eng.execute(co_sql).createOrReplaceTempView("__r13_co")
        _noop(
            spark.sql(
                "SELECT /*+ REPARTITION(32, o_orderkey) */ * FROM __r13_co"
            )
        )

    spark.sparkContext.setJobDescription("q13c: c-join-o + exchange noop")
    out["co_join_exchange_noop"] = _best(co_ex, runs, eng)

    # full join, no agg:
    join_sql = """
        SELECT r.r_name, n.n_name, l.l_extendedprice, l.l_discount
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer_c c ON c.c_nationkey = n.n_nationkey
        JOIN orders_k o ON o.o_custkey = c.c_custkey
        JOIN lineitem_c l ON l.l_orderkey = o.o_orderkey
    """
    spark.sparkContext.setJobDescription("q13c: full join noop")
    out["full_join_noop"] = _best(
        lambda: _noop(eng.execute(join_sql)), runs, eng
    )

    # sorted bucket scans (1 file/bucket + legacy outputOrdering conf):
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    eng.clear_statement_cache()
    eng.execute(cob_sql).toPandas()
    _dump_plan(
        eng.execute(cob_sql), plans_dir, "q13_clustered_cobucket_sorted"
    )
    spark.sparkContext.setJobDescription("q13c: cobucket sorted scans")
    out["cobucket_sorted"] = _best(
        lambda: eng.execute(cob_sql).toPandas(), runs, eng
    )
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    spark.sparkContext.setJobDescription(None)
    return out


def exp_q6(eng, spark, runs, plans_dir) -> dict:
    sql = workload.ENGINE_SQL["q20_datediff_minute"][0]
    out: dict = {}
    eng.execute(sql).toPandas()
    _dump_plan(eng.execute(sql), plans_dir, "q6_datediff_current")
    spark.sparkContext.setJobDescription("q6: full")
    out["full"] = _best(lambda: eng.execute(sql).toPandas(), runs, eng)
    agg_sql = (
        "SELECT user_id, datediff('minute', min(ts), max(ts)) AS"
        " active_minutes, count(*) AS n_events FROM events GROUP BY user_id"
    )
    spark.sparkContext.setJobDescription("q6: agg only noop")
    out["agg_noop"] = _best(lambda: _noop(eng.execute(agg_sql)), runs, eng)
    spark.sparkContext.setJobDescription("q6: scan only noop")
    out["scan_noop"] = _best(
        lambda: _noop(eng.execute("SELECT user_id, ts FROM events")),
        runs,
        eng,
    )
    spark.sparkContext.setJobDescription(None)
    return out


def exp_q10(eng, spark, runs, plans_dir) -> dict:
    out: dict = {}
    eng.execute("SUMMARIZE orders").toPandas()
    _dump_plan(eng.execute("SUMMARIZE orders"), plans_dir, "q10_summarize")
    spark.sparkContext.setJobDescription("q10: summarize fetch")
    out["full"] = _best(
        lambda: eng.execute("SUMMARIZE orders").toPandas(), runs, eng
    )
    spark.sparkContext.setJobDescription("q10: summarize noop")
    out["noop"] = _best(
        lambda: _noop(eng.execute("SUMMARIZE orders")), runs, eng
    )
    spark.sparkContext.setJobDescription(None)
    return out


def exp_minhash(eng, spark, runs, plans_dir, queries) -> dict:
    out: dict = {}
    fn = queries["op_dedup_minhash_lsh"]
    fn(spark, SF_DIR).toPandas()  # warm (builds + caches the store)
    _dump_plan(fn(spark, SF_DIR), plans_dir, "op_dedup_minhash_current")
    spark.sparkContext.setJobDescription("minhash: candidates")
    out["candidates"] = _best(
        lambda: fn(spark, SF_DIR).toPandas(), runs, eng
    )
    spark.sparkContext.setJobDescription(None)
    return out


EXPERIMENTS = ("q3c", "q13c", "q6", "q10", "minhash")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--only", default=None, help="comma list of experiments")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else set(EXPERIMENTS)

    spark = build_spark(app_name="r13-experiments", cpus=CPUS)
    queries = workload.build_queries()
    eng = workload.engine_for(spark, SF_DIR)
    eng.table("lineitem").limit(1000).toPandas()

    results: dict = {"sf_dir": SF_DIR, "cpus": CPUS, "runs": args.runs}
    if "q3c" in only:
        results["q3c"] = exp_q3c(eng, spark, args.runs, args.plans_dir)
    if "q13c" in only:
        results["q13c"] = exp_q13c(eng, spark, args.runs, args.plans_dir)
    if "q6" in only:
        results["q6"] = exp_q6(eng, spark, args.runs, args.plans_dir)
    if "q10" in only:
        results["q10"] = exp_q10(eng, spark, args.runs, args.plans_dir)
    if "minhash" in only:
        results["minhash"] = exp_minhash(
            eng, spark, args.runs, args.plans_dir, queries
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
