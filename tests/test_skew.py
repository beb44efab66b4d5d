"""Salting utilities must be result-identical to their plain equivalents."""

from pyspark.sql import functions as F

from duckdb_nsql_spark.operators import skew


def test_salted_aggregate_equals_plain(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = skew.salted_aggregate(
        df,
        keys=["l_returnflag"],
        aggs={
            "total_qty": ("l_quantity", "sum"),
            "n": ("l_orderkey", "count"),
            "max_price": ("l_extendedprice", "max"),
        },
        salt_buckets=8,
    )
    plain = df.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("total_qty"),
        F.count("l_orderkey").alias("n"),
        F.max("l_extendedprice").alias("max_price"),
    )
    s = {r["l_returnflag"]: (round(r["total_qty"], 4), r["n"], r["max_price"])
         for r in salted.collect()}
    p = {r["l_returnflag"]: (round(r["total_qty"], 4), r["n"], r["max_price"])
         for r in plain.collect()}
    assert s == p


def test_salted_join_equals_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    hot = [r["o_orderkey"] for r in orders.limit(3).collect()]
    salted = skew.salted_join(lineitem, orders, "o_orderkey", hot_keys=hot)
    plain = lineitem.join(orders, "o_orderkey")
    assert salted.count() == plain.count()
    s = sorted((r["o_orderkey"], r["l_quantity"], r["o_custkey"])
               for r in salted.collect())
    p = sorted((r["o_orderkey"], r["l_quantity"], r["o_custkey"])
               for r in plain.collect())
    assert s == p


def test_salted_join_rejects_outer(spark, sf_dir):
    import pytest
    from duckdb_nsql_spark.operators import skew

    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner.*left"):
        skew.salted_join(df, df, "k", hot_keys=[1], how="right")
    with pytest.raises(ValueError):
        skew.salted_join(df, df, "k", hot_keys=[1], how="full")


def test_layout_recommendation_drives_cluster_choice(spark):
    """The q13 CLUSTER BY mitigation must be DERIVABLE from the skew
    report, not prose — and the default gate must AGREE with the bench:
    at sf0.1 (600k fact rows) the measured clustered layout is SLOWER
    than the plain join (BASELINE §8 crossover), so the default says
    'none' there; scaling only the row count to the sf10 bench point
    flips the same report to 'cluster' — the layout q13_clustered
    measures winning (2.24 vs 3.06 s)."""
    import duckdb_nsql_spark.operators.skew as sk
    import duckdb_nsql_spark.workload as w

    rec = {
        (r["table_name"], r["key_name"]): r
        for r in w.op_layout_recommendation(
            spark, "/root/testdata/sf0.1"
        ).collect()
    }
    li = rec[("lineitem", "l_orderkey")]
    # uniform (hot key < 8x fair share) but below the measured cluster
    # crossover -> default 'none', exactly matching the sf0.1 bench
    assert li["recommendation"] == "none"
    assert li["skew_ratio"] < 8.0
    # the sf10 bench point: same distribution, 100x the rows -> cluster
    scaled = sk.recommend_layout(
        w.op_join_skew_report(spark, "/root/testdata/sf0.1").withColumn(
            "n_rows", F.col("n_rows") * 100
        )
    ).collect()
    srec = {(r["table_name"], r["key_name"]): r for r in scaled}
    assert srec[("lineitem", "l_orderkey")]["recommendation"] == "cluster"
    # dim-scale keys: no layout change, broadcast handles them
    assert rec[("orders", "o_custkey")]["recommendation"] == "none"
    assert rec[("events", "user_id")]["recommendation"] == "none"


def test_layout_recommendation_salt_path_executable(spark):
    """Degenerate key distribution -> the report says 'salt' -> the
    salted join is result-identical to the plain join AND Spark's AQE
    skew-join actually engages on the unsalted SMJ (skew=true pinned in
    the executed plan with test-scaled thresholds) — the full
    diagnose -> decide -> execute loop for the skewed case."""
    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.concat(F.lit("x" * 50), F.col("id")).alias("v"),
    )
    right = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )

    rep = skew.join_key_report(left, "k", "left_fact")
    rec = skew.recommend_layout(rep).collect()[0]
    # half the rows in one key: relatively AND absolutely hot
    assert rec["recommendation"] == "salt"
    assert rec["skew_ratio"] >= 8.0 and rec["top1_share"] >= 0.001

    # execute the recommendation: salted join == plain join
    salted = skew.salted_join(left, right, "k", hot_keys=[0], salt_buckets=8)
    plain = left.join(right, "k")
    assert salted.count() == plain.count()

    # AQE alternative on the unsalted SMJ: skew split engages
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = left.join(right, "k")
        j.collect()  # j's own execution -> final adaptive plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_layout_recommendation_drives_agg_cluster_choice(engine, sf_dir):
    """The q3/B3 mitigation: recommend_layout covers GROUP BY keys, not
    just join keys. Decision: orders/o_custkey is uniform (skew_ratio <
    8), below the crossover at sf0.1 -> 'none'; at the sf10 bench point
    (same distribution, 100x rows >= cluster_min_rows) -> 'cluster'.
    Execution: a table CLUSTER BY (o_custkey) aggregates on the key with
    ZERO exchanges (the bucketed scan's HashPartitioning satisfies the
    aggregate's ClusteredDistribution), and the result is row-identical
    to the plain-layout aggregate."""
    import duckdb_nsql_spark.operators.skew as sk

    engine.register_parquet_dir(sf_dir)
    orders = engine.table("orders")
    rep = sk.join_key_report(orders, "o_custkey", "orders")
    small = sk.recommend_layout(rep).collect()[0]
    assert small["recommendation"] == "none"  # sub-crossover scale
    assert small["skew_ratio"] < 8.0  # uniform: salting never applies
    # simulate the sf10 bench point: rows AND key cardinality both scale
    # (o_custkey NDV grows with the customer table)
    scaled = sk.recommend_layout(
        rep.withColumn("n_rows", F.col("n_rows") * 10_000)
        .withColumn("n_keys", F.col("n_keys") * 1_000)
        .withColumn("top1_share", F.col("top1_share") / 1_000)
    ).collect()[0]
    assert scaled["recommendation"] == "cluster"  # the sf10+ decision
    # LOW-cardinality key at fact scale stays 'none' (round-12 q12
    # finding: 25-key window bucketing measured 5x WORSE at sf10 — a
    # bucketed layout with fewer keys than buckets serializes the
    # operator)
    lowcard = sk.recommend_layout(
        rep.withColumn("n_rows", F.col("n_rows") * 10_000)
        .withColumn("n_keys", F.lit(25))
        .withColumn("top1_share", F.lit(1.0 / 25))
    ).collect()[0]
    assert lowcard["recommendation"] == "none"

    # execute the recommendation through the engine's CLUSTER BY seam
    engine.execute(
        "CREATE OR REPLACE TABLE orders_bk CLUSTER BY (o_custkey)"
        " INTO 8 BUCKETS AS SELECT o_custkey, o_totalprice FROM orders"
    )
    agg_sql = (
        "SELECT o_custkey, round(sum(o_totalprice), 2) AS balance"
        " FROM {t} GROUP BY o_custkey ORDER BY o_custkey"
    )
    clustered = engine.execute(agg_sql.format(t="orders_bk"))
    plan = clustered._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # agg shuffle deleted at rest
    assert "Bucketed: true" in plan, plan
    plain = engine.execute(agg_sql.format(t="orders"))
    assert [tuple(r) for r in clustered.collect()] == [
        tuple(r) for r in plain.collect()
    ]
    engine.execute("DROP TABLE IF EXISTS orders_bk")
