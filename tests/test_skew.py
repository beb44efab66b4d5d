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
