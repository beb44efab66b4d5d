"""Introspection statements: SUMMARIZE, DESCRIBE, PRAGMA table_info/show_tables.

Shapes match DuckDB's output column-for-column, because the reference's
harness introspects them directly (validation_sql ``DESCRIBE customers`` at
/root/reference/eval/data/dev.json:454,494,502,526; ``PRAGMA table_info`` at
:252; ``SUMMARIZE`` at :188,548; version at :244).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .types import spark_type_to_duckdb

ENGINE_VERSION = "v1.0.0-spark"
ENGINE_SOURCE_ID = "duckdb-nsql-spark"

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def describe_df(spark: SparkSession, df: DataFrame) -> DataFrame:
    """DuckDB ``DESCRIBE`` shape: column_name, column_type, null, key, default, extra."""
    rows = [
        (f.name, spark_type_to_duckdb(f.dataType), "YES" if f.nullable else "NO", None, None, None)
        for f in df.schema.fields
    ]
    schema = T.StructType(
        [
            T.StructField("column_name", T.StringType(), False),
            T.StructField("column_type", T.StringType(), False),
            T.StructField("null", T.StringType(), False),
            T.StructField("key", T.StringType(), True),
            T.StructField("default", T.StringType(), True),
            T.StructField("extra", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def table_info_df(spark: SparkSession, df: DataFrame) -> DataFrame:
    """DuckDB ``PRAGMA table_info('t')`` shape (dev.json:252):
    cid, name, type, notnull, dflt_value, pk."""
    rows = [
        (i, f.name, spark_type_to_duckdb(f.dataType), not f.nullable, None, False)
        for i, f in enumerate(df.schema.fields)
    ]
    schema = T.StructType(
        [
            T.StructField("cid", T.IntegerType(), False),
            T.StructField("name", T.StringType(), False),
            T.StructField("type", T.StringType(), False),
            T.StructField("notnull", T.BooleanType(), False),
            T.StructField("dflt_value", T.StringType(), True),
            T.StructField("pk", T.BooleanType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def version_df(spark: SparkSession) -> DataFrame:
    """``PRAGMA version`` / ``CALL pragma_version()`` shape (dev.json:244)."""
    schema = T.StructType(
        [
            T.StructField("library_version", T.StringType(), False),
            T.StructField("source_id", T.StringType(), False),
        ]
    )
    return spark.createDataFrame([(ENGINE_VERSION, ENGINE_SOURCE_ID)], schema)


def summarize_df(spark: SparkSession, df: DataFrame) -> DataFrame:
    """DuckDB ``SUMMARIZE`` (dev.json:188,548): one row per column with
    min/max/approx_unique/avg/std/q25/q50/q75/count/null_percentage.

    Single aggregation job over the input (one pass, map-side partials —
    scales to arbitrarily wide/deep tables); the 1×C result is reshaped
    driver-side into the C-row DuckDB layout.
    """
    fields = df.schema.fields
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for i, f in enumerate(fields):
        c = F.col(f.name)
        is_num = isinstance(f.dataType, _NUMERIC)
        is_complex = isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
        )
        if is_complex:
            aggs += [
                F.lit(None).cast("string").alias(f"min_{i}"),
                F.lit(None).cast("string").alias(f"max_{i}"),
                F.lit(None).cast("long").alias(f"uniq_{i}"),
            ]
        else:
            aggs += [
                F.min(c).cast("string").alias(f"min_{i}"),
                F.max(c).cast("string").alias(f"max_{i}"),
                F.approx_count_distinct(f.name).alias(f"uniq_{i}"),
            ]
        if is_num:
            aggs += [
                F.avg(c).cast("double").alias(f"avg_{i}"),
                F.stddev(c).cast("double").alias(f"std_{i}"),
                # one sketch for all three quantiles, not three sketches;
                # accuracy 1000 (~0.1% rank error) — DuckDB SUMMARIZE
                # quantiles are approximate too, and the default 10000
                # dominated the whole statement's runtime (~0.5 s of
                # 0.9 s on 150k-row orders at sf0.1)
                F.percentile_approx(c, [0.25, 0.5, 0.75], 1000)
                .cast("array<double>")
                .alias(f"qs_{i}"),
            ]
        aggs.append(F.count(c).alias(f"cnt_{i}"))
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    out_rows = []
    for i, f in enumerate(fields):
        is_num = isinstance(f.dataType, _NUMERIC)
        cnt = row[f"cnt_{i}"]
        null_pct = round(100.0 * (n - cnt) / n, 2) if n else 0.0
        qs = row[f"qs_{i}"] if is_num else None
        out_rows.append(
            (
                f.name,
                spark_type_to_duckdb(f.dataType),
                row[f"min_{i}"],
                row[f"max_{i}"],
                row[f"uniq_{i}"],
                float(row[f"avg_{i}"]) if is_num and row[f"avg_{i}"] is not None else None,
                float(row[f"std_{i}"]) if is_num and row[f"std_{i}"] is not None else None,
                float(qs[0]) if qs else None,
                float(qs[1]) if qs else None,
                float(qs[2]) if qs else None,
                n,
                null_pct,
            )
        )
    schema = T.StructType(
        [
            T.StructField("column_name", T.StringType(), False),
            T.StructField("column_type", T.StringType(), False),
            T.StructField("min", T.StringType(), True),
            T.StructField("max", T.StringType(), True),
            T.StructField("approx_unique", T.LongType(), True),
            T.StructField("avg", T.DoubleType(), True),
            T.StructField("std", T.DoubleType(), True),
            T.StructField("q25", T.DoubleType(), True),
            T.StructField("q50", T.DoubleType(), True),
            T.StructField("q75", T.DoubleType(), True),
            T.StructField("count", T.LongType(), False),
            T.StructField("null_percentage", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(out_rows, schema)
