"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY §1.1 — no stream abstraction), so
this module is the Spark-side extension: tumbling/sliding/session window
aggregation with watermarks, plus a custom stateful operator via
applyInPandasWithState. The parquet events fixture drives the streams in
tests (file source + memory sink + processAllAvailable), which exercises
the identical plan the kafka source would run at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet.

    ``max_files_per_trigger`` bounds each micro-batch (respected by
    availableNow triggers too) — the knob that turns a file backlog into
    an incremental replay instead of one giant batch.

    The parquet footer decides the ``ts`` read schema: TIMESTAMP(NANOS)
    columns (which Spark's reader only surfaces as epoch-nanos longs under
    ``nanosAsLong``) are read as LongType and cast back to timestamps,
    truncating to micros — exactly what the batch path in
    io_utils.read_parquet_table does. Micros/millis columns are read with
    TimestampType directly; no unit arithmetic is applied to them.
    """
    import os

    from ..io_utils import _nanos_timestamp_columns

    ts_is_nanos = "ts" in _nanos_timestamp_columns(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(
                "ts", T.LongType() if ts_is_nanos else T.TimestampType()
            ),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # Spark's file stream source wants a directory; when handed a single
    # file, stream its parent dir with a glob filter on the file name
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        directory, fname = os.path.split(path)
        df = reader.option("pathGlobFilter", fname).parquet(directory)
    else:
        df = reader.parquet(path)
    if ts_is_nanos:
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
        )
    return df


def tumbling_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data watermark.

    State is bounded by the watermark; the aggregation shuffles on
    (window, event_type) with map-side partials — the standard scalable
    streaming agg shape.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total",
        )
    )


def stream_stream_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each ``right_type``
    event to the ``left_type`` events of the same user in the preceding
    ``within`` interval (the click→purchase attribution shape).

    Both sides carry watermarks and the join condition carries the time
    bound — the two ingredients Spark needs to age join state out instead
    of buffering both streams forever; at scale the state store holds only
    ``watermark`` worth of events per side. Append-mode output: each
    matched pair is emitted exactly once, so the finite-input replay is
    row-identical to the batch join (the DuckDB oracle).
    """
    left = (
        events.filter(F.col("event_type") == left_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("left_id"),
            "user_id",
            F.col("ts").alias("left_ts"),
        )
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("right_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("right_ts"),
        )
    )
    joined = left.join(
        right,
        (F.col("user_id") == F.col("r_user"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    )
    return joined.select("left_id", "right_id", "user_id", "left_ts", "right_ts")


def run_stream_to_memory(
    stream_df: DataFrame, name: str, mode: str = "complete"
) -> DataFrame:
    """Drive a finite file-source stream to completion into a memory sink
    and return the materialized result (test/bench harness)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    spark = stream_df.sparkSession
    return spark.table(name)
