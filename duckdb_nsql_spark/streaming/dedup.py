"""Streaming deduplication + streaming document pipeline operators.

The LLM-data-pipeline counterpart of operators/dedup.py and
operators/text.py, expressed over Structured Streaming so continuous
ingest (kafka/file backlog) dedups and profiles incrementally instead of
re-running batch jobs:

- ``dedup_exact_stream``: exact dedup keyed on arbitrary columns with
  state BOUNDED by the event-time watermark
  (``dropDuplicatesWithinWatermark``) — the only shape whose state
  doesn't grow without bound on an infinite stream. Keys shuffle once;
  state store volume is |distinct keys within watermark|.
- ``dedup_fingerprint_stream``: content dedup — normalize text, take the
  128-bit md5 fingerprint (identical construction to
  operators/dedup.py:exact_duplicates, so batch and stream agree on what
  a duplicate IS), then watermark-bounded key dedup.
- ``read_documents_stream`` + ``profile_stream``: map-only text
  profiling (length/words/tokens/punct/fingerprint) on a document
  stream; stateless, zero shuffles — each micro-batch is pure codegen'd
  column work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the documents parquet (single file or dir)."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        directory, fname = os.path.split(path)
        return reader.option("pathGlobFilter", fname).parquet(directory)
    return reader.parquet(path)


def dedup_exact_stream(
    events: DataFrame,
    key_cols: list[str] | tuple[str, ...] = ("event_id",),
    time_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermark-bounded exact dedup: a key seen twice within the
    watermark horizon emits once; state for keys older than the
    watermark is dropped. ``dropDuplicates`` without the watermark bound
    would keep every key forever — a state-store OOM on any real stream."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def dedup_fingerprint_stream(
    docs_with_ts: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Content-exact dedup on a streaming corpus: same normalize+md5
    fingerprint as the batch operator (operators/dedup.py), then
    watermark-bounded key dedup, so batch backfill and streaming ingest
    produce the same survivor set."""
    normalized = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    fp = docs_with_ts.withColumn("fingerprint", F.md5(normalized))
    return fp.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def profile_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless per-document profile on a stream — identical expressions
    to operators/text.py:text_profile (single source of truth for the
    oracle SQL lives there); no watermark needed, map-only."""
    from ..operators import text as text_ops

    return text_ops.text_profile(docs)


def run_available_now(df: DataFrame, spark: SparkSession, name: str,
                      output_mode: str = "append") -> DataFrame:
    """Drain a finite stream through a memory sink (test/bench harness
    path; production writes a real sink with the same plan)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
