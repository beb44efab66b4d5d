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


def decontaminate_stream(
    docs: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming benchmark decontamination: flag documents on a
    CONTINUOUS ingest stream that share any word n-gram with a static
    evaluation set — the hygiene gate applied at ingest time instead of
    as a batch backfill.

    Plan shape: the eval set's distinct gram hashes collapse to ONE
    array row (benchmark-sized, a few MB at worst) that broadcast-joins
    into every micro-batch on a constant key; per-document hits are then
    ``size(array_intersect(distinct doc grams, eval grams))`` — a
    map-only, STATELESS expression, so the stream needs no watermark and
    no state store, and emits in append mode. Hit counts are exactly the
    batch operator's countDistinct (operators/text.py:decontaminate);
    over a finite backlog the output is row-identical to batch, which is
    the oracle."""
    from ..operators.text import ngram_hashes

    eval_arr = (
        eval_set.select(
            F.explode(ngram_hashes(F.col(text_col), n)).alias("g")
        )
        .distinct()
        .agg(F.collect_list("g").alias("__eval_grams"))
        .withColumn("__k", F.lit(1))
    )
    hits = F.size(
        F.array_intersect(
            F.array_distinct(ngram_hashes(F.col(text_col), n)),
            F.col("__eval_grams"),
        )
    )
    return (
        docs.withColumn("__k", F.lit(1))
        .join(F.broadcast(eval_arr), "__k")
        .select(
            id_col,
            hits.cast("int").alias("n_hits"),
            (hits > 0).alias("contaminated"),
        )
    )


def bloom_decontaminate_stream(
    docs: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    m_bits: int = 4096,
    k_hashes: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming Bloom-filter decontamination: the fixed-memory variant
    of :func:`decontaminate_stream` — the static eval set reduces to an
    ``m_bits``-bit filter (one sorted-int-array row) instead of the full
    gram array, so the broadcast stays constant-size however large the
    benchmark suite grows. Per-document hits are a map-only, STATELESS
    expression (a gram hits when all ``k_hashes`` salted-md5 positions
    are set); no watermark, no state store, append mode. Over a finite
    backlog the output is row-identical to the batch operator
    (operators/text.py:bloom_decontaminate), which is the oracle —
    deterministic false positives included."""
    from ..operators.text import (
        _bloom_bitstring,
        _bloom_pos,
        _bloom_probe,
        ngram_hashes,
    )

    eval_bits = (
        eval_set.select(
            F.explode(ngram_hashes(F.col(text_col), n)).alias("g")
        )
        .select(
            F.explode(
                F.array(*[_bloom_pos(F.col("g"), j, m_bits)
                          for j in range(k_hashes)])
            ).alias("p")
        )
        .agg(F.collect_set("p").alias("__pset"))
        .select(_bloom_bitstring(F.col("__pset"), m_bits).alias("__bits"))
        .withColumn("__k", F.lit(1))
    )

    def g_hits(g):
        hit = F.lit(True)
        for j in range(k_hashes):
            hit = hit & _bloom_probe(F.col("__bits"), g, j, m_bits)
        return hit

    grams = F.array_distinct(ngram_hashes(F.col(text_col), n))
    n_hits = F.size(F.filter(grams, g_hits))
    return (
        docs.withColumn("__k", F.lit(1))
        .join(F.broadcast(eval_bits), "__k")
        .select(
            id_col,
            F.size(grams).cast("int").alias("n_grams"),
            n_hits.cast("int").alias("n_hits"),
            (n_hits > 0).alias("flagged"),
        )
    )


def neardup_stream(
    docs_with_ts: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming NEAR-dup gate: watermark-bounded dedup on the full
    16-slot minhash signature (one band over all slots — documents
    whose shingle minima all agree, i.e. near-identical content beyond
    byte equality, emit once within the watermark horizon). The
    signature construction is the batch minhash operator's
    (operators/dedup.py, md5-deterministic), so batch backfill and
    streaming ingest agree on the surviving signature set; state is
    bounded by the watermark exactly like the exact-dedup stream."""
    from ..operators.dedup import minhash_bands_udf
    from ..operators.text import normalize_text

    # the band UDF emits 16-byte digests (round-12 store compaction);
    # this operator's contract (and its DuckDB oracle) is the lowercase
    # md5 HEX of the joined signature — re-hex at the boundary
    sig_fn = minhash_bands_udf(16, 1)
    sigd = docs_with_ts.withColumn(
        "sig",
        F.lower(F.hex(sig_fn(normalize_text(F.col(text_col)))[0])),
    )
    return sigd.withWatermark(
        time_col, watermark
    ).dropDuplicatesWithinWatermark(["sig"])


def sample_stream(
    docs: DataFrame,
    rate: float = 0.2,
    key_col: str = "doc_id",
    seed: str = "ssample:",
) -> DataFrame:
    """Deterministic Bernoulli sampling on a stream: a document is kept
    iff its md5 hash-bucket falls under ``rate`` — stateless, map-only,
    and REPLAY-STABLE (the decision is a pure function of the key, so
    micro-batch retries, backfills, and the batch twin all keep exactly
    the same rows; rand()-based sampling would violate exactly-once on
    any retry). The streaming counterpart of
    operators/sampling.hash_bucket-based stratified sampling; a finite
    backlog is row-identical to the batch filter, so one oracle pins
    both."""
    from ..operators.sampling import hash_bucket

    return docs.filter(
        hash_bucket(F.col(key_col), 10_000, seed=seed)
        < F.lit(int(round(rate * 10_000)))
    )


def hll_register_stream(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Streaming HyperLogLog register maintenance — distinct counting on
    an infinite stream with FIXED state (|groups| x 64 registers,
    forever), where exact streaming count-distinct would grow without
    bound. The map side (word explode -> md5 -> register cell) is the
    SAME stateless expression set as the batch sketch
    (operators/sketches.py:hll_cells), and the stateful part is one
    ``groupBy(group, idx).max(rho)`` — max is order- and
    duplication-insensitive, so micro-batch boundaries, replays, and
    retries can never corrupt the sketch. Finalize the materialized
    register table with ``sketches.hll_finalize`` to read the estimate
    at any point in the stream's life."""
    from ..operators import sketches

    words = sketches.hll_words(docs, group_col, text_col)
    return (
        sketches.hll_cells(words, group_col)
        .groupBy(group_col, "idx")
        .agg(F.max("rho").alias("m"))
    )


def cms_counter_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming Count-Min counter maintenance — frequency tracking on
    an infinite stream with FIXED state (3 x 512 counters forever).
    The map side (word explode -> 3 md5 bucket cells) is the SAME
    stateless expression set as the batch sketch
    (operators/sketches.py:cms_cells); the stateful part is one
    additive ``groupBy(j, bucket).count()``, so micro-batch boundaries
    commute with the final counts. Probe the materialized counter table
    exactly like the batch sketch's."""
    from ..operators import sketches

    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("w")
    )
    return sketches.cms_cells(words).groupBy("j", "bucket").count()
