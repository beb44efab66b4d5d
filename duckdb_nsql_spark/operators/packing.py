"""Sequence packing: arrange variable-length documents into fixed-size
token windows for LLM training.

Two standard strategies, both deterministic and shard-parallel:

- :func:`pack_concat_chunks` — GPT-style "concatenate the shard's token
  stream, cut every ``budget`` tokens". Documents may straddle a chunk
  boundary; the output records each document's chunk index and token
  offset. Pure window arithmetic (cumulative sum per shard) — fully
  SQL-expressible, so the driver gate replays it in DuckDB verbatim.
- :func:`pack_first_fit` — no-straddle greedy packing: a document goes
  into the shard's current bin if it fits, else opens the next bin.
  Inherently sequential *per shard* (each placement depends on the
  previous fill level), so it runs as an Arrow-batched
  ``applyInPandas`` per shard; cross-shard it is embarrassingly
  parallel. The DuckDB oracle replays the same recurrence with a
  recursive CTE.

Shard assignment is the content-hash bucket from
:mod:`duckdb_nsql_spark.operators.sampling` — reproducible across runs
and engines. At 100 TB, ``n_shards`` is the packing parallelism (tens
of thousands); each shard's state is one integer, not the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .sampling import hash_bucket


def token_count(text: Column) -> Column:
    """Whitespace token count, identical to the DuckDB twin
    ``len(string_split_regex(trim(text), '\\s+'))`` (empty text counts
    1 — the empty-string token — in both engines)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def _sharded(
    df: DataFrame, id_col: str, text_col: str, n_shards: int
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        (hash_bucket(F.col(id_col), seed="pack") % n_shards)
        .cast("int")
        .alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )


def pack_concat_chunks(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
) -> DataFrame:
    """Concat-then-chunk packing: per shard (docs ordered by id), each
    document starts at the running token offset; ``chunk`` is the
    ``budget``-sized window containing that start, ``offset`` the
    position within it. One shuffle (the per-shard window sort)."""
    base = _sharded(df, id_col, text_col, n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / budget).cast("int").alias("chunk"),
        (start % budget).cast("int").alias("offset"),
    )


_PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("fill", T.IntegerType()),
    ]
)


def pack_first_fit(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
) -> DataFrame:
    """Greedy no-straddle packing per shard, docs in id order: place in
    the current bin iff ``fill + n_tokens <= budget``, else open the
    next bin (an oversized document occupies a bin alone and is
    truncated downstream). ``fill`` is the bin's level after placement.

    The recurrence is per-shard sequential state (one integer), so the
    shard is the parallelism unit: ``applyInPandas`` streams each
    shard's Arrow batches through a tight pandas loop. The DuckDB twin
    is a recursive CTE over ``row_number`` — replayed in the driver
    gate at test scale.
    """
    base = _sharded(df, id_col, text_col, n_shards)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills = [], []
        cur_bin, cur_fill = 0, 0
        first = True
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if first:
                cur_bin, cur_fill, first = 0, tok, False
            elif cur_fill + tok <= budget:
                cur_fill += tok
            else:
                cur_bin += 1
                cur_fill = tok
            bins.append(cur_bin)
            fills.append(cur_fill)
        pdf["bin"] = pd.Series(bins, dtype="int32")
        pdf["fill"] = pd.Series(fills, dtype="int32")
        return pdf

    return (
        base.withColumn("n_tokens", F.col("n_tokens").cast("int"))
        .groupBy("shard")
        .applyInPandas(pack, _PACK_SCHEMA)
    )
