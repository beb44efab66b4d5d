"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas pipelines.

The Spark-side architecture is the real deliverable here and is fully
implemented and tested: schema contract, mapInPandas batch shape,
partition sizing, and deterministic fake feature extraction. The actual
codec calls (PIL/librosa/ffmpeg) are NOT available in this container, so
``decode_image``/``decode_audio`` raise NotImplementedError behind a
clearly marked seam — swap in the real decoder on a cluster with the
libs installed; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# schema contract for a multimodal asset table
ASSET_SCHEMA = (
    "asset_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "asset_id bigint, kind string, n_bytes int, sha1 string, "
    "feat array<float>, decode_ok boolean"
)

_FEAT_DIM = 8


def decode_image(payload: bytes) -> object:
    """Real decoder seam — requires PIL, not present in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; install on the cluster and "
        "replace this seam — the surrounding pipeline is codec-agnostic"
    )


def decode_audio(payload: bytes) -> object:
    raise NotImplementedError(
        "audio decoding requires librosa/ffmpeg; install on the cluster "
        "and replace this seam"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for an encoder embedding: bytes of the
    sha1 digest scaled to [0,1). Lets the full pipeline (schema, batch
    shape, downstream joins) run and be asserted in tests."""
    digest = hashlib.sha1(payload).digest()
    return [b / 255.0 for b in digest[:_FEAT_DIM]]


def synth_assets(spark, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a synthetic asset table from the documents fixture: the text
    bytes stand in for an encoded payload (deterministic, reproducible)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def extract_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow ships each partition as pandas batches; work is per-batch
    vectorized where possible. At 100 TB: repartition upstream so each
    task holds ~128 MB of payloads, and the stage is embarrassingly
    parallel — no shuffle, no driver involvement.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "sha1": payloads.map(
                        lambda b: hashlib.sha1(bytes(b)).hexdigest()
                    ),
                    "feat": payloads.map(lambda b: _fake_features(bytes(b))),
                    "decode_ok": True,
                }
            )
            yield out

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp. Pure plan surgery (sequence+explode) — decoding the frame
    itself goes through the decode seam above."""
    return (
        assets.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("asset_id", "frame_ms", "payload")
    )
