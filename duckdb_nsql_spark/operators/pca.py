"""Deterministic PCA over an embedding column — the dimensionality-
reduction member of the embedding-pipeline family (next to PQ/IVF
quantization and SemDeDup clustering).

Principal component by POWER ITERATION with the repo's exact-DECIMAL
discipline (the semantic_dedup/dec_cosine approach): every data-sized
sum is an exact decimal aggregate (order-independent), every float
operation is a SINGLE double op on identical exact inputs followed by a
quantizing round — so the learned component and all projection scores
are bit-identical on any engine/partitioning, and the DuckDB oracle
replays the whole iteration with unrolled CTEs.

Algorithm (iters fixed, no convergence collect):
  1. quantize elements to DECIMAL(12,6); per-dim mean (exact sum, one
     division, re-quantized 6 dp)
  2. covariance C = sum of per-vector outer products — ONE (i, j)-keyed
     aggregate whose output is dim^2 rows regardless of corpus size
     (the classic distributed Gram/covariance shuffle; partial
     aggregation reduces map-side)
  3. v <- C.v, max-abs-normalized (avoids the sqrt of an L2 norm:
     divide by max|component| — one double division per dim, 6-dp
     requantize), repeated ``iters`` times from the all-ones start
  4. scores: pc1_i = centered_i . v (exact decimal dot, 4-dp round)

Sign follows the deterministic iteration (power iteration converges to
one of +/-PC1; both engines take the identical path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import dec_quantize

PCA_ITERS = 3


def embedding_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = PCA_ITERS,
) -> DataFrame:
    """First-principal-component projection scores ``(vec_id, pc1)``."""
    cells = df.select(
        id_col,
        F.posexplode(dec_quantize(F.col(vec_col))).alias("p", "x"),
    ).select(id_col, (F.col("p") + 1).alias("d"), "x")
    mean = cells.groupBy("d").agg(
        F.round(F.sum("x").cast("double") / F.count("*"), 6)
        .cast("decimal(12,6)")
        .alias("m")
    )
    cx = cells.join(F.broadcast(mean), "d").select(
        id_col, "d", (F.col("x") - F.col("m")).cast("decimal(13,6)").alias("cx")
    )
    a = cx.select(F.col(id_col).alias("_id"), F.col("d").alias("i"),
                  F.col("cx").alias("cxi"))
    b = cx.select(F.col(id_col).alias("_id"), F.col("d").alias("j"),
                  F.col("cx").alias("cxj"))
    cov = (
        a.join(b, "_id")
        .groupBy("i", "j")
        .agg(
            F.round(F.sum(F.col("cxi") * F.col("cxj")).cast("double"), 6)
            .cast("decimal(18,6)")
            .alias("cij")
        )
    )
    v = mean.select("d", F.lit(1).cast("decimal(12,6)").alias("vv"))
    for _ in range(iters):
        raw = (
            cov.join(F.broadcast(v.withColumnRenamed("d", "j")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("cij") * F.col("vv")).alias("raw"))
        )
        mx = raw.agg(
            F.max(F.abs(F.col("raw").cast("double"))).alias("mx")
        )
        v = raw.crossJoin(F.broadcast(mx)).select(
            F.col("i").alias("d"),
            F.round(F.col("raw").cast("double") / F.col("mx"), 6)
            .cast("decimal(12,6)")
            .alias("vv"),
        )
    return (
        cx.join(F.broadcast(v), "d")
        .groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("cx") * F.col("vv")).cast("double"), 4)
            .alias("pc1")
        )
    )
