"""Multi-dimensional data layout: Z-ORDER clustering.

The at-rest layout operator for two-dimensional access patterns (Delta
``OPTIMIZE ZORDER BY``, Iceberg sort orders): interleaving the bits of
two quantized key columns gives a single sort key whose contiguous
ranges are small RECTANGLES in (a, b) space — so parquet row-group
min/max stats stay narrow on BOTH columns at once, and a filter on
either column skips most of the files of a z-sorted table. A plain
single-column sort gives perfect pruning on one column and none on the
other; linear z-ordering splits the difference, which is the right
at-rest choice when 100 TB of scans filter on either dimension.

Everything here is exact integer arithmetic (bit shifts, masks,
quantization against a max), so a DuckDB oracle replays the z-values
and the per-bucket locality stats bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a8: Column, b8: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two ints: z = morton(a, b)
    with a on the even bit positions and b on the odd ones. Pure
    shift/mask arithmetic — codegen'd, exact, engine-portable."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a8, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(b8, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def quantize(col: Column, max_col: Column, cells: int = 256) -> Column:
    """Map a non-negative column into [0, cells): floor(x * cells /
    (max+1)). Integer-exact for integer inputs; for doubles the floor
    is taken after one multiply+divide, identically on both engines."""
    return F.floor(col * cells / (max_col + F.lit(1))).cast("int")


def zorder_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    bucket_shift: int = 10,
) -> DataFrame:
    """Z-order LOCALITY REPORT: quantize (col_a, col_b) to 2^bits cells
    each, compute the interleaved z-value, group into z-BUCKETS
    (z >> bucket_shift — contiguous z ranges = rectangles), and report
    each bucket's row count and min/max extent on BOTH quantized
    dimensions. Narrow extents on both axes are exactly the property
    that makes parquet min/max stats prune a z-sorted table on either
    filter column — the report is the pruning evidence a layout
    decision is made on.

    Scale shape: one map-only projection (quantize + shifts) after two
    broadcast scalars (the column maxima), then ONE aggregate keyed by
    the bounded bucket id (≤ 2^(2*bits - bucket_shift) groups however
    large the table).
    """
    maxes = df.agg(
        F.max(col_a).alias("ma"), F.max(col_b).alias("mb")
    )
    q = df.crossJoin(F.broadcast(maxes)).select(
        quantize(F.col(col_a), F.col("ma"), 1 << bits).alias("xa"),
        quantize(F.col(col_b), F.col("mb"), 1 << bits).alias("xb"),
    )
    z = q.withColumn(
        "zbucket",
        F.shiftright(zvalue(F.col("xa"), F.col("xb"), bits), bucket_shift)
        .cast("int"),
    )
    return z.groupBy("zbucket").agg(
        F.count("*").cast("long").alias("n"),
        F.min("xa").alias("min_a"),
        F.max("xa").alias("max_a"),
        F.min("xb").alias("min_b"),
        F.max("xb").alias("max_b"),
    )


def zorder_repartition(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_partitions: int | None = None,
) -> DataFrame:
    """Physically z-sort a table: range-partition on the z-value and
    sort within partitions, so every output file covers one contiguous
    z range (one rectangle). Write the result with plain
    ``.write.parquet`` and row-group min/max stats carry the locality —
    the OPTIMIZE ZORDER step of an ingest pipeline. The z column is
    dropped from the output (it is derivable, not payload)."""
    maxes = df.agg(F.max(col_a).alias("ma"), F.max(col_b).alias("mb"))
    withz = df.crossJoin(F.broadcast(maxes)).withColumn(
        "__z",
        zvalue(
            quantize(F.col(col_a), F.col("ma"), 1 << bits),
            quantize(F.col(col_b), F.col("mb"), 1 << bits),
            bits,
        ),
    ).drop("ma", "mb")
    part = withz.repartitionByRange(n_partitions, "__z") if n_partitions \
        else withz.repartitionByRange("__z")
    return part.sortWithinPartitions("__z").drop("__z")
