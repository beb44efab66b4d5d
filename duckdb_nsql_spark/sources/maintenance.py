"""At-rest layout maintenance: small-file compaction and range
clustering — the OPTIMIZE / ZORDER analogs a 100 TB parquet lake needs.

Continuous ingest (streaming micro-batches, bulk-load loops) lands many
small files; scan parallelism then degrades to file-count scheduling
overhead and footer-read amplification. ``compact_parquet`` rewrites a
directory to ~``target_file_bytes`` files. ``cluster_parquet`` goes
further: a range partition + in-partition sort on the chosen columns
gives every output file a DISJOINT min/max range, so any engine's
row-group/file pruning (Spark's parquet filter pushdown, DuckDB's zone
maps) skips everything outside a predicate's range — the at-rest layout
IS the index.

Both rewrites are atomic at the directory level: write to a sibling
temp dir, then swap via rename (readers see old or new, never a mix) —
the same commit discipline as the durable warehouse's copy-on-write
pointer.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return out


def _atomic_swap(tmp_dir: str, path: str) -> None:
    old = path + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp_dir, path)
    shutil.rmtree(old, ignore_errors=True)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite a parquet directory to ceil(size/target) files.

    Returns {"files_before", "files_after", "bytes"}. Uses coalesce (a
    NARROW dependency — no shuffle; each output task reads a set of input
    files) rather than repartition: compaction must not pay a full
    shuffle of the data it is merely re-binning."""
    files_before = len(_data_files(path))
    size = _dir_bytes(path)
    n = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + f".compact-{uuid.uuid4().hex[:8]}"
    df.coalesce(n).write.parquet(tmp)
    _atomic_swap(tmp, path)
    return {
        "files_before": files_before,
        "files_after": len(_data_files(path)),
        "bytes": size,
    }


def cluster_parquet(
    spark: SparkSession,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Range-cluster a parquet directory on ``cols``: one range shuffle +
    per-partition sort, then atomic swap. Every output file covers a
    disjoint [min, max] slice of the leading column, so predicate scans
    prune whole files from the footer stats alone."""
    size = _dir_bytes(path)
    n = num_files or max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + f".cluster-{uuid.uuid4().hex[:8]}"
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.parquet(tmp)
    )
    _atomic_swap(tmp, path)
    return {"files": len(_data_files(path)), "bytes": size, "cols": cols}


def file_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) footer stats for ``column`` — the pruning
    metadata a clustered layout is judged by."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(_data_files(path)):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                if col.path_in_schema == column and col.statistics:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def overlap_count(ranges: list[tuple]) -> int:
    """Number of overlapping range pairs — 0 means perfectly disjoint
    files (maximal pruning)."""
    n = 0
    srt = sorted(ranges)
    for i in range(1, len(srt)):
        if srt[i][0] <= srt[i - 1][1]:
            n += 1
    return n


def zorder_parquet(
    spark: SparkSession,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 8,
) -> dict:
    """Z-ORDER a parquet directory on two columns (the OPTIMIZE ZORDER
    maintenance step): one range shuffle on the morton-interleaved
    z-value + per-partition sort, then atomic swap. Unlike
    ``cluster_parquet`` — whose linear sort gives perfect pruning on the
    LEADING column and none on the second — every z-ordered file covers
    a small RECTANGLE in (col_a, col_b) space, so footer min/max stats
    prune scans filtered on EITHER column (operators/layout.py holds
    the z-value algebra and the locality report)."""
    from ..operators.layout import zorder_repartition

    size = _dir_bytes(path)
    n = num_files or max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + f".zorder-{uuid.uuid4().hex[:8]}"
    zorder_repartition(df, col_a, col_b, bits=bits, n_partitions=n).write.parquet(tmp)
    _atomic_swap(tmp, path)
    return {
        "files": len(_data_files(path)),
        "bytes": size,
        "cols": [col_a, col_b],
    }
