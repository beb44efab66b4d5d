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


def _sql_literal(v, dt: T.DataType) -> str:
    import math as _math

    ddl = dt.simpleString()
    if v is None:
        return f"CAST(NULL AS {ddl})"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and (_math.isnan(v) or _math.isinf(v)):
        return f"CAST('{v}' AS DOUBLE)"
    if isinstance(v, (int, float)):
        return f"CAST({v!r} AS {ddl})"
    if isinstance(v, (list, tuple)) and isinstance(dt, T.ArrayType):
        items = ", ".join(_sql_literal(x, dt.elementType) for x in v)
        return f"array({items})"
    s = str(v).replace("\\", "\\\\").replace("'", "''")
    return f"CAST('{s}' AS {ddl})"


def local_df(spark: SparkSession, rows: list, schema: T.StructType) -> DataFrame:
    """Build a tiny driver-side relation as a VALUES clause.

    ``spark.createDataFrame`` parallelizes Python rows into an
    ExistingRDD scan — every downstream action then launches one task
    *per default partition*, each spinning a Python worker to unpickle a
    handful of rows (~0.25 s per statement for a 9-row SUMMARIZE, 32
    partitions). A VALUES literal becomes a LocalTableScan: pure JVM,
    zero tasks (~0.05 s)."""
    if not rows:
        nulls = ", ".join(f"CAST(NULL AS {f.dataType.simpleString()})"
                          for f in schema.fields)
        cols = ", ".join(f"`{f.name}`" for f in schema.fields)
        return spark.sql(
            f"SELECT * FROM (VALUES ({nulls})) AS t({cols}) WHERE 1 = 0"
        )
    vals = ", ".join(
        "(" + ", ".join(
            _sql_literal(v, f.dataType) for v, f in zip(r, schema.fields)
        ) + ")"
        for r in rows
    )
    cols = ", ".join(f"`{f.name}`" for f in schema.fields)
    return spark.sql(f"SELECT * FROM (VALUES {vals}) AS t({cols})")

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _type_name(
    f: T.StructField, fixed: dict | None, overrides: dict | None = None
) -> str:
    """DuckDB type text; fixed-size arrays (FLOAT[100], dev.json:492) keep
    their declared length, and declared ENUM/alias types their rendering —
    neither of which Spark's type system can carry."""
    if overrides and f.name in overrides:
        return overrides[f.name]
    name = spark_type_to_duckdb(f.dataType)
    if fixed and f.name in fixed and name.endswith("[]"):
        name = f"{name[:-2]}[{fixed[f.name]}]"
    return name


def describe_df(
    spark: SparkSession,
    df: DataFrame,
    fixed: dict | None = None,
    overrides: dict | None = None,
    notnull: set | None = None,
    pk: set | None = None,
    uni: set | None = None,
) -> DataFrame:
    """DuckDB ``DESCRIBE`` shape: column_name, column_type, null, key,
    default, extra. DuckDB reports 'NO' only for DECLARED NOT NULL /
    PRIMARY KEY columns (round-12 probe: parquet-backed tables and
    views are all 'YES' regardless of the parquet required flag), so
    nullability comes from the session's declaration set, never the
    Spark schema; PRIMARY KEY columns carry key='PRI'."""
    nn = {c.lower() for c in (notnull or ())}
    pks = {c.lower() for c in (pk or ())}
    unis = {c.lower() for c in (uni or ())}
    rows = [
        (f.name, _type_name(f, fixed, overrides),
         "NO" if f.name.lower() in nn or f.name.lower() in pks
         else "YES",
         "PRI" if f.name.lower() in pks
         else "UNI" if f.name.lower() in unis else None,
         None, None)
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
    return local_df(spark, rows, schema)


def table_info_df(
    spark: SparkSession,
    df: DataFrame,
    fixed: dict | None = None,
    overrides: dict | None = None,
    notnull: set | None = None,
    pk: set | None = None,
) -> DataFrame:
    """DuckDB ``PRAGMA table_info('t')`` shape (dev.json:252):
    cid, name, type, notnull, dflt_value, pk. notnull/pk reflect
    DECLARED constraints only (see describe_df)."""
    nn = {c.lower() for c in (notnull or ())}
    pks = {c.lower() for c in (pk or ())}
    rows = [
        (i, f.name, _type_name(f, fixed, overrides),
         f.name.lower() in nn or f.name.lower() in pks, None,
         f.name.lower() in pks)
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
    return local_df(spark, rows, schema)


def storage_info_df(
    spark: SparkSession,
    df: DataFrame,
    file_hint: str | None = None,
    fixed: dict | None = None,
) -> DataFrame:
    """``PRAGMA storage_info('t')``: one row per (row_group, column) of the
    table's at-rest parquet, straight from the footers — no Spark job.

    DuckDB reports its native block layout; the parquet row group is this
    engine's storage unit, so the shape maps: row_group_id, column_name,
    segment_type, count, compression, plus the footer's min/max stats
    (the stats DuckDB's zone maps serve). In-memory tables (DML results
    not yet copied out) report a single pseudo-group with NULL counts.
    """
    schema = T.StructType(
        [
            T.StructField("row_group_id", T.LongType(), False),
            T.StructField("column_name", T.StringType(), False),
            T.StructField("segment_type", T.StringType(), False),
            T.StructField("count", T.LongType(), True),
            T.StructField("compression", T.StringType(), True),
            T.StructField("stats_min", T.StringType(), True),
            T.StructField("stats_max", T.StringType(), True),
            T.StructField("has_null", T.BooleanType(), True),
        ]
    )
    rows: list[tuple] = []
    type_of = {f.name: _type_name(f, fixed) for f in df.schema.fields}
    if file_hint:
        try:
            import glob as globmod
            import os

            import pyarrow.parquet as pq

            if any(ch in file_hint for ch in "*?["):
                files = sorted(globmod.glob(file_hint))
            elif os.path.isdir(file_hint):
                files = sorted(
                    globmod.glob(os.path.join(file_hint, "**", "*.parquet"),
                                 recursive=True)
                )
            else:
                files = [file_hint]
            gid = 0
            for fp in files:
                meta = pq.ParquetFile(fp).metadata
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        name = col.path_in_schema.split(".")[0]
                        st = col.statistics
                        rows.append(
                            (
                                gid,
                                name,
                                type_of.get(name, str(col.physical_type)),
                                col.num_values,
                                str(col.compression),
                                str(st.min) if st and st.has_min_max else None,
                                str(st.max) if st and st.has_min_max else None,
                                bool(st.null_count) if st else None,
                            )
                        )
                    gid += 1
        except Exception:  # noqa: BLE001 — fall through to schema-only rows
            rows = []
    if not rows:
        rows = [
            (0, f.name, type_of[f.name], None, "UNCOMPRESSED", None, None, None)
            for f in df.schema.fields
        ]
    return local_df(spark, rows, schema)


def version_df(spark: SparkSession) -> DataFrame:
    """``PRAGMA version`` / ``CALL pragma_version()`` shape (dev.json:244)."""
    schema = T.StructType(
        [
            T.StructField("library_version", T.StringType(), False),
            T.StructField("source_id", T.StringType(), False),
        ]
    )
    return local_df(spark, [(ENGINE_VERSION, ENGINE_SOURCE_ID)], schema)


_SUMMARIZE_SCHEMA = T.StructType(
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

# above this compressed file size the driver-side vectorized path would
# hold too much in one process; fall back to the distributed one-pass agg
# SUMMARIZE fast-path gate: up to this compressed size the driver-local
# pyarrow kernels (exactly DuckDB's own execution shape: multithreaded C++
# over a local file) beat the distributed one-pass agg — measured at sf10
# (268MB orders, 15M rows): local ~3.5s vs distributed 9.2s. Above it the
# distributed plan is the scale-correct path.
_SUMMARIZE_LOCAL_MAX_BYTES = 1 << 30

# exact count_distinct up to this many non-null values; above it numeric/
# temporal columns switch to the HLL estimate below (DuckDB SUMMARIZE's
# approx_unique is itself HyperLogLog — exactness is not part of the
# contract, and exact hashing dominated SUMMARIZE at sf1: 1.0s of 1.3s)
_SUMMARIZE_EXACT_UNIQ_ROWS = 100_000


def _hll_estimate_u64(vals) -> int:
    """HyperLogLog distinct estimate (p=14, ~0.8% rel. error) over a
    uint64 numpy array, vectorized: splitmix64 finalizer as the hash,
    register maxima via np.maximum.at, linear-counting small-range
    correction. Pure numpy — no per-value Python."""
    import numpy as np

    p = 14
    m = 1 << p
    n = len(vals)
    # Two deliberate layout choices keep this linear-memory and fast:
    # 1. chunked in-place hashing with ONE reused uint64 scratch buffer —
    #    the naive expression tree allocates ~8 full-length uint64
    #    temporaries (1GB+ at 15M rows) and page-zeroing them dominated
    #    the runtime with seconds of variance;
    # 2. per-register max WITHOUT np.maximum.at (unbuffered ufunc.at is
    #    ~0.5us/element): pack (register, rho) into one uint32 and mark
    #    PRESENCE per (register, rho) slot with one bincount per chunk —
    #    O(n) histogramming into an 8 MB table — then take each
    #    register's highest occupied slot. (The previous radix sort of
    #    the full packed array was the per-column critical path at 15 M
    #    rows: 0.35-0.5 s against bincount's ~0.1 s, same registers out.)
    chunk = 1 << 21
    scratch = np.empty(min(chunk, n), dtype=np.uint64)
    t64 = np.empty(min(chunk, n), dtype=np.uint64)
    packed = np.empty(n, dtype=np.uint32)
    rem_mask = np.uint64((1 << (64 - p)) - 1)
    with np.errstate(over="ignore"):
        for s0 in range(0, n, chunk):
            v = vals[s0 : s0 + chunk]
            k = len(v)
            h = scratch[:k]
            t = t64[:k]
            np.add(v, np.uint64(0x9E3779B97F4A7C15), out=h)
            np.right_shift(h, np.uint64(30), out=t)
            np.bitwise_xor(h, t, out=h)
            np.multiply(h, np.uint64(0xBF58476D1CE4E5B9), out=h)
            np.right_shift(h, np.uint64(27), out=t)
            np.bitwise_xor(h, t, out=h)
            np.multiply(h, np.uint64(0x94D049BB133111EB), out=h)
            np.right_shift(h, np.uint64(31), out=t)
            np.bitwise_xor(h, t, out=h)
            # rank = leading-zero count of the (64-p)-bit remainder + 1;
            # the remainder is < 2^50 so float64 frexp exponents are exact
            np.bitwise_and(h, rem_mask, out=t)
            fr_exp = np.frexp(t.astype(np.float64))[1]
            rho = np.where(t == 0, 64 - p + 1, 64 - p - fr_exp + 1).astype(
                np.uint32
            )
            np.right_shift(h, np.uint64(64 - p), out=t)
            out = packed[s0 : s0 + k]
            np.multiply(t.astype(np.uint32), np.uint32(64), out=out)
            np.bitwise_or(out, rho, out=out)  # 1 <= rho <= 51 < 64
    # one histogram pass over the full packed array (a per-chunk bincount
    # re-zeroes and re-merges the 8 MB table per chunk — measured 2x the
    # cost of one pass at 15 M rows)
    slot_counts = np.bincount(packed, minlength=m * 64)
    present = (slot_counts > 0).reshape(m, 64)
    seen = present.any(axis=1)
    # highest occupied rho slot per register (slot 0 is never written)
    regs = np.where(
        seen, 63 - np.argmax(present[:, ::-1], axis=1), 0
    ).astype(np.uint8)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.ldexp(1.0, -regs.astype(np.int64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * float(np.log(m / zeros))
    return int(round(est))


def _approx_unique_arrow(col, cnt: int):
    """approx_unique for the SUMMARIZE fast path: exact pyarrow
    count_distinct while small; HLL over the raw 64-bit representation
    for large numeric/temporal columns (strings stay exact — the hash
    table over them measured cheap; it is the wide numeric hashes that
    dominated). Returns None to mean "caller should use count_distinct"."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if cnt <= _SUMMARIZE_EXACT_UNIQ_ROWS:
        return None
    t = col.type
    if not (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_temporal(t)
    ):
        return None
    vals = pc.drop_null(col)
    if pa.types.is_floating(t):
        arr = vals.combine_chunks().to_numpy(zero_copy_only=False)
        u64 = arr.astype(np.float64).view(np.uint64)
    else:
        arr = pc.cast(vals, pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        u64 = arr.view(np.uint64)
    return _hll_estimate_u64(u64)


def _fmt_stat(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):  # match Spark's CAST(bool AS STRING)
        return "true" if v else "false"
    return str(v)


def _summarize_parquet_local(
    spark: SparkSession, df: DataFrame, path: str
) -> DataFrame | None:
    """SUMMARIZE fast path for a small single-file parquet base table.

    The driver's testdata files are written as ONE row group, so a Spark
    scan of them is a single task no matter the config and the one-pass
    aggregation runs serially, paying full JVM task/codegen latency per
    statement. DuckDB answers SUMMARIZE with multi-threaded vectorized
    kernels over the local file — for inputs that fit one machine we do
    the literal equivalent: read each column with pyarrow and compute the
    stats with pyarrow.compute's C++ kernels (count_distinct, min_max,
    mean, stddev(ddof=1), quantile), taking row/null counts and numeric
    min/max straight from the parquet footer. Gated to files < 256MB
    compressed; anything larger uses the distributed one-pass aggregation
    in summarize_df, which is the scale-correct plan.
    """
    import os

    try:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if os.path.getsize(path) > _SUMMARIZE_LOCAL_MAX_BYTES:
            return None
        pf = pq.ParquetFile(path)
        md = pf.metadata
        n = md.num_rows
        # top-level arrow field names (nested columns appear as their root)
        arrow_names = set(pf.schema_arrow.names)
        if set(f.name for f in df.schema.fields) - arrow_names:
            return None
        if n == 0:
            return None  # degenerate; the one-pass shape handles it

        tbl = pq.read_table(path)

        def uniq_stat(col, cnt):
            u = _approx_unique_arrow(col, cnt)
            if u is None:
                u = pc.count_distinct(col).as_py()
            return u

        def minmax_stat(col):
            if pa.types.is_boolean(col.type):
                mm = {"min": pc.min(col).as_py(), "max": pc.max(col).as_py()}
            else:
                mm = pc.min_max(col)
                mm = {"min": mm["min"].as_py(), "max": mm["max"].as_py()}
            return _fmt_stat(mm["min"]), _fmt_stat(mm["max"])

        def num_stat(col, cnt):
            dcol = pc.cast(col, pa.float64())
            avg = pc.mean(dcol).as_py()
            std = pc.stddev(dcol, ddof=1).as_py() if cnt > 1 else None
            qs = pc.quantile(dcol, q=[0.25, 0.5, 0.75]).to_pylist()
            q25, q50, q75 = (
                float(v) if v is not None else None for v in qs
            )
            return avg, std, q25, q50, q75

        # stat-parallel: every kernel here (arrow compute, numpy hash/
        # histogram) releases the GIL, so a thread POOL OVER (column,
        # stat-family) tasks turns the wall time into max(single stat)
        # instead of sum(stats) — the same multi-threaded execution
        # DuckDB's SUMMARIZE uses. Per-COLUMN tasks left the widest
        # column's uniq→minmax→quantile chain serial on the critical
        # path (~1.1 s at 15 M rows vs ~0.5 s split). Threads, not
        # processes: the table is shared read-only, zero copies.
        from concurrent.futures import ThreadPoolExecutor

        fields = df.schema.fields
        meta = []
        for f in fields:
            col = tbl.column(f.name)
            nulls = col.null_count
            meta.append((f, col, nulls, n - nulls))
        futs = {}
        workers = min(3 * len(fields), os.cpu_count() or 8, 16)
        pool = (
            ThreadPoolExecutor(max_workers=workers)
            if workers > 1 and n > 1_000_000
            else None
        )

        def run(key, fn, *args):
            if pool is not None:
                futs[key] = pool.submit(fn, *args)
            else:
                class _Done:
                    def __init__(self, v):
                        self._v = v

                    def result(self):
                        return self._v

                futs[key] = _Done(fn(*args))

        try:
            for i, (f, col, nulls, cnt) in enumerate(meta):
                is_num = isinstance(f.dataType, _NUMERIC)
                is_complex = isinstance(
                    f.dataType,
                    (T.ArrayType, T.MapType, T.StructType, T.BinaryType),
                )
                if not is_complex:
                    run((i, "u"), uniq_stat, col, cnt)
                    run((i, "m"), minmax_stat, col)
                if is_num and cnt:
                    run((i, "n"), num_stat, col, cnt)
            out_rows = []
            for i, (f, col, nulls, cnt) in enumerate(meta):
                mn, mx = futs[(i, "m")].result() if (i, "m") in futs else (
                    None,
                    None,
                )
                uniq = futs[(i, "u")].result() if (i, "u") in futs else None
                avg, std, q25, q50, q75 = (
                    futs[(i, "n")].result()
                    if (i, "n") in futs
                    else (None, None, None, None, None)
                )
                out_rows.append(
                    (
                        f.name,
                        spark_type_to_duckdb(f.dataType),
                        mn,
                        mx,
                        uniq,
                        float(avg) if avg is not None else None,
                        float(std) if std is not None else None,
                        q25,
                        q50,
                        q75,
                        n,
                        round(100.0 * nulls / n, 2) if n else 0.0,
                    )
                )
        finally:
            if pool is not None:
                # cancel queued stat tasks on the failure path: the
                # caller falls back to the distributed one-pass plan and
                # must not compete with orphaned arrow kernels
                pool.shutdown(wait=False, cancel_futures=True)
    except Exception:  # noqa: BLE001 — any arrow surprise -> one-pass plan
        return None
    return local_df(spark, out_rows, _SUMMARIZE_SCHEMA)


def summarize_df(
    spark: SparkSession, df: DataFrame, file_hint: str | None = None
) -> DataFrame:
    """DuckDB ``SUMMARIZE`` (dev.json:188,548): one row per column with
    min/max/approx_unique/avg/std/q25/q50/q75/count/null_percentage.

    Single aggregation job over the input (one pass, map-side partials —
    scales to arbitrarily wide/deep tables); the 1×C result is reshaped
    driver-side into the C-row DuckDB layout. Small single-file parquet
    base tables take the column-parallel fast path instead (`file_hint`).
    """
    if file_hint is not None:
        fast = _summarize_parquet_local(spark, df, file_hint)
        if fast is not None:
            return fast
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
    return local_df(spark, out_rows, _SUMMARIZE_SCHEMA)


# ---------------------------------------------------------------------------
# DuckDB introspection table functions (glob / parquet_* / duckdb_*)
# ---------------------------------------------------------------------------

def glob_df(spark: SparkSession, pattern: str) -> DataFrame:
    """``FROM glob('pat')`` — matched file paths, DuckDB's one ``file``
    column."""
    import glob as _glob

    rows = [(p,) for p in sorted(_glob.glob(pattern))]
    return local_df(
        spark, rows,
        T.StructType([T.StructField("file", T.StringType())]),
    )


_PQ_SCHEMA_SCHEMA = T.StructType([
    T.StructField("file_name", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("type_length", T.StringType()),
    T.StructField("repetition_type", T.StringType()),
    T.StructField("num_children", T.LongType()),
    T.StructField("converted_type", T.StringType()),
    T.StructField("scale", T.LongType()),
    T.StructField("precision", T.LongType()),
    T.StructField("field_id", T.LongType()),
    T.StructField("logical_type", T.StringType()),
])


def parquet_schema_df(spark: SparkSession, path: str) -> DataFrame:
    """``FROM parquet_schema('f.parquet')`` — DuckDB's column layout, fed
    from the parquet footer via pyarrow (driver-side, no Spark job)."""
    import glob as _glob

    import pyarrow.parquet as pq

    rows = []
    for f in sorted(_glob.glob(path)) or [path]:
        sch = pq.ParquetFile(f).schema
        rows.append((f, "schema", None, None, "REQUIRED",
                     len(sch.names), None, None, None, None, None))
        for i in range(len(sch.names)):
            col = sch.column(i)
            rows.append((
                f, col.name, col.physical_type, None,
                "OPTIONAL", None, col.converted_type
                if col.converted_type not in (None, "NONE") else None,
                None, None, None,
                str(col.logical_type)
                if str(col.logical_type) != "None" else None,
            ))
    return local_df(spark, rows, _PQ_SCHEMA_SCHEMA)


_PQ_META_SCHEMA = T.StructType([
    T.StructField("file_name", T.StringType()),
    T.StructField("row_group_id", T.LongType()),
    T.StructField("row_group_num_rows", T.LongType()),
    T.StructField("row_group_num_columns", T.LongType()),
    T.StructField("row_group_bytes", T.LongType()),
    T.StructField("column_id", T.LongType()),
    T.StructField("file_offset", T.LongType()),
    T.StructField("num_values", T.LongType()),
    T.StructField("path_in_schema", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("stats_min", T.StringType()),
    T.StructField("stats_max", T.StringType()),
    T.StructField("stats_null_count", T.LongType()),
    T.StructField("stats_distinct_count", T.LongType()),
    T.StructField("stats_min_value", T.StringType()),
    T.StructField("stats_max_value", T.StringType()),
    T.StructField("compression", T.StringType()),
    T.StructField("total_compressed_size", T.LongType()),
    T.StructField("total_uncompressed_size", T.LongType()),
])


def parquet_metadata_df(spark: SparkSession, path: str) -> DataFrame:
    """``FROM parquet_metadata('f.parquet')`` — per-row-group per-column
    footer stats (the zone-map data pruning runs on)."""
    import glob as _glob

    import pyarrow.parquet as pq

    rows = []
    for f in sorted(_glob.glob(path)) or [path]:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                st = c.statistics
                rows.append((
                    f, rg, g.num_rows, g.num_columns, g.total_byte_size,
                    ci, c.file_offset, c.num_values,
                    c.path_in_schema, c.physical_type,
                    str(st.min) if st and st.has_min_max else None,
                    str(st.max) if st and st.has_min_max else None,
                    st.null_count if st and st.has_null_count else None,
                    st.distinct_count if st and st.has_distinct_count
                    else None,
                    str(st.min) if st and st.has_min_max else None,
                    str(st.max) if st and st.has_min_max else None,
                    c.compression,
                    c.total_compressed_size, c.total_uncompressed_size,
                ))
    return local_df(spark, rows, _PQ_META_SCHEMA)


def duckdb_settings_df(spark: SparkSession, settings: dict) -> DataFrame:
    rows = sorted((k, str(v)) for k, v in settings.items())
    return local_df(
        spark, rows,
        T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("value", T.StringType()),
        ]),
    )


def duckdb_tables_df(spark: SparkSession, session) -> DataFrame:
    rows = []
    for name in sorted(session._tables):
        parts = name.split(".")
        db = parts[0] if len(parts) > 1 else "memory"
        tbl = parts[-1]
        rows.append((
            db, "main", tbl,
            session._comments.get(("table", name)),
            False, name in getattr(session, "_temp_tables", set()),
            len(session._tables[name].columns),
            sum(1 for t in session._indexes.values() if t in (name, tbl)),
            None,
        ))
    return local_df(
        spark, rows,
        T.StructType([
            T.StructField("database_name", T.StringType()),
            T.StructField("schema_name", T.StringType()),
            T.StructField("table_name", T.StringType()),
            T.StructField("comment", T.StringType()),
            T.StructField("internal", T.BooleanType()),
            T.StructField("temporary", T.BooleanType()),
            T.StructField("column_count", T.LongType()),
            T.StructField("index_count", T.LongType()),
            T.StructField("sql", T.StringType()),
        ]),
    )


def duckdb_columns_df(spark: SparkSession, session) -> DataFrame:
    """``FROM duckdb_columns()`` — per-column catalog rows for the user's
    tables (DuckDB also lists system views; the user tables are the rows
    queries actually filter for)."""
    rows = []
    for name in sorted(session._tables):
        parts = name.split(".")
        db = parts[0] if len(parts) > 1 else "memory"
        tbl = parts[-1]
        overrides = session._type_overrides.get(name, {})
        fixed = session._fixed_arrays.get(name, {})
        for i, f in enumerate(session._tables[name].schema.fields):
            rows.append((
                db, "main", tbl, f.name,
                session._comments.get(("column", name, f.name.lower())),
                i + 1, _type_name(f, fixed, overrides), f.nullable,
            ))
    return local_df(
        spark, rows,
        T.StructType([
            T.StructField("database_name", T.StringType()),
            T.StructField("schema_name", T.StringType()),
            T.StructField("table_name", T.StringType()),
            T.StructField("column_name", T.StringType()),
            T.StructField("comment", T.StringType()),
            T.StructField("column_index", T.LongType()),
            T.StructField("data_type", T.StringType()),
            T.StructField("is_nullable", T.BooleanType()),
        ]),
    )


def duckdb_views_df(spark: SparkSession, session) -> DataFrame:
    """``FROM duckdb_views()`` — the session's live view definitions
    (DuckDB also lists its information_schema system views; user views
    are the rows queries filter for)."""
    rows = []
    for name in sorted(getattr(session, "_view_defs", {})):
        body = session._view_defs[name]
        ncols = None
        df = session._tables.get(name) or session._tables.get(name.lower())
        if df is not None:
            ncols = len(df.columns)
        rows.append((
            "memory", "main", name.split(".")[-1],
            session._comments.get(("table", name)),
            False, False, ncols,
            f"CREATE VIEW {name} AS {body};",
        ))
    return local_df(
        spark, rows,
        T.StructType([
            T.StructField("database_name", T.StringType()),
            T.StructField("schema_name", T.StringType()),
            T.StructField("view_name", T.StringType()),
            T.StructField("comment", T.StringType()),
            T.StructField("internal", T.BooleanType()),
            T.StructField("temporary", T.BooleanType()),
            T.StructField("column_count", T.LongType()),
            T.StructField("sql", T.StringType()),
        ]),
    )


def duckdb_databases_df(spark: SparkSession, session) -> DataFrame:
    """``FROM duckdb_databases()`` — primary catalog + ATTACHed ones."""
    wh = getattr(session, "_warehouse", None)
    rows = [(
        "memory",
        getattr(wh, "root", None) if wh is not None else None,
        None, False, "duckdb", False,
    )]
    for db in sorted(getattr(session, "_databases", set())):
        # _databases also tracks schema-ish names; list only real
        # attached catalogs (keys of the form db.table exist for them)
        if db in ("memory", "main", "information_schema", "temp", "system"):
            continue
        if not any(k.startswith(db + ".") for k in session._tables):
            continue
        rows.append((db, None, None, False, "duckdb", False))
    rows += [
        ("system", None, None, True, "duckdb", False),
        ("temp", None, None, True, "duckdb", False),
    ]
    return local_df(
        spark, rows,
        T.StructType([
            T.StructField("database_name", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("comment", T.StringType()),
            T.StructField("internal", T.BooleanType()),
            T.StructField("type", T.StringType()),
            T.StructField("readonly", T.BooleanType()),
        ]),
    )


def duckdb_constraints_df(spark: SparkSession, session) -> DataFrame:
    """``FROM duckdb_constraints()`` — PRIMARY KEY/UNIQUE, NOT NULL,
    CHECK and FOREIGN KEY rows from the session's constraint metadata."""
    rows = []
    for name in sorted(session._tables):
        tbl = name.split(".")[-1]
        idx = 0
        keys = getattr(session, "_unique_keys", {}).get(name) or []
        for n, key in enumerate(keys):
            ctype = "PRIMARY KEY" if n == 0 else "UNIQUE"
            rows.append((
                "memory", "main", tbl, idx, ctype,
                f"{ctype}({', '.join(key)})", None, list(key),
            ))
            idx += 1
        for col in sorted(getattr(session, "_notnull_cols", {}).get(name, ())):
            rows.append((
                "memory", "main", tbl, idx, "NOT NULL",
                f"NOT NULL({col})", None, [col],
            ))
            idx += 1
        for expr in getattr(session, "_checks", {}).get(name, []):
            txt = expr if isinstance(expr, str) else str(expr)
            rows.append((
                "memory", "main", tbl, idx, "CHECK",
                f"CHECK({txt})", txt, [],
            ))
            idx += 1
        for fk in getattr(session, "_foreign_keys", {}).get(name, []):
            local_cols = list(fk[0]) if fk else []
            rows.append((
                "memory", "main", tbl, idx, "FOREIGN KEY",
                f"FOREIGN KEY ({', '.join(local_cols)})", None, local_cols,
            ))
            idx += 1
    schema = T.StructType([
        T.StructField("database_name", T.StringType()),
        T.StructField("schema_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("constraint_index", T.LongType()),
        T.StructField("constraint_type", T.StringType()),
        T.StructField("constraint_text", T.StringType()),
        T.StructField("expression", T.StringType()),
        T.StructField(
            "constraint_column_names", T.ArrayType(T.StringType())
        ),
    ])
    # createDataFrame (LocalRelation) — local_df's VALUES renderer cannot
    # express the array-typed column
    return spark.createDataFrame(rows, schema)


def pragma_database_size_df(spark: SparkSession, session) -> DataFrame:
    """``FROM pragma_database_size()`` — durable-warehouse footprint when
    one is attached, DuckDB's in-memory zeros otherwise."""
    import os as _os

    size = 0
    wh = getattr(session, "_warehouse", None)
    root = getattr(wh, "root", None) if wh is not None else None
    if root and _os.path.isdir(str(root)):
        for dirpath, _dirs, files in _os.walk(str(root)):
            for f in files:
                try:
                    size += _os.path.getsize(_os.path.join(dirpath, f))
                except OSError:
                    pass

    def human(n: int) -> str:
        if n == 0:
            return "0 bytes"
        for unit in ["bytes", "KiB", "MiB", "GiB"]:
            if n < 1024 or unit == "GiB":
                return (
                    f"{n} bytes" if unit == "bytes" else f"{n:.1f} {unit}"
                )
            n /= 1024
        return f"{n:.1f} GiB"

    mem_limit = session.settings.get("memory_limit", "0 bytes")
    rows = [(
        "memory", human(size), 262144, 0, 0, 0, "0 bytes", "0 bytes",
        str(mem_limit),
    )]
    return local_df(
        spark, rows,
        T.StructType([
            T.StructField("database_name", T.StringType()),
            T.StructField("database_size", T.StringType()),
            T.StructField("block_size", T.LongType()),
            T.StructField("total_blocks", T.LongType()),
            T.StructField("used_blocks", T.LongType()),
            T.StructField("free_blocks", T.LongType()),
            T.StructField("wal_size", T.StringType()),
            T.StructField("memory_usage", T.StringType()),
            T.StructField("memory_limit", T.StringType()),
        ]),
    )


def duckdb_schemas_df(spark: SparkSession, session) -> DataFrame:
    """``FROM duckdb_schemas()`` — DuckDB's 8-column shape: the three
    built-in schemas per catalog (main / information_schema /
    pg_catalog) over memory+attached+system+temp. oids are synthetic
    (DuckDB's are allocation-order artifacts, not stable values)."""
    dbs = [("memory", 1000)]
    for db in sorted(getattr(session, "_databases", set())):
        if db in ("memory", "main", "information_schema", "temp", "system"):
            continue
        if not any(k.startswith(db + ".") for k in session._tables):
            continue
        dbs.append((db, 2000 + len(dbs) * 100))
    dbs += [("system", 0), ("temp", 3000)]
    rows = []
    oid = 1
    for db, db_oid in dbs:
        for sch in ("information_schema", "main", "pg_catalog"):
            rows.append((oid, db, db_oid, sch, None, None, True, None))
            oid += 1
    return local_df(
        spark, rows,
        T.StructType([
            T.StructField("oid", T.LongType()),
            T.StructField("database_name", T.StringType()),
            T.StructField("database_oid", T.LongType()),
            T.StructField("schema_name", T.StringType()),
            T.StructField("comment", T.StringType()),
            T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
            T.StructField("internal", T.BooleanType()),
            T.StructField("sql", T.StringType()),
        ]),
    )


def duckdb_functions_df(spark: SparkSession, session) -> DataFrame:
    """``FROM duckdb_functions()`` — the engine's callable surface:
    Spark's built-in registry as scalar/aggregate rows plus the
    session's macros (macro_definition carried). Column shape mirrors
    DuckDB's; oids are synthetic, typed metadata the engine does not
    track is NULL."""
    rows = []
    oid = 1
    for f in spark.catalog.listFunctions():
        rows.append((
            "system", 0, "main", f.name, "scalar", f.description,
            None, None, None, None, None, None, None, False, True,
            oid, None, None,
        ))
        oid += 1
    for kind in ("_macros", "_table_macros"):
        for name, body in sorted(getattr(session, kind, {}).items()):
            params, text = (
                body if isinstance(body, tuple) and len(body) == 2
                else (None, str(body))
            )
            rows.append((
                "memory", 1000, "main", name,
                "macro" if kind == "_macros" else "table_macro",
                None, None, None, None, list(params or []), None, None,
                str(text), False, False, oid, None, None,
            ))
            oid += 1
    return local_df(
        spark, rows,
        T.StructType([
            T.StructField("database_name", T.StringType()),
            T.StructField("database_oid", T.LongType()),
            T.StructField("schema_name", T.StringType()),
            T.StructField("function_name", T.StringType()),
            T.StructField("function_type", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField("comment", T.StringType()),
            T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
            T.StructField("return_type", T.StringType()),
            T.StructField("parameters", T.ArrayType(T.StringType())),
            T.StructField("parameter_types", T.ArrayType(T.StringType())),
            T.StructField("varargs", T.StringType()),
            T.StructField("macro_definition", T.StringType()),
            T.StructField("has_side_effects", T.BooleanType()),
            T.StructField("internal", T.BooleanType()),
            T.StructField("function_oid", T.LongType()),
            T.StructField("example", T.StringType()),
            T.StructField("stability", T.StringType()),
        ]),
    )


def parquet_file_metadata_df(spark: SparkSession, path: str) -> DataFrame:
    """``FROM parquet_file_metadata('f.parquet')`` — one row per file:
    footer facts via pyarrow (zero Spark jobs), DuckDB's 7-column
    shape."""
    import glob as globmod

    import pyarrow.parquet as pq

    files = sorted(globmod.glob(path)) if any(
        ch in path for ch in "*?["
    ) else [path]
    rows = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows.append((
            f, md.created_by, md.num_rows, md.num_row_groups,
            int(float(md.format_version)), None, None,
        ))
    return local_df(
        spark, rows,
        T.StructType([
            T.StructField("file_name", T.StringType()),
            T.StructField("created_by", T.StringType()),
            T.StructField("num_rows", T.LongType()),
            T.StructField("num_row_groups", T.LongType()),
            T.StructField("format_version", T.LongType()),
            T.StructField("encryption_algorithm", T.StringType()),
            T.StructField("footer_signing_key_metadata", T.StringType()),
        ]),
    )
