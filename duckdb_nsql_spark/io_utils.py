"""File ingestion and export: read_csv_auto / read_json_auto / read_parquet
table functions, COPY TO/FROM, HTTP staging, ATTACH of DuckDB files.

Reference surface: /root/reference/eval/data/dev.json:196 (HTTP CSV), :324-372
(COPY round-trips), :340 (hive-partitioned parquet glob), :356 (JSON), :596
(ATTACH). Spark has no httpfs — HTTP sources are staged to a local spool
directory on the driver, then read distributed. At cluster scale the staging
directory would be a shared filesystem/object store; the read path is
identical.
"""

from __future__ import annotations

import glob as globmod
import os
import re
import tempfile
import urllib.request

from pyspark.sql import DataFrame, SparkSession

_STAGING: dict[str, str] = {}


def localize_path(path: str) -> str:
    """Resolve a relative local path against the *Python* cwd. Spark hands
    paths to Hadoop, which resolves them against the JVM's user.dir — fixed
    at JVM start — so DuckDB's cwd-relative COPY/read semantics break for
    any caller that chdirs after connect()."""
    if re.match(r"^[a-z][a-z0-9+.-]*://", path) or os.path.isabs(path):
        return path
    return os.path.abspath(path)


def stage_if_remote(path: str, allow_external: bool = True) -> str:
    """Download an http(s) source once to a local spool file."""
    if not re.match(r"^https?://", path):
        return path
    if not allow_external:
        raise PermissionError(
            "external access is disabled (enable_external_access=false)"
        )
    if path in _STAGING:
        return _STAGING[path]
    suffix = os.path.splitext(path.split("?")[0])[1] or ".dat"
    fd, local = tempfile.mkstemp(prefix="ddbspark_http_", suffix=suffix)
    os.close(fd)
    urllib.request.urlretrieve(path, local)  # noqa: S310 — explicit httpfs parity
    _STAGING[path] = local
    return local


def infer_format(path: str, fmt: str | None = None) -> str:
    if fmt:
        f = fmt.lower().strip("'\"")
        if f in ("csv", "parquet", "json", "ndjson"):
            return "json" if f == "ndjson" else f
    p = path.lower().rstrip("*").rstrip("/")
    for ext, f in ((".parquet", "parquet"), (".csv", "csv"), (".tsv", "csv"),
                   (".json", "json"), (".ndjson", "json"), (".jsonl", "json")):
        if p.endswith(ext) or (ext + ".gz") in p:
            return f
    return "csv"


def hive_base_path(path: str) -> str | None:
    """For a glob like ``dir/city=Amsterdam/*.parquet`` return ``dir`` so
    Spark recovers the partition column from the directory name."""
    parts = path.split("/")
    for i, p in enumerate(parts):
        if re.match(r"^[^=*?]+=[^=]*$", p):
            return "/".join(parts[:i]) or "."
    return None


def read_parquet_table(spark: SparkSession, path: str, base_path: str | None = None) -> DataFrame:
    """Parquet read that tolerates TIMESTAMP(NANOS) columns (Spark's reader
    rejects them; with ``spark.sql.legacy.parquet.nanosAsLong`` they surface
    as epoch-nanos longs, which we cast back to timestamps, truncating to
    micros — same as Arrow/DuckDB do on read)."""
    from pyspark.sql import functions as F

    path = localize_path(path)
    reader = spark.read
    if base_path:
        reader = reader.option("basePath", localize_path(base_path))
    df = reader.parquet(path)
    nanos_cols = _nanos_timestamp_columns(path)
    for c in nanos_cols:
        if c in df.columns:
            df = df.withColumn(
                c, F.timestamp_micros((F.col(c) / F.lit(1000)).cast("long"))
            )
    return df


def read_parquet_files(
    spark: SparkSession, files: list[str], schema=None
) -> DataFrame:
    """Read an explicit subset of a table's parquet files (system-sampling
    file pruning) with the same TIMESTAMP(NANOS) handling as
    read_parquet_table. Files may be Spark-reported URIs (file://...).
    ``schema`` (the raw on-disk schema, nanos-free tables only) skips the
    footer-inference pass — worth ~50ms per statement on local[*]."""
    from pyspark.sql import functions as F

    first = files[0]
    if first.startswith("file://"):
        first = first[len("file://"):]
    nanos = _nanos_timestamp_columns(first)
    reader = spark.read
    if schema is not None and not nanos:
        reader = reader.schema(schema)
    df = reader.parquet(*files)
    for c in nanos:
        if c in df.columns:
            df = df.withColumn(
                c, F.timestamp_micros((F.col(c) / F.lit(1000)).cast("long"))
            )
    return df


def _nanos_timestamp_columns(path: str) -> list[str]:
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        # ds.dataset accepts a dir/file path directly but NOT a dir inside
        # a list — only glob-expand when the path actually has wildcards
        # (a respool dir passed through a glob list silently lost nanos
        # detection, leaving events.ts a raw BIGINT at sf>=0.1)
        if any(ch in path for ch in "*?["):
            src = globmod.glob(path) or path
        else:
            src = path
        schema = ds.dataset(src, format="parquet").schema
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


_RESPOOL_CACHE: dict[str, str] = {}
_RESPOOL_MIN_BYTES = 2 << 20
_RESPOOL_MAX_BYTES = 512 << 20
# ~75k rows/file ≈ 1-2MB chunks: enough files for one full task wave on
# local[32] without drowning sub-second queries in per-task scheduling
# (25k-row chunks measured ~10% slower on the headline joins/aggs; the
# respool itself only fires on the 2MB..512MB single-row-group local
# pathology — production multi-file ingest never takes this path)
_RESPOOL_ROWS_PER_FILE = 75_000


def parallel_scan_path(path: str, max_files: int = 32) -> str:
    """Make a base-table parquet file scannable in parallel.

    Spark's scan split unit is the file (sliced by byte ranges that bind
    to whole row groups), so a single-file single-row-group table — the
    shape the driver's testdata ships in — reads as ONE task no matter
    how many cores or executors exist, and every downstream stage
    serializes behind it. DuckDB parallelizes inside a row group at
    vector granularity, so it does not suffer this. Rewrite such files
    once per process into an N-file spool with identical rows/schema; at
    production scale ingest already lands many files/row groups and this
    path is a no-op (gated to 2MB..512MB single-row-group local files).
    """
    p = os.path.abspath(path)
    hit = _RESPOOL_CACHE.get(p)
    if hit is not None:
        return hit
    try:
        size = os.path.getsize(p)
        if not (_RESPOOL_MIN_BYTES <= size <= _RESPOOL_MAX_BYTES):
            _RESPOOL_CACHE[p] = p
            return p
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(p)
        if pf.metadata.num_row_groups > max(
            2, pf.metadata.num_rows // _RESPOOL_ROWS_PER_FILE // 2
        ):
            _RESPOOL_CACHE[p] = p  # already splittable enough
            return p
        tbl = pq.read_table(p)
        n = tbl.num_rows
        nfiles = max(2, min(max_files, n // _RESPOOL_ROWS_PER_FILE + 1))
        spool = tempfile.mkdtemp(prefix="ddbspark_spool_")
        step = (n + nfiles - 1) // nfiles
        for i in range(nfiles):
            chunk = tbl.slice(i * step, step)
            if chunk.num_rows == 0:
                break
            pq.write_table(chunk, os.path.join(spool, f"part-{i:04d}.parquet"))
        _RESPOOL_CACHE[p] = spool
        return spool
    except Exception:  # noqa: BLE001
        _RESPOOL_CACHE[p] = p
        return p


def read_file_table(
    spark: SparkSession,
    path: str,
    *,
    fmt: str | None = None,
    schema_ddl: str | None = None,
    header: bool | None = None,
    delimiter: str | None = None,
    allow_external: bool = True,
    csv_opts: dict | None = None,
) -> DataFrame:
    """The engine's read_csv_auto / read_json_auto / read_parquet."""
    path = localize_path(stage_if_remote(path, allow_external))
    f = infer_format(path, fmt)
    if f == "parquet":
        return read_parquet_table(spark, path, base_path=hive_base_path(path))
    if f == "json":
        # DuckDB read_json_auto handles both JSON-lines and top-level arrays;
        # multiLine kicks in only when line mode yields a corrupt-record column.
        df = spark.read.json(path)
        if df.columns == ["_corrupt_record"]:
            df = spark.read.option("multiLine", True).json(path)
        # Spark alphabetizes inferred JSON columns; DuckDB keeps the key
        # order of the document. Recover it from the first record.
        order = _json_key_order(path)
        if order:
            cols = [c for c in order if c in df.columns]
            cols += [c for c in df.columns if c not in set(cols)]
            if cols != df.columns:
                df = df.select(*cols)
        return df
    opts = dict(csv_opts or {})
    skip = int(opts.pop("skip", 0) or 0)
    names = opts.pop("names", None)
    all_varchar = bool(opts.pop("all_varchar", False))
    types_over = opts.pop("types", None)
    if skip:
        # DuckDB skip=N drops N physical lines before parsing. Spark's
        # csv reader has no such option; trim into a driver-side spool
        # (skip is a small-file affordance — headers and preambles).
        path = _skip_lines_spool(path, skip)
    if delimiter is None or header is None:
        # DuckDB read_csv_auto SNIFFS the dialect; mirror the two
        # high-impact decisions from the first lines of the first file
        sd, sh = _sniff_csv(path)
        if delimiter is None:
            delimiter = sd
        if header is None:
            header = sh
    reader = spark.read.option("header", str(bool(header)).lower())
    if delimiter:
        reader = reader.option("sep", delimiter)
    # standard-CSV doubled-quote escaping unless the caller overrides
    # (Spark's default escape is backslash — a silent interop bug with
    # DuckDB-written files containing quotes)
    reader = reader.option("escape", opts.pop("escape", '"'))
    for k, v in opts.items():
        reader = reader.option(k, v)
    if schema_ddl:
        return reader.schema(schema_ddl).csv(path)
    if not all_varchar:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)

    def _final_names(cols: list[str]) -> list[str]:
        if names:
            return list(names) + list(cols[len(names):])
        if not header:
            # headerless reads name columns column0..columnN in DuckDB;
            # Spark's default is _c0.._cN
            return [
                f"column{c[2:]}" if re.fullmatch(r"_c\d+", c) else c
                for c in cols
            ]
        return list(cols)

    if types_over:
        # read_csv(types={'col': 'TYPE', ...} | ['TYPE', ...]) — DuckDB
        # per-column overrides. RE-READ with an explicit schema rather
        # than casting the inferred frame: a VARCHAR override must keep
        # the file's lexical form ('01' stays '01').
        from pyspark.sql import types as T

        from .types import parse_duckdb_type

        raw_cols = list(df.columns)
        finals = _final_names(raw_cols)
        if isinstance(types_over, dict):
            lower = {k.lower(): v for k, v in types_over.items()}
            picked = [lower.get(fn.lower()) for fn in finals]
        else:
            picked = list(types_over) + [None] * (
                len(raw_cols) - len(types_over)
            )
        fields = [
            T.StructField(
                rc,
                parse_duckdb_type(ty) if ty else f.dataType,
                True,
            )
            for rc, ty, f in zip(raw_cols, picked, df.schema.fields)
        ]
        df = reader.option("inferSchema", "false").schema(
            T.StructType(fields)
        ).csv(path)
    df = df.toDF(*_final_names(list(df.columns)))
    return df


def _sniff_csv(path: str) -> tuple[str | None, bool]:
    """(delimiter, has_header) sniffed from the first two lines of the
    first file — DuckDB read_csv_auto's two load-bearing decisions.
    Delimiter: the candidate with the most OUTSIDE-QUOTES occurrences on
    line 1. Header: line 1 has a header iff none of its fields parses as
    a number (numbers in row 1 mean data). This matches DuckDB v1.0
    empirically INCLUDING the all-string corner: DuckDB's own sniffer
    consumes row 1 of a headerless all-string CSV as a header
    ('alice,nyc\\nbob,sf' -> columns [alice, nyc], one data row) — pinned
    cross-engine in tests/test_engine.py::test_csv_sniff_matches_duckdb."""
    import gzip as gzipmod

    try:
        files = sorted(globmod.glob(path)) if any(
            ch in path for ch in "*?["
        ) else [path]
        if files and os.path.isdir(files[0]):
            inner = sorted(
                f for f in globmod.glob(os.path.join(files[0], "*"))
                if not os.path.basename(f).startswith((".", "_"))
            )
            files = inner or files
        if not files:
            return None, True
        opener = (
            (lambda p: gzipmod.open(p, "rt", encoding="utf-8",
                                    errors="replace"))
            if files[0].endswith(".gz")
            else (lambda p: open(p, "r", encoding="utf-8", errors="replace"))
        )
        with opener(files[0]) as fh:
            line1 = fh.readline().rstrip("\r\n")
        if not line1:
            return None, True
        best, best_n = None, 0
        for cand in (",", ";", "|", "\t"):
            n = _count_outside_quotes(line1, cand)
            if n > best_n:
                best, best_n = cand, n
        fields = _split_outside_quotes(line1, best or ",")

        def _numericish(s: str) -> bool:
            s = s.strip().strip('"')
            if not s:
                return False
            try:
                float(s)
                return True
            except ValueError:
                return False

        has_header = not any(_numericish(fv) for fv in fields)
        return best, has_header
    except OSError:
        return None, True


def _count_outside_quotes(line: str, ch: str) -> int:
    n, inq = 0, False
    for c in line:
        if c == '"':
            inq = not inq
        elif c == ch and not inq:
            n += 1
    return n


def _split_outside_quotes(line: str, sep: str) -> list[str]:
    out, cur, inq = [], [], False
    for c in line:
        if c == '"':
            inq = not inq
            cur.append(c)
        elif c == sep and not inq:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    out.append("".join(cur))
    return out


def _skip_lines_spool(path: str, skip: int) -> str:
    import glob as globmod2
    import tempfile

    files = sorted(globmod2.glob(path)) if any(
        ch in path for ch in "*?["
    ) else [path]
    out_dir = tempfile.mkdtemp(prefix="csv_skip_")
    for i, f in enumerate(files):
        with open(f, "r", encoding="utf-8", errors="replace") as src, open(
            os.path.join(out_dir, f"part{i:04d}.csv"), "w", encoding="utf-8"
        ) as dst:
            for n, line in enumerate(src):
                if n >= skip:
                    dst.write(line)
    return out_dir


def _json_key_order(path: str) -> list[str] | None:
    """Top-level key order of the first JSON record in the first file."""
    import json as jsonmod

    try:
        files = sorted(globmod.glob(path)) if any(
            ch in path for ch in "*?["
        ) else [path]
        if files and os.path.isdir(files[0]):
            files = sorted(globmod.glob(os.path.join(files[0], "*")))
        if not files:
            return None
        with open(files[0], "r", encoding="utf-8", errors="replace") as fh:
            head = fh.read(1 << 20).lstrip()
        if head.startswith("["):
            doc = jsonmod.loads(head, object_pairs_hook=list)
            first = doc[0] if isinstance(doc, list) and doc else None
        else:
            line = head.splitlines()[0] if head else ""
            first = jsonmod.loads(line, object_pairs_hook=list) if line else None
        if isinstance(first, list) and first and isinstance(first[0], tuple):
            return [k for k, _ in first]
    except Exception:  # noqa: BLE001
        return None
    return None


def write_copy_to(
    df: DataFrame,
    path: str,
    *,
    fmt: str | None = None,
    delimiter: str | None = None,
    header: bool = True,
    partition_by: list[str] | None = None,
    overwrite: bool = False,
    null_str: str | None = None,
    quote: str | None = None,
    escape: str | None = None,
    compression: str | None = None,
) -> int:
    """COPY ... TO 'path'.

    With PARTITION_BY (dev.json:341) this is a distributed
    ``df.write.partitionBy`` — the scale path. Without it, DuckDB semantics
    require a *single file* at ``path`` (the round-trip cases read the exact
    path back), so we funnel through one Arrow batch on the driver; callers
    at cluster scale should pass partition_by or write a directory.
    Returns the row count written (DuckDB COPY reports it).
    """
    path = localize_path(path)
    f = infer_format(path, fmt)

    def _csv_opts(w):
        # standard-CSV quoting (doubled quotes), DuckDB's on-disk dialect
        w = w.option("escape", escape or quote or '"')
        if quote:
            w = w.option("quote", quote)
        if null_str is not None:
            w = w.option("nullValue", null_str)
        return w

    if partition_by:
        writer = df.write.mode("overwrite" if overwrite else "errorifexists")
        writer = writer.partitionBy(*partition_by)
        if compression:
            writer = writer.option("compression", compression)
        if f == "parquet":
            writer.parquet(path)
        elif f == "csv":
            _csv_opts(writer.option("header", str(header).lower())).csv(path)
        else:
            writer.json(path)
        return -1
    # single-file target: the ENCODE stays fully distributed (every
    # partition writes its own part in parallel); only the byte-level
    # stitch is serial on the driver — CSV/JSON parts concatenate as raw
    # bytes (headerless parts + one driver-written header line), parquet
    # parts stream through a row-group merge in bounded memory. Strictly
    # better than the previous coalesce(1) funnel, which serialized the
    # whole final stage (encode included) into one task.
    import shutil
    import tempfile

    parent = os.path.dirname(os.path.abspath(path)) or "."
    tmp = tempfile.mkdtemp(dir=parent, prefix=".copy_tmp_")
    try:
        writer = df.write.mode("overwrite")
        if f == "parquet":
            writer.parquet(tmp)
        elif f == "csv":
            _csv_opts(
                writer.option("header", "false").option(
                    "sep", delimiter or ","
                )
            ).csv(tmp)
        else:
            writer.json(tmp)
        parts = sorted(globmod.glob(os.path.join(tmp, "part-*")))
        if f == "parquet":
            _merge_parquet_parts(parts, path, df)
        else:
            import gzip as gzipmod

            opener = (
                (lambda p: gzipmod.open(p, "wb"))
                if (compression or "").lower() == "gzip"
                else (lambda p: open(p, "wb"))
            )
            with opener(path) as out:
                if f == "csv" and header:
                    sep = delimiter or ","
                    out.write(
                        sep.join(
                            _csv_quote(c, sep) for c in df.columns
                        ).encode("utf-8")
                        + b"\n"
                    )
                for p in parts:
                    with open(p, "rb") as src:
                        shutil.copyfileobj(src, out, 1 << 20)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return _count_rows_in_file(path, f, header)


def _csv_quote(name: str, sep: str) -> str:
    if any(ch in name for ch in (sep, '"', "\n", "\r")):
        return '"' + name.replace('"', '""') + '"'
    return name


def _merge_parquet_parts(parts: list[str], path: str, df: DataFrame) -> None:
    """Stitch distributed parquet parts into one file by streaming row
    groups — driver memory is bounded by one record batch, and the parts
    arrive already encoded/compressed in parallel."""
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    schema = None
    for p in parts:
        pf = pq.ParquetFile(p)
        if pf.metadata.num_rows > 0 or schema is None:
            schema = pf.schema_arrow
        if pf.metadata.num_rows > 0:
            break
    if schema is None:  # zero parts: derive the arrow schema from the plan
        schema = to_arrow_schema(df.schema)
    with pq.ParquetWriter(path, schema) as w:
        for p in parts:
            pf = pq.ParquetFile(p)
            if pf.metadata.num_rows == 0:
                continue
            for batch in pf.iter_batches():
                w.write_batch(batch)


def _count_rows_in_file(path: str, fmt: str, header: bool) -> int:
    """Row count of a just-written single file (DuckDB COPY reports it).
    Parquet: footer metadata (no data read). Text: buffered line count."""
    if fmt == "parquet":
        try:
            import pyarrow.parquet as pq

            return pq.ParquetFile(path).metadata.num_rows
        except Exception:  # noqa: BLE001
            return -1
    import gzip as gzipmod

    n = 0
    with open(path, "rb") as fh:
        magic = fh.read(2)
    opener = gzipmod.open if magic == b"\x1f\x8b" else open
    with opener(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            n += chunk.count(b"\n")
    if fmt == "csv" and header and n > 0:
        n -= 1
    return n


_ATTACH_BATCH_ROWS = 65_536
_ATTACH_SPOOL_FILE_ROWS = 1_048_576


def attach_duckdb_file(
    spark: SparkSession, path: str
) -> tuple[dict[str, DataFrame], list[str]]:
    """ATTACH 'db.duckdb' (dev.json:596): open the DuckDB file and expose its
    tables as DataFrames. Read-only connector.

    Each table streams out as arrow record batches into a multi-file
    parquet spool which Spark then reads distributed — driver memory is
    bounded by one 64k-row batch regardless of table size (the previous
    ``to_pandas()`` → ``createDataFrame`` funnel held the whole table).
    At cluster scale the spool directory would live on the shared object
    store; the read path is identical.

    Returns ``(tables, spool_dirs)``; the caller owns the spool dirs and
    must delete them when the attachment is released (DETACH / session
    close) — they back the returned DataFrames until then. A failure
    mid-spool cleans up everything this call created before re-raising.
    """
    import shutil

    import duckdb
    import pyarrow.parquet as pq

    con = duckdb.connect(path, read_only=True)
    spools: list[str] = []
    try:
        names = [r[0] for r in con.execute("SHOW TABLES").fetchall()]
        out = {}
        for t in names:
            spool = tempfile.mkdtemp(prefix=f"ddbspark_attach_{t}_")
            spools.append(spool)
            reader = con.execute(f'SELECT * FROM "{t}"').fetch_record_batch(
                _ATTACH_BATCH_ROWS
            )
            writer = None
            fidx = rows_in_file = 0
            try:
                for batch in reader:
                    if writer is None or rows_in_file >= _ATTACH_SPOOL_FILE_ROWS:
                        if writer is not None:
                            writer.close()
                        writer = pq.ParquetWriter(
                            os.path.join(spool, f"part-{fidx:04d}.parquet"),
                            reader.schema,
                        )
                        fidx += 1
                        rows_in_file = 0
                    writer.write_batch(batch)
                    rows_in_file += batch.num_rows
                if writer is None:  # empty table: keep the schema
                    writer = pq.ParquetWriter(
                        os.path.join(spool, "part-0000.parquet"), reader.schema
                    )
            finally:
                if writer is not None:
                    writer.close()
            out[t] = spark.read.parquet(spool)
        return out, spools
    except BaseException:
        for d in spools:
            shutil.rmtree(d, ignore_errors=True)
        raise
    finally:
        con.close()


def expand_local_glob(path: str) -> str:
    """Fail fast with a clear error when a local glob matches nothing."""
    if re.match(r"^[a-z]+://", path):
        return path
    if any(ch in path for ch in "*?[") and not globmod.glob(path):
        raise FileNotFoundError(f"no files match {path!r}")
    return path
