"""DuckDB SQL type names <-> Spark types.

Covers the type surface observed in the reference benchmark
(/root/reference/eval/data/tables.json + gold DDL in dev.json:228,452,492,500):
VARCHAR/INTEGER/BIGINT/TINYINT/DOUBLE/FLOAT/BOOLEAN/DATE/TIMESTAMP,
STRUCT(...), ``T[]`` lists, fixed ``FLOAT[100]`` arrays and JSON.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_SIMPLE = {
    "VARCHAR": T.StringType(),
    "TEXT": T.StringType(),
    "STRING": T.StringType(),
    "CHAR": T.StringType(),
    "BPCHAR": T.StringType(),
    "JSON": T.StringType(),
    "UUID": T.StringType(),
    "INTEGER": T.IntegerType(),
    "INT": T.IntegerType(),
    "INT4": T.IntegerType(),
    "SIGNED": T.IntegerType(),
    "BIGINT": T.LongType(),
    "INT8": T.LongType(),
    "LONG": T.LongType(),
    "HUGEINT": T.DecimalType(38, 0),
    "SMALLINT": T.ShortType(),
    "INT2": T.ShortType(),
    "SHORT": T.ShortType(),
    "TINYINT": T.ByteType(),
    "INT1": T.ByteType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT8": T.DoubleType(),
    "NUMERIC": T.DoubleType(),
    "FLOAT": T.FloatType(),
    "FLOAT4": T.FloatType(),
    "REAL": T.FloatType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "LOGICAL": T.BooleanType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "DATETIME": T.TimestampType(),
    "TIMESTAMPTZ": T.TimestampType(),
    "TIMESTAMP WITH TIME ZONE": T.TimestampType(),
    # Spark 4.1 TIME (µs precision) — requires spark.sql.timeType.enabled,
    # set in session.RUNTIME_CONFS
    "TIME": T.TimeType(),
    "BLOB": T.BinaryType(),
    "BYTEA": T.BinaryType(),
    "BINARY": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
}

_FIXED_ARRAY_META_KEY = "duckdb.fixed_length"


def parse_duckdb_type(s: str) -> T.DataType:
    """Parse a DuckDB type string into a Spark DataType.

    Fixed-size arrays (``FLOAT[100]``, dev.json:492) become plain
    ArrayType — Spark has no fixed-size array; the declared length is
    enforced at INSERT time by the session (see session._check_fixed_arrays)
    and carried in StructField metadata.
    """
    s = s.strip()
    # trailing array suffixes: T[] or T[100]
    m = re.match(r"^(.*?)\s*\[\s*(\d*)\s*\]$", s, re.DOTALL)
    if m:
        return T.ArrayType(parse_duckdb_type(m.group(1)))
    m = re.match(r"^(VARCHAR|CHAR|BPCHAR|TEXT)\s*\(\s*\d+\s*\)$", s, re.IGNORECASE)
    if m:
        return T.StringType()
    m = re.match(r"^(DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", s, re.IGNORECASE)
    if m:
        return T.DecimalType(int(m.group(2)), int(m.group(3)))
    m = re.match(r"^STRUCT\s*\((.*)\)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        fields = []
        for item in _split_top(m.group(1)):
            item = item.strip()
            fm = re.match(r'^("(?:[^"]|"")+"|\w+)\s+(.*)$', item, re.DOTALL)
            if not fm:
                raise ValueError(f"bad struct field: {item!r}")
            name = fm.group(1).strip('"')
            fields.append(T.StructField(name, parse_duckdb_type(fm.group(2)), True))
        return T.StructType(fields)
    m = re.match(r"^MAP\s*\((.*),(.*)\)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        return T.MapType(parse_duckdb_type(m.group(1)), parse_duckdb_type(m.group(2)))
    m = re.match(r"^UNION\s*\((.*)\)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        # DuckDB tagged union -> struct<__utag:string, member fields...>:
        # the active member holds its value, the rest are NULL, __utag
        # names the active member (union_value/union_tag/union_extract
        # rewrite onto this encoding; frontend/rewrites.py)
        fields = [T.StructField("__utag", T.StringType(), True)]
        for item in _split_top(m.group(1)):
            item = item.strip()
            fm = re.match(r'^("(?:[^"]|"")+"|\w+)\s+(.*)$', item, re.DOTALL)
            if not fm:
                raise ValueError(f"bad union member: {item!r}")
            name = fm.group(1).strip('"')
            fields.append(T.StructField(name, parse_duckdb_type(fm.group(2)), True))
        return T.StructType(fields)
    key = re.sub(r"\s+", " ", s).upper()
    if key in _SIMPLE:
        return _SIMPLE[key]
    raise ValueError(f"unsupported DuckDB type: {s!r}")


def fixed_array_length(s: str) -> int | None:
    m = re.match(r"^.*\[\s*(\d+)\s*\]$", s.strip(), re.DOTALL)
    if m and m.group(1):
        return int(m.group(1))
    return None


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (parens/brackets nest)."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [x for x in out if x.strip()]


_DUCK_KEYWORDS: set | None = None


def _duck_keywords() -> set:
    """DuckDB quotes struct field names that collide with ANY keyword
    (verified: STRUCT(name ..) renders as STRUCT("name" ..) while id/x2
    stay bare). The live keyword list beats hand-maintaining one."""
    global _DUCK_KEYWORDS
    if _DUCK_KEYWORDS is None:
        try:
            import duckdb

            _DUCK_KEYWORDS = {
                r[0]
                for r in duckdb.execute(
                    "select keyword_name from duckdb_keywords()"
                ).fetchall()
            }
        except Exception:  # noqa: BLE001
            _DUCK_KEYWORDS = set()
    return _DUCK_KEYWORDS


def _quote_field(name: str) -> str:
    import re as _re

    if name.lower() in _duck_keywords() or not _re.match(
        r"^[a-z_][a-z0-9_]*$", name
    ):
        return '"' + name.replace('"', '""') + '"'
    return name


def spark_type_to_duckdb(dt: T.DataType) -> str:
    """Render a Spark type using DuckDB's names (for DESCRIBE/table_info,
    matching the shapes the reference's harness introspects,
    /root/reference/examples/utils.py:16-27)."""
    if isinstance(dt, T.StringType):
        return "VARCHAR"
    if isinstance(dt, T.IntegerType):
        return "INTEGER"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "TIMESTAMP"
    if isinstance(dt, T.TimeType):
        return "TIME"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return spark_type_to_duckdb(dt.elementType) + "[]"
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{_quote_field(f.name)} {spark_type_to_duckdb(f.dataType)}"
            for f in dt.fields
        )
        return f"STRUCT({inner})"
    if isinstance(dt, T.MapType):
        return (
            f"MAP({spark_type_to_duckdb(dt.keyType)}, "
            f"{spark_type_to_duckdb(dt.valueType)})"
        )
    return dt.simpleString().upper()
