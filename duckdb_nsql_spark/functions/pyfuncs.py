"""Python-backed scalar/aggregate functions for DuckDB surface Spark lacks.

Everything here is an Arrow-batched pandas UDF (never row-at-a-time
Python UDFs): the string-distance family, unicode normalization, and the
nested-aggregation statistics (entropy, mad) that single-level Spark
aggregates cannot express. Registration is name-for-name with DuckDB
(reference surface: duckdb 0.9 function catalog, e.g. jaccard /
jaro_winkler_similarity / damerau_levenshtein / strip_accents), so no
rewrite pass is needed — the SQL resolves directly.

Scale note: scalar pandas UDFs ship Arrow batches to Python workers —
fine for occasional expressions, but the hot relational path stays
JVM-side; nothing in the engine's own rewrites emits these functions.
"""
from __future__ import annotations

import math
import unicodedata

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql import SparkSession

_REGISTERED: set[int] = set()


# ---------------------------------------------------------------------------
# string similarity (pure-python kernels over Arrow string batches)
# ---------------------------------------------------------------------------


def _damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (matches DuckDB, which uses the
    full algorithm with an alphabet map, not the OSA restriction)."""
    da: dict[str, int] = {}
    la, lb = len(a), len(b)
    maxdist = la + lb
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions / 2
    m = matches
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jaro_winkler(a: str, b: str) -> float:
    j = _jaro(a, b)
    if j > 0.7:
        prefix = 0
        for x, y in zip(a[:4], b[:4]):
            if x == y:
                prefix += 1
            else:
                break
        j += prefix * 0.1 * (1 - j)
    return j


def _pairwise(f):
    def apply(s1: pd.Series, s2: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(s1, s2):
            if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
                out.append(None)
            else:
                out.append(f(str(a), str(b)))
        return pd.Series(out, dtype="object")

    return apply


# ---------------------------------------------------------------------------
# DuckDB value rendering (CAST(composite AS VARCHAR) parity)
# ---------------------------------------------------------------------------


def duck_interval_str(months: int, days: int, micros: int) -> str:
    """DuckDB's interval-to-VARCHAR rendering from its internal
    (months, days, micros) triple: '1 year 2 months 3 days 01:30:00',
    time part only when micros != 0 or everything is zero, fractional
    seconds trimmed of trailing zeros ('.5', '.000999')."""
    parts: list[str] = []
    y = int(months / 12) if months else 0  # truncate toward zero
    m = months - y * 12
    if y:
        parts.append(f"{y} year" + ("" if abs(y) == 1 else "s"))
    if m:
        parts.append(f"{m} month" + ("" if abs(m) == 1 else "s"))
    if days:
        parts.append(f"{days} day" + ("" if abs(days) == 1 else "s"))
    if micros or not parts:
        sign = "-" if micros < 0 else ""
        a = abs(micros)
        h, rem = divmod(a, 3_600_000_000)
        mm, rem = divmod(rem, 60_000_000)
        ss, frac = divmod(rem, 1_000_000)
        t = f"{sign}{h:02d}:{mm:02d}:{ss:02d}"
        if frac:
            t += ("." + f"{frac:06d}").rstrip("0")
        parts.append(t)
    return " ".join(parts)


def _duck_float_str(v: float) -> str:
    """DuckDB double-to-VARCHAR: 'nan'/'inf', integral doubles keep a
    trailing .0 in fixed notation below 1e16, shortest-round-trip
    otherwise; the one shortest-repr divergence (single-digit mantissa at
    e-05: DuckDB prints fixed '0.00001') is special-cased."""
    import re as _re

    if math.isnan(v):
        return "nan"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    if v == 0.0:
        return "0.0"
    if v == int(v) and abs(v) < 1e16:
        return f"{v:.1f}"
    r = repr(v)
    m = _re.match(r"^(-?)(\d)e-05$", r)
    if m:
        return f"{m.group(1)}0.0000{m.group(2)}"
    return r


def duck_value_str(v) -> str:
    """Render a Python value the way DuckDB CASTs it to VARCHAR inside
    composites: strings raw (unquoted), NULL uppercase, booleans
    lowercase, lists '[a, b]', structs \"{'f': v}\" (field names quoted),
    maps '{k=v}' (unquoted), blobs with \\xNN escapes, intervals via
    duck_interval_str. Verified cell-by-cell against DuckDB in
    tests/test_oracle_parity.py::test_cast_varchar_rendering grid."""
    import datetime as _dt
    import decimal as _dec

    from pyspark.sql import Row

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, float):
        return _duck_float_str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, _dec.Decimal):
        return str(v)
    if isinstance(v, _dt.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += ("." + f"{v.microsecond:06d}").rstrip("0")
        return s
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dt.timedelta):
        total = (
            v.days * 86_400_000_000 + v.seconds * 1_000_000 + v.microseconds
        )
        # DuckDB's (days, micros) split truncates toward zero, so -26h
        # renders '-1 day -02:00:00' and -12h renders '-12:00:00'
        days = int(total / 86_400_000_000)
        return duck_interval_str(0, days, total - days * 86_400_000_000)
    if isinstance(v, (bytes, bytearray)):
        return "".join(
            chr(b) if 32 <= b <= 126 and b != 0x5C else f"\\x{b:02X}"
            for b in v
        )
    if isinstance(v, Row):  # before tuple: Row subclasses tuple
        return "{" + ", ".join(
            f"'{k}': {duck_value_str(x)}"
            for k, x in zip(v.__fields__, v)
        ) + "}"
    if isinstance(v, dict):
        return "{" + ", ".join(
            f"{duck_value_str(k)}={duck_value_str(x)}"
            for k, x in v.items()
        ) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(duck_value_str(x) for x in v) + "]"
    return str(v)


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def register_python_functions(spark: SparkSession) -> None:
    """Register the battery on ``spark`` (idempotent per SparkSession)."""
    key = id(spark)
    if key in _REGISTERED:
        return
    _REGISTERED.add(key)

    @pandas_udf("long")
    def damerau_levenshtein(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return _pairwise(_damerau_levenshtein)(s1, s2).astype("Int64")

    @pandas_udf("double")
    def jaccard(s1: pd.Series, s2: pd.Series) -> pd.Series:
        # DuckDB jaccard: similarity of the character SETS of the strings
        def f(a: str, b: str) -> float:
            sa, sb = set(a), set(b)
            if not sa and not sb:
                return 1.0
            return len(sa & sb) / len(sa | sb)

        return _pairwise(f)(s1, s2).astype("float64")

    @pandas_udf("double")
    def jaro_similarity(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return _pairwise(_jaro)(s1, s2).astype("float64")

    @pandas_udf("double")
    def jaro_winkler_similarity(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return _pairwise(_jaro_winkler)(s1, s2).astype("float64")

    @pandas_udf("long")
    def hamming(s1: pd.Series, s2: pd.Series) -> pd.Series:
        # DuckDB mismatch count; errors on unequal lengths -> NULL here
        def f(a: str, b: str):
            if len(a) != len(b):
                return None
            return sum(1 for x, y in zip(a, b) if x != y)

        return _pairwise(f)(s1, s2).astype("Int64")

    @pandas_udf("string")
    def nfc_normalize(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    @pandas_udf("string")
    def strip_accents(s: pd.Series) -> pd.Series:
        def f(v):
            if v is None:
                return None
            return "".join(
                c
                for c in unicodedata.normalize("NFD", v)
                if unicodedata.category(c) != "Mn"
            )

        return s.map(f)

    @pandas_udf("long")
    def py_gcd(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if pd.isna(x) or pd.isna(y) else math.gcd(int(x), int(y))
                for x, y in zip(a, b)
            ],
            dtype="Int64",
        )

    @pandas_udf("long")
    def py_lcm(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if pd.isna(x) or pd.isna(y) else math.lcm(int(x), int(y))
                for x, y in zip(a, b)
            ],
            dtype="Int64",
        )

    @pandas_udf("double")
    def py_gamma(x: pd.Series) -> pd.Series:
        return pd.Series(
            [None if pd.isna(v) else math.gamma(float(v)) for v in x],
            dtype="float64",
        )

    @pandas_udf("double")
    def py_lgamma(x: pd.Series) -> pd.Series:
        return pd.Series(
            [None if pd.isna(v) else math.lgamma(float(v)) for v in x],
            dtype="float64",
        )

    @pandas_udf("double")
    def py_nextafter(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if pd.isna(x) or pd.isna(y) else math.nextafter(float(x), float(y))
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    @pandas_udf("boolean")
    def signbit(x: pd.Series) -> pd.Series:
        # DuckDB's signbit is a plain x < 0 (its signbit(-0.0) is false)
        return pd.Series(
            [None if pd.isna(v) else float(v) < 0 for v in x],
            dtype="object",
        )

    _PARTIAL_BLOCKS = ["", "▏", "▎", "▍", "▌",
                       "▋", "▊", "▉"]

    @pandas_udf("string")
    def bar(x: pd.Series, mn: pd.Series, mx: pd.Series, w: pd.Series) -> pd.Series:
        # DuckDB bar(): full blocks + eighth partial, then space-padded to
        # `width` BYTES (utf-8 — a block char counts 3), matching duckdb 1.x
        def f(v, lo, hi, width):
            if pd.isna(v) or pd.isna(lo) or pd.isna(hi) or pd.isna(width):
                return None
            width = int(width)
            span = float(hi) - float(lo)
            frac = 0.0 if span == 0 else (float(v) - float(lo)) / span
            units = max(0.0, min(1.0, frac)) * width
            full = int(units)
            s = "█" * full + _PARTIAL_BLOCKS[int((units - full) * 8)]
            pad = width - len(s.encode("utf-8"))
            return s + " " * pad if pad > 0 else s

        return pd.Series(
            [f(a, b, c, d) for a, b, c, d in zip(x, mn, mx, w)], dtype="object"
        )

    @pandas_udf("string")
    def duckdb_typename(t: pd.Series) -> pd.Series:
        return t.map(lambda v: None if v is None else _duckdb_typename(v))

    # -- JSON battery (DuckDB json_* surface beyond the -> / ->> arrows) ---

    @pandas_udf("string")
    def json_extract(j: pd.Series, p: pd.Series) -> pd.Series:
        return pd.Series(
            [_json_extract(a, b, as_text=False) for a, b in zip(j, p)],
            dtype="object",
        )

    @pandas_udf("string")
    def json_extract_string(j: pd.Series, p: pd.Series) -> pd.Series:
        return pd.Series(
            [_json_extract(a, b, as_text=True) for a, b in zip(j, p)],
            dtype="object",
        )

    @pandas_udf("boolean")
    def json_valid(j: pd.Series) -> pd.Series:
        import json as _json

        def f(v):
            if v is None:
                return None
            try:
                _json.loads(v)
                return True
            except Exception:  # noqa: BLE001
                return False

        return j.map(f)

    @pandas_udf("array<string>")
    def json_keys(j: pd.Series) -> pd.Series:
        import json as _json

        def f(v):
            if v is None:
                return None
            try:
                doc = _json.loads(v)
            except Exception:  # noqa: BLE001
                return None
            return list(doc.keys()) if isinstance(doc, dict) else None

        return j.map(f)

    @pandas_udf("string")
    def json_minify(j: pd.Series) -> pd.Series:
        """DuckDB ``json(x)``: parse and re-render compact (minified,
        key order preserved). Invalid input raises, like DuckDB's cast
        error — not a silent NULL."""
        import json as _json

        def f(v):
            if v is None:
                return None
            return _json.dumps(
                _json.loads(v), separators=(",", ":"), ensure_ascii=False
            )

        return j.map(f)

    @pandas_udf("string")
    def json_merge_patch(a: pd.Series, b: pd.Series) -> pd.Series:
        import json as _json

        def merge(x, y):
            # RFC 7396: y's nulls delete keys; non-objects replace
            if not isinstance(y, dict):
                return y
            if not isinstance(x, dict):
                x = {}
            out = dict(x)
            for k, v in y.items():
                if v is None:
                    out.pop(k, None)
                else:
                    out[k] = merge(out.get(k), v)
            return out

        def f(u, v):
            if u is None or v is None:
                return None
            try:
                m = merge(_json.loads(u), _json.loads(v))
            except Exception:  # noqa: BLE001
                return None
            return _json.dumps(m, separators=(",", ":"), ensure_ascii=False)

        return pd.Series([f(u, v) for u, v in zip(a, b)], dtype="object")

    @pandas_udf("boolean")
    def json_contains(hay: pd.Series, needle: pd.Series) -> pd.Series:
        import json as _json

        def contains(doc, target):
            if doc == target:
                return True
            if isinstance(doc, dict):
                return any(contains(v, target) for v in doc.values())
            if isinstance(doc, list):
                return any(contains(v, target) for v in doc)
            return False

        def f(h, n):
            if h is None or n is None:
                return None
            try:
                return contains(_json.loads(h), _json.loads(n))
            except Exception:  # noqa: BLE001
                return None

        return pd.Series([f(h, n) for h, n in zip(hay, needle)], dtype="object")

    @pandas_udf("string")
    def json_type(j: pd.Series) -> pd.Series:
        import json as _json

        def f(v):
            if v is None:
                return None
            try:
                doc = _json.loads(v)
            except Exception:  # noqa: BLE001
                return None
            if isinstance(doc, bool):
                return "BOOLEAN"
            if isinstance(doc, int):
                return "BIGINT" if doc >= 0 else "BIGINT"
            if isinstance(doc, float):
                return "DOUBLE"
            if isinstance(doc, str):
                return "VARCHAR"
            if isinstance(doc, list):
                return "ARRAY"
            if isinstance(doc, dict):
                return "OBJECT"
            return "NULL"

        return pd.Series([f(v) for v in j], dtype="object")

    @pandas_udf("string")
    def json_quote(j: pd.Series) -> pd.Series:
        """DuckDB json_quote: JSON-encode a VARCHAR value (quotes +
        escapes); NULL passes through."""
        import json as _json

        return j.map(
            lambda v: None if v is None else _json.dumps(
                v, ensure_ascii=False
            )
        )

    @pandas_udf("string")
    def regexp_escape(s: pd.Series) -> pd.Series:
        """RE2 QuoteMeta semantics (DuckDB regexp_escape): backslash
        every byte outside [A-Za-z0-9_]."""

        def f(v):
            if v is None:
                return None
            return "".join(
                c if c.isalnum() and c.isascii() or c == "_" else "\\" + c
                for c in v
            )

        return s.map(f)

    @pandas_udf("string")
    def json_obj_values(j: pd.Series) -> pd.Series:
        """Values of a JSON object rendered as a JSON array, in key
        order — the assembly half of the json_array() rewrite."""
        import json as _json

        def f(v):
            if v is None:
                return None
            try:
                doc = _json.loads(v)
            except Exception:  # noqa: BLE001
                return None
            vals = list(doc.values()) if isinstance(doc, dict) else doc
            return _json.dumps(vals, separators=(",", ":"),
                               ensure_ascii=False)

        return pd.Series([f(v) for v in j], dtype="object")

    @pandas_udf("string")
    def json_structure(j: pd.Series) -> pd.Series:
        import json as _json

        def f(v):
            if v is None:
                return None
            try:
                doc = _json.loads(v)
            except Exception:  # noqa: BLE001
                return None
            return _json.dumps(
                _json_struct(doc), separators=(",", ":"), ensure_ascii=False
            )

        return j.map(f)

    # -- grouped aggregates Spark can't express in one level ---------------
    # (nested aggregation over the group's value distribution)

    @pandas_udf("double")
    def entropy(s: pd.Series) -> float:
        # DuckDB: Shannon entropy (log2) of the value-frequency distribution
        counts = s.dropna().value_counts()
        n = counts.sum()
        if n == 0:
            return None
        p = counts / n
        return float(-(p * p.map(math.log2)).sum())

    @pandas_udf("double")
    def product(s: pd.Series) -> float:
        # DuckDB product aggregate (handles zeros/negatives; empty -> NULL)
        v = s.dropna()
        if v.empty:
            return None
        return float(v.astype("float64").prod())

    @pandas_udf("double")
    def mad(s: pd.Series) -> float:
        # median absolute deviation around the median (DuckDB mad);
        # DECIMAL columns arrive as object-dtype Decimals — coerce
        v = s.dropna().astype("float64")
        if v.empty:
            return None
        med = v.median()
        return float((v - med).abs().median())

    for name, fn in [
        ("damerau_levenshtein", damerau_levenshtein),
        ("jaccard", jaccard),
        ("jaro_similarity", jaro_similarity),
        ("jaro_winkler_similarity", jaro_winkler_similarity),
        ("mismatches", hamming),
        ("hamming", hamming),
        ("nfc_normalize", nfc_normalize),
        ("strip_accents", strip_accents),
        ("gcd", py_gcd),
        ("lcm", py_lcm),
        ("greatest_common_divisor", py_gcd),
        ("least_common_multiple", py_lcm),
        ("gamma", py_gamma),
        ("lgamma", py_lgamma),
        ("nextafter", py_nextafter),
        ("entropy", entropy),
        ("mad", mad),
        ("signbit", signbit),
        ("bar", bar),
        ("duckdb_typename", duckdb_typename),
        ("product", product),
        ("json_extract", json_extract),
        ("json_extract_string", json_extract_string),
        ("json_extract_path", json_extract),
        ("json_extract_path_text", json_extract_string),
        ("json_valid", json_valid),
        ("json_keys", json_keys),
        ("json_structure", json_structure),
        ("json_merge_patch", json_merge_patch),
        ("json", json_minify),
        ("json_contains", json_contains),
        ("json_type", json_type),
        ("__ddb_json_obj_values", json_obj_values),
        ("json_quote", json_quote),
        ("regexp_escape", regexp_escape),
    ]:
        spark.udf.register(name, fn)

    # CAST(composite AS VARCHAR) rendering parity — the rewrite layer emits
    # duckdb_varchar(expr) for statically-composite cast operands. Classic
    # (pickled) UDF on purpose: the input type is arbitrary nested data, and
    # this only fires on explicit composite->VARCHAR casts (cold path).
    def duckdb_varchar(v):
        return None if v is None else duck_value_str(v)

    spark.udf.register("duckdb_varchar", duckdb_varchar)


# ---------------------------------------------------------------------------
# JSON helpers (DuckDB json_extract / json_structure semantics)
# ---------------------------------------------------------------------------


def _json_path_steps(path: str):
    """'$.a."b c"[1]', '/a/b/1', or a bare key -> list of steps (str keys
    and int indexes); None for unsupported (wildcard) paths."""
    import re as _re

    if path is not None and not isinstance(path, str):
        # DuckDB: integer path = 0-based array index (arrives as a
        # numpy int64 through the Arrow batch, not a python int)
        try:
            return [int(path)]
        except (TypeError, ValueError):
            return None
    p = (path or "").strip()
    if p.startswith("$"):
        body = p[1:]
        steps = []
        for m in _re.finditer(
            r'\.\s*"((?:[^"\\]|\\.)*)"|\.([^.\[\]]+)|\[(\d+)\]|(\*)', body
        ):
            if m.group(4) is not None:
                return None  # wildcard: unsupported
            if m.group(3) is not None:
                steps.append(int(m.group(3)))
            else:
                steps.append(m.group(1) if m.group(1) is not None else m.group(2))
        return steps
    if p.startswith("/"):
        return [
            int(seg) if seg.isdigit() else seg
            for seg in p.split("/")[1:]
            if seg != ""
        ]
    return [p]


def _json_extract(doc_text, path, as_text: bool):
    import json as _json

    if doc_text is None or path is None:
        return None
    try:
        doc = _json.loads(doc_text)
    except Exception:  # noqa: BLE001
        return None
    steps = _json_path_steps(path)
    if steps is None:
        return None
    for s in steps:
        if isinstance(s, int):
            if not isinstance(doc, list) or s >= len(doc):
                return None
            doc = doc[s]
        else:
            if not isinstance(doc, dict) or s not in doc:
                return None
            doc = doc[s]
    if as_text:
        if doc is None:
            return None
        if isinstance(doc, str):
            return doc
        return _json.dumps(doc, separators=(",", ":"), ensure_ascii=False)
    return _json.dumps(doc, separators=(",", ":"), ensure_ascii=False)


def _json_struct(doc):
    """DuckDB json_structure type tree: UBIGINT for non-negative ints,
    BIGINT negative, DOUBLE floats, VARCHAR strings, BOOLEAN bools,
    "NULL" nulls; arrays unify to the one element structure or "JSON"."""
    if doc is None:
        return "NULL"
    if isinstance(doc, bool):
        return "BOOLEAN"
    if isinstance(doc, int):
        return "UBIGINT" if doc >= 0 else "BIGINT"
    if isinstance(doc, float):
        return "DOUBLE"
    if isinstance(doc, str):
        return "VARCHAR"
    if isinstance(doc, list):
        if not doc:
            return ["NULL"]
        elems = [_json_struct(x) for x in doc]
        first = elems[0]
        return [first] if all(e == first for e in elems) else ["JSON"]
    return {k: _json_struct(v) for k, v in doc.items()}


# ---------------------------------------------------------------------------
# Spark simpleString -> DuckDB type-name rendering (for typeof())
# ---------------------------------------------------------------------------

_TYPE_NAMES = {
    "tinyint": "TINYINT", "smallint": "SMALLINT", "int": "INTEGER",
    "bigint": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
    "string": "VARCHAR", "boolean": "BOOLEAN", "binary": "BLOB",
    "date": "DATE", "timestamp": "TIMESTAMP", "timestamp_ntz": "TIMESTAMP",
    "void": '"NULL"',
}


def _split_top(s: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _duckdb_typename(t: str) -> str:
    t = t.strip()
    if t.startswith("array<") and t.endswith(">"):
        return _duckdb_typename(t[6:-1]) + "[]"
    if t.startswith("map<") and t.endswith(">"):
        k, v = _split_top(t[4:-1])
        return f"MAP({_duckdb_typename(k)}, {_duckdb_typename(v)})"
    if t.startswith("struct<") and t.endswith(">"):
        fields = []
        for p in _split_top(t[7:-1]):
            name, _, ft = p.partition(":")
            fields.append(f"{name.strip()} {_duckdb_typename(ft)}")
        return "STRUCT(" + ", ".join(fields) + ")"
    if t.startswith("decimal("):
        return "DECIMAL" + t[7:]
    if t.startswith("interval"):
        return "INTERVAL"
    return _TYPE_NAMES.get(t, t.upper())
