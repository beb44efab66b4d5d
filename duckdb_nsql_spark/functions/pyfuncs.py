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
        # median absolute deviation around the median (DuckDB mad)
        v = s.dropna()
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
    ]:
        spark.udf.register(name, fn)


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
