"""Function-surface parity sweep: evaluate a battery of DuckDB-dialect
expressions through the engine AND through DuckDB on the same tables;
report mismatches/errors. Not a test — an exploration harness used to
drive rewrite-pass coverage (results get pinned as workload queries /
rewrite unit tests once fixed).

Usage: PYTHONPATH=/root/repo python harness/fnsweep.py [group ...]
"""
from __future__ import annotations

import math
import sys

import duckdb

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "orders", "lineitem", "documents"]

# Each entry: (group, expression) evaluated as
#   SELECT <expr> AS v FROM nation ORDER BY n_nationkey LIMIT 5
# with n_nationkey aliased k available.
EXPRS: list[tuple[str, str]] = [
    # --- string ---
    ("str", "trim('  x  ')"),
    ("str", "trim('xxabcxx', 'x')"),
    ("str", "ltrim('xxabc', 'x')"),
    ("str", "rtrim('abcxx', 'x')"),
    ("str", "replace(n_name, 'A', '_')"),
    ("str", "translate(n_name, 'AE', 'ae')"),
    ("str", "instr(n_name, 'AN')"),
    ("str", "strpos(n_name, 'AN')"),
    ("str", "position('AN' IN n_name)"),
    ("str", "starts_with(n_name, 'A')"),
    ("str", "ends_with(n_name, 'A')"),
    ("str", "suffix(n_name, 'IA')"),
    ("str", "prefix(n_name, 'AL')"),
    ("str", "contains(n_name, 'RA')"),
    ("str", "concat_ws('-', n_name, 'x')"),
    ("str", "md5(n_name)"),
    ("str", "levenshtein(n_name, 'ALGERIA')"),
    ("str", "damerau_levenshtein(n_name, 'ALGERIA')"),
    ("str", "jaccard(n_name, 'ALGERIA')"),
    ("str", "jaro_similarity(n_name, 'ALGERIA')"),
    ("str", "jaro_winkler_similarity(n_name, 'ALGERIA')"),
    ("str", "hamming('abc', 'abd')"),
    ("str", "regexp_matches(n_name, 'A.G')"),
    ("str", "regexp_split_to_array(n_name, '[AEIOU]+')"),
    ("str", "string_split_regex(n_name, '[AEIOU]+')"),
    ("str", "to_hex(255)"),
    ("str", "from_hex('ff')"),
    ("str", "unicode(n_name)"),
    ("str", "ord(n_name)"),
    ("str", "ascii(n_name)"),
    ("str", "nfc_normalize(n_name)"),
    ("str", "strip_accents('café')"),
    ("str", "reverse(n_name)"),
    ("str", "format('{} has {}', n_name, n_nationkey)"),
    ("str", "bar(n_nationkey, 0, 24, 10)"),
    ("str", "to_base(n_nationkey + 1, 2)"),
    ("str", "left(n_name, 3)"),
    ("str", "right(n_name, 3)"),
    ("str", "substr(n_name, 2, 3)"),
    ("str", "substring(n_name FROM 2 FOR 3)"),
    ("str", "char_length(n_name)"),
    ("str", "character_length(n_name)"),
    ("str", "octet_length(n_name)"),
    ("str", "bit_length(n_name)"),
    # --- numeric ---
    ("num", "gcd(n_nationkey + 4, 6)"),
    ("num", "lcm(n_nationkey + 1, 3)"),
    ("num", "factorial(5)"),
    ("num", "even(2.5)"),
    ("num", "cbrt(27.0)"),
    ("num", "exp(1.0)"),
    ("num", "ln(2.718281828)"),
    ("num", "log2(8.0)"),
    ("num", "log10(100.0)"),
    ("num", "log(100.0)"),
    ("num", "log(2, 8.0)"),
    ("num", "degrees(pi())"),
    ("num", "radians(180.0)"),
    ("num", "isnan(0.0/0.0)"),
    ("num", "isinf(1.0/0.0)"),
    ("num", "isfinite(1.0)"),
    ("num", "trunc(2.7)"),
    ("num", "round(1234.5678, -2)"),
    ("num", "fdiv(7.0, 2.0)"),
    ("num", "fmod(7.0, 2.5)"),
    ("num", "7 // 2"),
    ("num", "7 % 3"),
    ("num", "power(2, 10)"),
    ("num", "pow(2, 10)"),
    ("num", "sign(-3.5)"),
    ("num", "signbit(-0.0)"),
    ("num", "atan2(1.0, 1.0)"),
    ("num", "cot(1.0)"),
    ("num", "gamma(5.0)"),
    ("num", "lgamma(5.0)"),
    ("num", "nextafter(1.0, 2.0)"),
    ("num", "bit_count(7)"),
    ("num", "greatest(1, n_nationkey, 3)"),
    ("num", "least(1, n_nationkey, 3)"),
    # --- date/time ---
    ("dt", "make_date(2024, 2, 29)"),
    ("dt", "make_timestamp(2024, 2, 29, 12, 30, 15.5)"),
    ("dt", "last_day(DATE '2024-02-03')"),
    ("dt", "date_add(DATE '2024-01-31', INTERVAL 1 MONTH)"),
    ("dt", "DATE '2024-01-31' + INTERVAL 1 MONTH"),
    ("dt", "DATE '2024-03-01' - DATE '2024-02-01'"),
    ("dt", "age(TIMESTAMP '2024-03-01', TIMESTAMP '2023-01-15')"),
    ("dt", "time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-01-01 12:34:56')"),
    ("dt", "time_bucket(INTERVAL 1 WEEK, DATE '2024-01-10')"),
    ("dt", "strftime(DATE '2024-02-03', '%Y/%m/%d')"),
    ("dt", "strftime(TIMESTAMP '2024-02-03 04:05:06', '%H:%M:%S')"),
    ("dt", "dayofweek(DATE '2024-02-04')"),
    ("dt", "weekofyear(DATE '2024-02-04')"),
    ("dt", "yearweek(DATE '2024-02-04')"),
    ("dt", "quarter(DATE '2024-05-04')"),
    ("dt", "epoch(TIMESTAMP '2024-01-01 00:00:01')"),
    ("dt", "to_timestamp(1704067201)"),
    ("dt", "century(DATE '2024-01-01')"),
    ("dt", "timezone(TIMESTAMP '2024-01-01 00:00:01')"),
    ("dt", "monthname(DATE '2024-05-04')"),
    ("dt", "dayname(DATE '2024-05-04')"),
    ("dt", "greatest(DATE '2024-01-01', DATE '2023-01-01')"),
    # --- list ---
    ("list", "list_contains([1,2,3], 2)"),
    ("list", "array_contains([1,2,3], 2)"),
    ("list", "list_position([1,2,3], 3)"),
    ("list", "list_indexof([1,2,3], 3)"),
    ("list", "list_sort([3,1,2])"),
    ("list", "list_sort([3,1,2], 'DESC')"),
    ("list", "list_reverse_sort([3,1,2])"),
    ("list", "list_reverse([3,1,2])"),
    ("list", "list_distinct([1,2,2,3])"),
    ("list", "list_concat([1,2],[3])"),
    ("list", "[1,2] || [3]"),
    ("list", "flatten([[1,2],[3]])"),
    ("list", "range(5)"),
    ("list", "range(1, 5)"),
    ("list", "range(1, 10, 2)"),
    ("list", "list_zip([1,2],[3,4])"),
    ("list", "list_min([3,1,2])"),
    ("list", "list_max([3,1,2])"),
    ("list", "list_sum([1,2,3])"),
    ("list", "list_avg([1.0,2.0,3.0])"),
    ("list", "list_aggregate([1,2,3], 'sum')"),
    ("list", "list_slice([1,2,3,4], 2, 3)"),
    ("list", "array_slice([1,2,3,4], 2, 3)"),
    ("list", "[1,2,3][-1]"),
    ("list", "list_transform([1,2,3], x -> x * 2)"),
    ("list", "list_filter([1,2,3,4], x -> x % 2 = 0)"),
    ("list", "list_reduce([1,2,3], (a,b) -> a + b)"),
    ("list", "list_any_value([NULL, 2, 3])"),
    ("list", "array_to_string([1,2,3], '-')"),
    ("list", "list_grade_up([30,10,20])"),
    ("list", "list_unique([1,2,2])"),
    ("list", "len([1,2,3])"),
    ("list", "repeat([1,2], 2)"),
    # --- misc / conditional ---
    ("misc", "typeof(1)"),
    ("misc", "typeof('a')"),
    ("misc", "ifnull(NULL, 'x')"),
    ("misc", "if(n_nationkey > 10, 'hi', 'lo')"),
    ("misc", "nullif(1, 1)"),
    ("misc", "coalesce(NULL, NULL, 3)"),
    ("misc", "hash('abc')"),
    ("misc", "CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END"),
    ("misc", "n_nationkey BETWEEN 3 AND 7"),
    ("misc", "n_nationkey IS DISTINCT FROM 3"),
    ("misc", "bin(10)"),
    ("misc", "hex(255)"),
    ("misc", "least_common_multiple := NULL IS NULL"),
]

# aggregates: SELECT <expr> AS v FROM orders (single row result)
AGG_EXPRS: list[tuple[str, str]] = [
    ("agg", "product(CASE WHEN o_orderkey <= 12 THEN 2 ELSE 1 END)"),
    ("agg", "fsum(o_totalprice)"),
    ("agg", "favg(o_totalprice)"),
    ("agg", "skewness(o_totalprice)"),
    ("agg", "kurtosis(o_totalprice)"),
    ("agg", "entropy(o_orderstatus)"),
    ("agg", "corr(o_totalprice, o_custkey)"),
    ("agg", "covar_pop(o_totalprice, o_custkey)"),
    ("agg", "covar_samp(o_totalprice, o_custkey)"),
    ("agg", "regr_slope(o_totalprice, o_custkey)"),
    ("agg", "regr_intercept(o_totalprice, o_custkey)"),
    ("agg", "regr_r2(o_totalprice, o_custkey)"),
    ("agg", "regr_count(o_totalprice, o_custkey)"),
    ("agg", "any_value(o_orderstatus)"),
    ("agg", "first(o_orderstatus ORDER BY o_orderkey)"),
    ("agg", "last(o_orderstatus ORDER BY o_orderkey)"),
    ("agg", "count_if(o_totalprice > 100000)"),
    ("agg", "countif(o_totalprice > 100000)"),
    ("agg", "sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F')"),
    ("agg", "approx_count_distinct(o_custkey)"),
    ("agg", "approx_quantile(o_totalprice, 0.5)"),
    ("agg", "reservoir_quantile(o_totalprice, 0.5)"),
    ("agg", "histogram(o_orderstatus)"),
    ("agg", "bool_and(o_totalprice > 0)"),
    ("agg", "bool_or(o_totalprice > 500000)"),
    ("agg", "variance(o_totalprice)"),
    ("agg", "var_pop(o_totalprice)"),
    ("agg", "stddev(o_totalprice)"),
    ("agg", "stddev_pop(o_totalprice)"),
    ("agg", "median(o_totalprice)"),
    ("agg", "mad(o_totalprice)"),
    ("agg", "geomean(o_totalprice)"),
    ("agg", "kahan_sum(o_totalprice)"),
    ("agg", "sum(DISTINCT o_orderstatus = 'F')"),
    ("agg", "arbitrary(o_orderstatus)"),
    ("agg", "min(o_orderstatus || 'x')"),
    ("agg", "max_by(o_orderstatus, o_totalprice, 2)"),
    ("agg", "quantile_cont(o_totalprice, [0.25, 0.75])"),
]


def canon(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict) and set(v) == {"key", "value"} and \
            isinstance(v.get("key"), list):
        # duckdb's python client renders MAP as {'key': [...], 'value': [...]}
        v = dict(zip(v["key"], v["value"]))
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main() -> None:
    groups = set(sys.argv[1:])
    from duckdb_nsql_spark.session import DuckSparkSession, build_spark

    spark = build_spark(app_name="fnsweep", cpus=8)
    eng = DuckSparkSession(spark=spark)
    eng.register_parquet_dir(SF)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    cases = [
        (g, f"SELECT {e} AS v FROM nation ORDER BY n_nationkey LIMIT 5")
        for g, e in EXPRS
    ] + [(g, f"SELECT {e} AS v FROM orders") for g, e in AGG_EXPRS]

    ok = mismatch = engine_err = oracle_err = 0
    for g, sql in cases:
        if groups and g not in groups:
            continue
        try:
            want = [canon(r[0]) for r in con.execute(sql).fetchall()]
        except Exception as e:  # noqa: BLE001
            oracle_err += 1
            print(f"[oracle-err] {sql!r}: {type(e).__name__}: {str(e).splitlines()[0][:100]}")
            continue
        try:
            got = [canon(r[0]) for r in eng.execute(sql).collect()]
        except Exception as e:  # noqa: BLE001
            engine_err += 1
            print(f"[ENGINE-ERR] {sql!r}: {type(e).__name__}: {str(e).splitlines()[0][:160]}")
            continue
        if got == want:
            ok += 1
        else:
            mismatch += 1
            print(f"[MISMATCH]   {sql!r}\n   duckdb={want[:3]}\n   engine={got[:3]}")
    print(
        f"\nok={ok} mismatch={mismatch} engine_err={engine_err} "
        f"oracle_err={oracle_err}"
    )


if __name__ == "__main__":
    main()
