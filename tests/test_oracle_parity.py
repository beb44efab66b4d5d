"""Local mirror of the driver's correctness gate: every workload query runs
on Spark AND its oracle SQL on DuckDB over the same parquet; results must
match as order-insensitive multisets (exact for ints/strings, rounded
values are compared as produced since both sides round explicitly).
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(rows, colnames, kinds=None):
    """Sort columns by name, normalize cell values, return sorted multiset.

    ``kinds`` (per input column, aligned with colnames): the pandas
    RENDER kind of the column ('float'/'int'/...) — a DuckDB HUGEINT
    fetches as a Python int here but the driver's fetchdf renders it
    float64, so cells are normalized by column kind, not value type."""

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def cell(v, kind=None):
        if v is None:
            return "∅"
        if kind == "float" and isinstance(v, (int, float)) and not isinstance(
            v, bool
        ):
            v = float(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # Driver-hash emulation: 6 DECIMAL PLACES absolute. Inferred
            # from two driver observations that pin it on both sides —
            # op_similarity_topk was hash-GREEN with DuckDB's float32
            # cosine junk (0.2928000092 vs Spark 0.2928: equal at 6dp)
            # while q91 was hash-RED on ±0.01 at 3e5 magnitude (visible
            # at 6dp). The old :.6g sig-figs canon hid exactly that q91
            # class; :.6f reproduces both driver verdicts.
            return f"{v + 0.0:.6f}"  # +0.0 folds -0.0 into 0.0
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(
            cell(vals[i], kinds[i] if kinds else None) for i in order
        ))
    return sorted(out)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
ORACLED = sorted(n for n in QUERIES if n in ORACLES)
ROWS_ONLY = sorted(n for n in QUERIES if n not in ORACLES)


def _duckdb_render_kind(type_str: str) -> str:
    """How the driver's DuckDB fetchdf() renders a column into pandas:
    DECIMAL and HUGEINT become float64 (probed on duckdb 1.0), native
    ints stay int64.  The driver hashes the RENDERED frame, so a Spark
    DecimalType/bigint against a DuckDB DECIMAL/HUGEINT is hash-red
    even when every value is numerically identical (r5: q88/q90/q107)."""
    t = type_str.upper()
    if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT", "DOUBLE",
                                        "FLOAT", "REAL"):
        return "float"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t == "BOOLEAN":
        return "bool"
    return "obj"


def _spark_render_kind(dt) -> str:
    """How Spark toPandas() renders a column: DecimalType stays an
    object column of decimal.Decimal (renders '151.00', not '151.0')
    — it can NEVER hash-equal a DuckDB DECIMAL's float64 rendering."""
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "float"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, T.BooleanType):
        return "bool"
    return "obj"


def assert_driver_sortable(name, spark_schema, duckdb_cols_types):
    """Registry-wide guard (r6 verdict item 1b, second shipment of the
    class): the driver canonicalizer pandas-sorts the RAW fetched frame
    (``toPandas()`` / ``fetchdf()`` + ``sort_values`` over all columns),
    so a top-level LIST/MAP cell fetches as numpy.ndarray / dict and
    crashes it with "unhashable type" — r3 shipped q55/q72/q79 red this
    way, r6 shipped q114.  This local canon() stringifies list cells
    itself, so it could NOT see the failure; ban the type at the schema
    level in BOTH engines' outputs instead (project through
    to_json/array_to_json in both texts)."""
    import re as _re

    from pyspark.sql import types as T

    for f in spark_schema.fields:
        assert not isinstance(f.dataType, (T.ArrayType, T.MapType)), (
            f"{name}: top-level {f.dataType.simpleString()} column "
            f"'{f.name}' in the Spark output — the driver's pandas-sort "
            f"canonicalizer crashes on ndarray/dict cells; wrap it in "
            f"to_json(...) in BOTH engine and oracle texts"
        )
    for c, t in duckdb_cols_types:
        tu = t.upper()
        assert not (_re.search(r"\[\d*\]$", tu) or tu.startswith("MAP(")), (
            f"{name}: top-level {t} column '{c}' in the DuckDB oracle "
            f"output — the driver's pandas-sort canonicalizer crashes on "
            f"ndarray/dict cells; wrap it in to_json(...) in BOTH texts"
        )


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(name, spark, ddb):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    rel = ddb.sql(ORACLES[name])
    ocols = list(rel.columns)
    otypes = [str(t) for t in rel.types]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert_driver_sortable(name, sdf.schema, list(zip(ocols, otypes)))
    # driver-hash emulation: per-column pandas render kinds must agree,
    # or the driver's value-hash goes red on type RENDERING alone.
    skinds = {f.name: _spark_render_kind(f.dataType) for f in sdf.schema.fields}
    okinds = {c: _duckdb_render_kind(t) for c, t in zip(ocols, otypes)}
    for c in sorted(skinds):
        assert skinds[c] == okinds[c], (
            f"{name}: column '{c}' renders as {skinds[c]} on Spark but "
            f"{okinds[c]} via DuckDB fetchdf — the driver hash will be "
            f"red even if values match; cast BOTH texts to a common type"
        )
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} (spark) vs {len(orows)} (duckdb)"
    )
    sc = canon(srows, scols, [skinds[c] for c in scols])
    oc = canon(orows, ocols, [okinds[c] for c in ocols])
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_index_slice_grid_matches_duckdb(spark, ddb):
    """Exhaustive literal index/slice grid over strings and lists —
    negative bounds count from the end (len + b + 1), 0 clamps/NULLs,
    past-end clamps, hi < lo is empty — every cell must equal DuckDB
    (one wide row per engine, so the 147 cases cost two queries).
    Runtime (non-literal) bounds ride the CASE-normalized templates."""
    import __spark_entry__ as em  # noqa: F401  (engine import side effects)

    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    exprs = []
    for base in ["'hello'", "([10,20,30])"]:
        for idx in [-4, -3, -1, 0, 1, 2, 5, 6]:
            exprs.append(f"{base}[{idx}]")
        for lo in [None, -4, -2, 0, 1, 2, 4, 7]:
            for hi in [None, -5, -2, -1, 0, 2, 3, 9]:
                l = "" if lo is None else str(lo)
                h = "" if hi is None else str(hi)
                exprs.append(f"{base}[{l}:{h}]")
    exprs += [
        "'hello'[(1+1):(0-3)]",
        "([10,20,30])[(0-1)]",
        "([10,20,30])[(1+0):(0-1)]",
    ]
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if srow[i] != drow[i]
    ]
    assert not diffs, diffs[:5]


def test_function_edge_grid_matches_duckdb(spark, ddb):
    """Cross-engine grid of function edge cases fixed in round 4:
    negative-count left/right, integer sign(), age() intervals,
    NULL-skipping stringifying concat(), empty-list list_sum/avg,
    composite types in cast position. Every cell must equal DuckDB."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    exprs = [
        "left('hello', -2)", "right('hello', -2)", "left('hello', 2)",
        "right('hello', 2)", "right('hello', 9)", "right('hello', 0)",
        "left('hello', 0)", "sign(-3)", "sign(0)",
        "age(TIMESTAMP '2024-03-05 00:00:00', TIMESTAMP '2024-01-01 00:00:00')",
        "concat('a', NULL, 'b')", "concat('x', 1, 'y')",
        "concat([1,2], [3])",  # DuckDB concat stringifies lists
        "list_concat([1,2], [3])", "[1] || [2,3]", "'a' || NULL",
        "list_sum(CAST([] AS INTEGER[]))", "list_avg([1.0,2.0,3.0])",
        "CAST([1,2] AS BIGINT[])", "CAST(NULL AS VARCHAR[])",
        "lpad('ab', 5, 'xy')", "split_part('a,b,c', ',', 5)",
        "round(2.5)", "round(-2.5)", "mod(-7, 3)", "(0-7) // 2",
        "greatest(1, NULL, 3)", "least(1, NULL, 3)",
        # JSON battery (python-UDF-backed, exact DuckDB rendering)
        """json_extract('{"a":1,"b":{"c":[10,20]},"s":"t"}', '$.b.c[1]')""",
        """json_extract('{"a":1,"s":"t"}', '$.s')""",  # quoted string leaf
        """json_extract_string('{"s":"t"}', '$.s')""",
        """json_valid('{"a":1}')""", "json_valid('nope')",
        """json_keys('{"a":1,"b":2}')""",
        """json_structure('{"a":1,"b":{"c":[10,20]},"s":"t"}')""",
        "week(DATE '2024-01-01')",
        # round-4b JSON constructors/predicates
        "json_array(1, 'a', NULL)", "json_array()",
        "json_object('k', 1, 'l', 'x')",
        """json_merge_patch('{"a":1,"c":3}', '{"a":null,"b":2}')""",
        """json_contains('{"a":1}', '1')""",
        "json_type('[1]')", "json_type('\"x\"')", "json_type('{}')",
    ]
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if str(srow[i]) != str(drow[i])
    ]
    assert not diffs, diffs[:6]


def test_function_edge_grid_round4b_matches_duckdb(spark, ddb):
    """Second sweep wave: chained interval arithmetic, format_bytes
    truncation, grapheme approximations, escape-char LIKE, fmt-spec
    format()/printf numeric casts, list_resize/select/where, 3-arg
    list_sort, stepped slices, strftime week numbers, julian(), the
    calendar-aware age(). Every cell must equal DuckDB."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    exprs = [
        "DATE '2024-01-31' + INTERVAL 1 MONTH + INTERVAL 1 DAY",
        "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 2 HOUR + INTERVAL 30 MINUTE",
        "format_bytes(500)", "format_bytes(1024)", "format_bytes(1536)",
        "format_bytes(1048575)", "format_bytes(1500000)",
        "format_bytes(1073741824)", "format_bytes(-2048)",
        "left_grapheme('héllo', 2)", "length_grapheme('héllo')",
        "regexp_full_match('abc', '[a-c]+')",
        "regexp_full_match('abcd', '[a-c]+')",
        "like_escape('a%c', 'a$%c', '$')",
        "ilike_escape('A%C', 'a$%c', '$')",
        "format('{:.2f}', 3.14159)", "format('{} = {:d}', 'x', 42)",
        "printf('%.2f', 3.14159)", "printf('%d-%s', 7, 'x')",
        "list_unique([1,2,2,3,NULL])",
        "list_resize([1,2], 4)", "list_resize([1,2], 4, 9)",
        "list_resize([1,2,3], 2)",
        "list_select([10,20,30], [3,1])",
        "list_where([10,20,30], [true,false,true])",
        "list_sort([3,1,NULL], 'DESC', 'NULLS FIRST')",
        "list_sort([3,1,NULL], 'ASC', 'NULLS FIRST')",
        "list_sort([3,1,NULL], 'DESC', 'NULLS LAST')",
        "array_slice([1,2,3,4,5], 2, 4, 2)",
        "array_slice([1,2,3,4,5], 1, 5, 2)",
        "strftime(DATE '2024-02-29', '%Y|%U|%W|%w')",
        "strftime(DATE '2024-01-01', 'wk %U')",
        "julian(DATE '2024-01-01')",
        "julian(TIMESTAMP '2024-01-01 06:00:00')",
        "age(TIMESTAMP '2024-03-15 00:00:00', TIMESTAMP '2023-01-10 00:00:00')",
        "age(TIMESTAMP '2024-03-15 06:30:00', TIMESTAMP '2023-01-10 01:00:00')",
        "datetrunc('quarter', TIMESTAMP '2024-05-05 01:00:00')",
        "length(CAST(gen_random_uuid() AS VARCHAR))",
    ]
    jvm_aggs = [
        "group_concat(s)", "string_agg(s)",
        "string_agg(s, '|' ORDER BY s DESC)",
        "bitstring_agg(i)",
        "last(s ORDER BY x)", "last(s ORDER BY x DESC)",
        "first(s ORDER BY x)", "first(s ORDER BY x DESC)",
        "median(x)",
    ]
    # pandas-UDAF-backed aggregates can't share a SELECT with JVM ones
    pandas_aggs = [["product(x)"], ["entropy(s)"], ["mad(x)"]]
    setup = [
        "CREATE TABLE ag(x DOUBLE, s VARCHAR, i BIGINT)",
        "INSERT INTO ag VALUES (1.0,'p',5),(2.0,'q',3),(NULL,NULL,12),"
        "(4.0,'r',6),(8.0,'s',10)",
    ]
    for stmt in setup:
        eng.execute(stmt)
        ddb.execute(stmt)
    agg_diffs = []
    for batch in [jvm_aggs] + pandas_aggs:
        agg_sql = "SELECT " + ", ".join(
            f"{e} AS a{i}" for i, e in enumerate(batch)
        ) + " FROM ag"
        sa = [tuple(r) for r in eng.execute(agg_sql).collect()][0]
        da = ddb.execute(agg_sql).fetchall()[0]
        agg_diffs += [
            (batch[i], sa[i], da[i])
            for i in range(len(batch))
            if str(sa[i]) != str(da[i])
        ]
    assert not agg_diffs, agg_diffs[:6]
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if str(srow[i]) != str(drow[i])
    ]
    assert not diffs, diffs[:8]


def test_window_exclude_group_ties(spark, ddb):
    """Window frame EXCLUDE GROUP / EXCLUDE TIES (DuckDB surface; Spark
    has no frame exclusion): frame aggregate minus the current row's
    peer group (peers = a second window with RANGE CURRENT ROW..CURRENT
    ROW over the same partition/order, sharing one shuffle), plus the
    current row back for TIES. RANGE frames only — a ROWS frame can cut
    through the peer group, so those raise loudly."""
    import pytest as _pytest

    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    setup = [
        "CREATE TABLE exw(p VARCHAR, o INTEGER, x INTEGER)",
        "INSERT INTO exw VALUES ('a',1,10),('a',1,20),('a',2,30),"
        "('a',3,NULL),('a',3,40),('b',1,5),('b',2,NULL),('b',2,7),"
        "('b',2,9)",
    ]
    for stmt in setup:
        eng.execute(stmt)
        ddb.execute(stmt)
    frames = [
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
        "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    ]
    for fr in frames:
        for mode in ["GROUP", "TIES"]:
            for agg in [
                "sum(x)", "count(x)", "count(*)",
            ]:
                e = (
                    f"{agg} OVER (PARTITION BY p ORDER BY o {fr}"
                    f" EXCLUDE {mode})"
                )
                q = (
                    f"SELECT p, o, x, {e} AS v FROM exw"
                    f" ORDER BY p, o, coalesce(x, -1)"
                )
                s = [tuple(r) for r in eng.execute(q).collect()]
                d = ddb.execute(q).fetchall()
                assert sorted(map(str, s)) == sorted(map(str, d)), e
    # ROWS-frame EXCLUDE GROUP is implemented since round 12 (the
    # collected-frame fold) — value-pinned instead of raising
    q = (
        "SELECT p, o, sum(x) OVER (PARTITION BY p ORDER BY o ROWS"
        " BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS v"
        " FROM exw ORDER BY p, o, coalesce(x, -1)"
    )
    s = [tuple(r) for r in eng.execute(q).collect()]
    d = ddb.execute(q).fetchall()
    assert sorted(map(str, s)) == sorted(map(str, d))


def test_function_catalog_sweep_round5(spark, ddb):
    """Round-5 duckdb_functions() gap batch: scalar micro/millisecond
    accessors, single-arg add/subtract/greatest/least, scalar era(),
    bit_position over BIT bitstrings, formatReadable[Decimal]Size,
    list_element/list_cat/array_concat/str_split_regex aliases,
    to_quarters, try_strptime, make_timestamptz (UTC session; the engine
    carries timestamps naive-UTC so only the VALUE is compared),
    integer json paths, json_array_length non-array -> 0, and
    current_query() self-reference. Every cell must equal DuckDB."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    exprs = [
        "microsecond(TIMESTAMP '2024-02-15 10:30:45.123456')",
        "millisecond(TIMESTAMP '2024-02-15 10:30:45.123456')",
        "add(3)", "subtract(5)", "greatest('abc')", "least(7)",
        "era(TIMESTAMP '2024-02-15 10:30:45')",
        "bit_position('01'::BIT, '1101'::BIT)",
        "bit_position('11'::BIT, '0001'::BIT)",
        "formatReadableSize(123456789)",
        "formatReadableDecimalSize(123456789)",
        "formatReadableDecimalSize(999)",
        "formatReadableDecimalSize(1500)",
        "list_element([1,2,3], 2)",
        "list_cat([1,2],[3])",
        "array_concat([1],[2,3])",
        "str_split_regex('a1b2c', '[0-9]')",
        "to_quarters(3)",
        "epoch(make_timestamptz(2024,2,15,10,30,45.5))",
        "json_extract('{\"a\":1}', 3)",
        "json_extract('[5,6,7]', 1)",
        "json_array_length('{\"a\":1}')",
        "json_array_length('[1,2]')",
        "json_array_length(NULL)",
        "try_strptime('nope', '%Y-%m-%d')",
        "try_strptime('2024-02-15', '%Y-%m-%d')",
        "strptime('02-15', '%m-%d')",  # year-less: 1900 base date
        "try_strptime('07-04 10:30', '%m-%d %H:%M')",
        "format('abc')",
        "array_select([9,8,7], [1,3])",
        # cast rounding tiers (fuzz-found): boolean operands never round;
        # DECIMAL literals round half-AWAY (2.5 -> 3); DOUBLE keeps
        # banker's HALF-EVEN (904.5 -> 904)
        "CAST(3 > 2 AS INTEGER)",
        "(1 < 2)::INTEGER",
        "CAST(2.5 AS INTEGER)",
        "(904.5)::INTEGER",
        "CAST(-2.5 AS INTEGER)",
        "(-1.5)::INTEGER",
        "CAST(CAST(904.5 AS DOUBLE) AS INTEGER)",
        "list_transform([1.0, -2.0], x -> CAST(x > 0 AS INTEGER))",
    ]
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if str(srow[i]) != str(drow[i])
    ]
    assert not diffs, diffs[:6]
    q = "SELECT current_query() AS q"
    assert [tuple(r) for r in eng.execute(q).collect()] == ddb.execute(
        q
    ).fetchall()
    # aggregate batch (from the duckdb_functions() aggregate scan):
    # count_star, DOUBLE-typed Kahan family, regr_avgx/avgy DOUBLE,
    # mad over DECIMAL (separate statement: Spark cannot mix a pandas
    # UDAF with built-in aggregates in one projection)
    setup = (
        "CREATE TABLE aggsweep AS SELECT * FROM (VALUES (1, 2.5),"
        " (2, 1.5), (3, 4.0), (4, NULL)) v(i, d)"
    )
    eng.execute(setup)
    ddb.execute(setup)
    q = (
        "SELECT count_star() AS a, fsum(d) AS c, kahan_sum(d) AS k,"
        " sumkahan(d) AS e, favg(d) AS f, regr_avgx(d, i) AS g,"
        " regr_avgy(d, i) AS h FROM aggsweep"
    )
    assert str([tuple(r) for r in eng.execute(q).collect()]) == str(
        ddb.execute(q).fetchall()
    )
    q = "SELECT mad(d) AS b, mad(i) AS m2 FROM aggsweep"
    srow = [tuple(r) for r in eng.execute(q).collect()][0]
    drow = ddb.execute(q).fetchall()[0]
    assert [str(v) for v in srow] == [str(v) for v in drow]


def test_list_macro_family_matches_duckdb(spark, ddb):
    """DuckDB's list_<agg> macro family as Spark array folds: any_value/
    approx_count_distinct/count/first/last, bit_and/or/xor (xor spelled
    arithmetically — a raw ^ is exponentiation in the dialect),
    bool_and/or (null-skipping, NULL on empty), product (DOUBLE),
    median (even-count average), histogram (sorted map), mode (ties ->
    first occurrence), mad, and the moment family — sem is POPULATION
    stddev/sqrt(n), skewness the adjusted Fisher-Pearson G1, kurtosis
    the sample-adjusted excess G2, entropy log2 over value frequencies
    (all verified against DuckDB numerically; moments rounded to 9
    digits to absorb fold-order ulps). Plus array_pop/push/has/reverse
    aliases, json_group_array/object, count_star, current_user/role/
    database rendering."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    exprs = [
        "list_mode([1,1,2])", "list_mode([2,1])",
        "round(list_sem([1.0,2.0,4.0,8.0]), 9)",
        "round(list_skewness([1.0,2.0,4.0,8.0]), 9)",
        "round(list_kurtosis([1.0,2.0,4.0,8.0]), 9)",
        "round(list_kurtosis_pop([1.0,2.0,4.0,8.0]), 9)",
        "round(list_entropy([1,1,2]), 9)",
        "CAST(list_mad([1.0,2.0,4.0]) AS DOUBLE)",
        "list_median([1,2,4])", "list_median([1,2,3,4])",
        "list_product([2,3,4])",
        "list_bool_and([true,NULL])", "list_bool_or([false,NULL])",
        "list_bit_and([6,3])", "list_bit_or([1,2])", "list_bit_xor([5,3])",
        "list_any_value([NULL,3,5])", "list_count([1,NULL,3])",
        "list_first([7,8])", "list_last([7,8])",
        "list_approx_count_distinct([1,2,2,3])",
        "array_pop_back([1,2,3])", "array_pop_front([1,2,3])",
        "array_push_back([1,2], 3)", "array_push_front([2,3], 1)",
        "array_has_all([1,2,3],[2])", "array_has_any([1,2],[2,5])",
        "array_reverse([1,2,3])",
        "current_user()", "current_role()", "session_user()",
        "current_database()", "current_catalog()",
        "count_star()",
    ]
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if str(srow[i]) != str(drow[i])
    ]
    assert not diffs, diffs[:6]
    q2 = (
        "SELECT json_group_array(i) AS a, json_group_object(s, i) AS b"
        " FROM (VALUES (1,'x'),(2,'y')) t(i,s)"
    )
    assert [tuple(r) for r in eng.execute(q2).collect()] == ddb.execute(
        q2
    ).fetchall()
    # generator + static regexp group-overflow parity
    q3 = "SELECT generate_subscripts([9,8,7], 1) AS g"
    assert [tuple(r) for r in eng.execute(q3).collect()] == ddb.execute(
        q3
    ).fetchall()
    q4 = (
        "SELECT regexp_extract('abc', 'a(b)c', 3) AS a,"
        " regexp_extract('xy9', '([a-z])([a-z])', 2) AS b"
    )
    assert [tuple(r) for r in eng.execute(q4).collect()] == ddb.execute(
        q4
    ).fetchall()


def test_function_catalog_sweep_round4f(spark, ddb):
    """duckdb_functions() catalog diff wave: arg_min/arg_max NULL-value
    skipping (and the *_null keep-NULLs variants), sem, grade_up
    (1-based argsort), list_reduce/reduce no-initial fold,
    list_reverse_sort, constant_or_null, unbin/from_binary,
    row_to_json over named structs, array_cross_product (DOUBLE result),
    unpivot_list, bin over string literals, json_quote, regexp_escape
    (RE2 QuoteMeta). Every cell must equal DuckDB."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    setup = [
        "CREATE TABLE fsweep(x DOUBLE, y DOUBLE)",
        "INSERT INTO fsweep VALUES (1.0, 2.0), (2.0, 3.5), (3.0, 6.5),"
        " (NULL, 1.0)",
    ]
    for stmt in setup:
        eng.execute(stmt)
        ddb.execute(stmt)
    aggs = [
        "argmin(x, y)", "argmax(x, y)", "arg_min(x, y)", "arg_max(x, y)",
        "arg_min_null(x, y)", "arg_max_null(x, y)",
        "round(sem(x), 6)",
    ]
    qa = "SELECT " + ", ".join(
        f"{e} AS a{i}" for i, e in enumerate(aggs)
    ) + " FROM fsweep"
    sa = [tuple(r) for r in eng.execute(qa).collect()][0]
    da = ddb.execute(qa).fetchall()[0]
    adiffs = [
        (aggs[i], sa[i], da[i])
        for i in range(len(aggs))
        if str(sa[i]) != str(da[i])
    ]
    assert not adiffs, adiffs
    exprs = [
        "grade_up([30, 10, 20])", "list_grade_up([3, 1, 2])",
        "list_reduce([1, 2, 3], (a, b) -> a + b)",
        "reduce([1, 2, 3], (a, b) -> a + b)",
        "list_reverse_sort([2, 3, 1])", "array_reverse_sort([2, 3, 1])",
        "constant_or_null(42, NULL)", "constant_or_null(42, 7)",
        "unbin('0110')", "from_binary('01100001')",
        "row_to_json(struct_pack(a := 1, b := 'x'))",
        "unpivot_list('a', 'b', 'c')",
        "bin('14')", "bin(7)",
        "json_quote('a\"b')",
        "regexp_escape('a.b*c')",
        # BIT carried as '0'/'1' text (cast passthrough + macros)
        "get_bit('0110'::BIT, 1)", "set_bit('0110'::BIT, 1, 0)",
        "bit_count('0110'::BIT)", "bitstring('0101011', 12)",
        "CAST('0110'::BIT AS VARCHAR)", "length('0110'::BIT)",
        "'011'::BIT || '001'::BIT", "bit_length('0110'::BIT)",
    ]
    sql = "SELECT " + ", ".join(
        f"{e} AS c{i}" for i, e in enumerate(exprs)
    )
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if str(srow[i]) != str(drow[i])
    ]
    assert not diffs, diffs[:6]
    # cross product: DuckDB fetches fixed arrays as tuples — compare values
    sx = eng.execute(
        "SELECT array_cross_product([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]) AS v"
    ).collect()[0][0]
    dx = ddb.execute(
        "SELECT array_cross_product([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]) AS v"
    ).fetchone()[0]
    assert [float(v) for v in sx] == [float(v) for v in dx]


def test_correlated_subquery_shapes_match_duckdb(spark, ddb):
    """Correlated subqueries with NON-equality correlation predicates —
    previously documented as a Spark decorrelation limitation; Spark 4's
    optimizer handles every shape below (scalar agg with <=/<>/> mixed
    correlation, EXISTS with <, scalar with ORDER BY+LIMIT 1). Pinned
    cross-engine so a regression in either engine or the rewrite layer
    is loud."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    eng.register_parquet_dir(SF_DIR)
    qs = [
        "SELECT n_name, (SELECT count(*) FROM region r"
        " WHERE r.r_regionkey <= n.n_regionkey) AS cnt"
        " FROM nation n ORDER BY n_name",
        "SELECT c_custkey, (SELECT max(o_totalprice) FROM orders o"
        " WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > c.c_acctbal)"
        " AS m FROM customer c ORDER BY c_custkey LIMIT 20",
        "SELECT n_name FROM nation n WHERE EXISTS (SELECT 1 FROM region r"
        " WHERE r.r_regionkey < n.n_regionkey) ORDER BY n_name LIMIT 5",
        "SELECT n_name, (SELECT r_name FROM region r"
        " WHERE r.r_regionkey <= n.n_regionkey ORDER BY r_name LIMIT 1)"
        " AS rn FROM nation n ORDER BY n_name LIMIT 5",
    ]
    for q in qs:
        srows = [tuple(r) for r in eng.execute(q).collect()]
        drows = ddb.execute(q).fetchall()
        assert len(srows) == len(drows), q
        assert sorted(map(str, srows)) == sorted(map(str, drows)), q


def test_cast_varchar_rendering_matches_duckdb(spark, ddb):
    """CAST(composite/interval AS VARCHAR) renders DuckDB's notation:
    lists '[a, NULL]', structs "{'f': v}" (names quoted, strings raw),
    maps '{k=v}', literal intervals '3 days'/'01:30:00'/'1 year ...'.
    Literal interval chains constant-fold at parse time
    (rewrites._fold_interval_chain); composite operands route through
    the duckdb_varchar UDF (pyfuncs.duck_value_str). Both CAST(..) and
    ::VARCHAR forms. Every cell must equal DuckDB."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    setup = [
        "CREATE TABLE castv(arr INTEGER[], st STRUCT(a INTEGER, b VARCHAR),"
        " mp MAP(VARCHAR, INTEGER))",
        "INSERT INTO castv VALUES ([1,2], {'a': 1, 'b': 'x'},"
        " MAP(['k'],[7]))",
    ]
    for stmt in setup:
        eng.execute(stmt)
        ddb.execute(stmt)
    exprs = [
        "CAST(INTERVAL 3 DAY AS VARCHAR)",
        "CAST(INTERVAL 90 MINUTE AS VARCHAR)",
        "CAST(INTERVAL 2 MONTH AS VARCHAR)",
        "CAST(INTERVAL 1 YEAR + INTERVAL 2 MONTH + INTERVAL 3 DAY"
        " + INTERVAL 90 MINUTE AS VARCHAR)",
        "CAST(INTERVAL 1 DAY - INTERVAL 1 MINUTE AS VARCHAR)",
        "CAST(-INTERVAL 90 MINUTE AS VARCHAR)",
        "CAST(INTERVAL '90' SECOND AS VARCHAR)",
        "CAST(INTERVAL 1500 MILLISECOND AS VARCHAR)",
        "CAST(INTERVAL 0 DAY AS VARCHAR)",
        "CAST(INTERVAL 2 WEEK AS VARCHAR)",
        "CAST(INTERVAL 25 HOUR AS VARCHAR)",
        "CAST({'a': 1, 'b': 'x'} AS VARCHAR)",
        "CAST(MAP(['k1','k2'],[1,2]) AS VARCHAR)",
        "CAST(['a', NULL] AS VARCHAR)",
        "CAST({'p': [1,2], 'q': {'r': 'y'}} AS VARCHAR)",
        "CAST([1.50, 2.0] AS VARCHAR)",
        "CAST([DATE '2024-01-01', NULL] AS VARCHAR)",
        "CAST([TIMESTAMP '2024-01-01 01:02:03.5'] AS VARCHAR)",
        "CAST([true, false] AS VARCHAR)",
        "CAST(struct_pack(a := [1,2]) AS VARCHAR)",
        "CAST([[1],[2,3]] AS VARCHAR)",
        "CAST([1e20, 0.1, 1e15] AS VARCHAR)",
        "[4,5]::VARCHAR",
        "{'z': 9}::VARCHAR",
        "CAST(list_sort([3,1]) AS VARCHAR)",
    ]
    sql = "SELECT " + ", ".join(
        f"{e} AS c{i}" for i, e in enumerate(exprs)
    )
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if str(srow[i]) != str(drow[i])
    ]
    assert not diffs, diffs[:6]
    tsql = (
        "SELECT CAST(arr AS VARCHAR) AS c0, CAST(st AS VARCHAR) AS c1,"
        " CAST(mp AS VARCHAR) AS c2, arr::VARCHAR AS c3, st::TEXT AS c4"
        " FROM castv"
    )
    st = [tuple(r) for r in eng.execute(tsql).collect()][0]
    dt = ddb.execute(tsql).fetchall()[0]
    tdiffs = [
        (i, st[i], dt[i]) for i in range(len(st)) if str(st[i]) != str(dt[i])
    ]
    assert not tdiffs, tdiffs


def test_function_catalog_sweep_round7(spark, ddb):
    """Round-7 full-catalog sweep fixes, pinned against live DuckDB:
    2-arg regexp_extract (DuckDB group-0 default), polymorphic
    list_element/list_extract/array_extract/list_slice over STRINGS,
    filter/list_filter lambda int-truthiness, array_has/list_has,
    BLOB typed literals, 3-arg bar (default width 80)."""
    from duckdb_nsql_spark.session import DuckSparkSession

    eng = DuckSparkSession(spark)
    eng.register_parquet_dir(SF_DIR)
    probes = [
        "SELECT regexp_extract('abc-12', '[a-z]+-(\\d+)') AS v",
        "SELECT regexp_extract('abc', 'b') AS v",
        "SELECT regexp_extract('abc-12', '[a-z]+-(\\d+)', 1) AS v",
        "SELECT list_filter([1,2,3], x -> x + 1) AS v",
        "SELECT list_filter([0,1,2], x -> x) AS v",
        "SELECT filter([1,2,3], x -> x > 1) AS v",
        "SELECT array_filter([1,2,3], y -> y % 2) AS v",
        "SELECT array_has([1,2,3], 2) AS a, list_has([1,2], 5) AS b",
        "SELECT list_element('abcdef', 2) AS a,"
        " array_extract('abcdef', -1) AS b",
        "SELECT list_element('abc', 0) AS a, list_element('abc', 9) AS b",
        "SELECT list_slice('abcdef', 2, 4) AS a,"
        " list_slice('abcdef', -3, -1) AS b",
        "SELECT list_extract([10,20,30], 2) AS a,"
        " list_extract([10,20], 0) AS b, list_extract([10,20], 5) AS c",
        "SELECT list_slice([1,2,3,4], 2, 3) AS v",
        "SELECT octet_length(BLOB 'ab') AS v",
        "SELECT BLOB '\\x41\\x42' AS v",
        "SELECT bar(5, 0, 10) AS v",
        "SELECT bar(1, 2, 3) AS v",
        "SELECT flatten([[1,2],[3]]) AS v",
        "SELECT json_array_length('[1,2,3]') AS v",
        # aggregate-catalog sweep: count_star spellings; array_agg/list
        # KEEP NULL elements (Spark collect_list drops them — collected
        # as structs and re-extracted)
        "SELECT count_star(*) AS a, count_star() AS b FROM nation",
        "SELECT to_json(array_agg(x)) AS v FROM"
        " (SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL"
        "  ELSE n_nationkey END AS x FROM nation ORDER BY n_nationkey) t",
        "SELECT to_json(list(x)) AS v FROM"
        " (SELECT CASE WHEN n_nationkey % 2 = 0 THEN NULL"
        "  ELSE n_name END AS x FROM nation ORDER BY n_nationkey) t",
        # temporal range/generate_series (TIMESTAMP rows even for DATE
        # bounds; range end-exclusive drops the exact landed end value;
        # negative steps descend) + the repeat table function
        "SELECT * FROM range(DATE '2024-01-01', DATE '2024-01-10',"
        " INTERVAL 2 DAY)",
        "SELECT * FROM generate_series(DATE '2024-01-01',"
        " DATE '2024-01-07', INTERVAL 2 DAY)",
        "SELECT * FROM range(TIMESTAMP '2024-01-01',"
        " TIMESTAMP '2024-01-04', INTERVAL 1 DAY)",
        "SELECT * FROM range(DATE '2024-01-10', DATE '2024-01-01',"
        " INTERVAL '-3' DAY)",
        "SELECT * FROM range(DATE '2024-01-01', DATE '2024-01-01',"
        " INTERVAL 1 DAY)",
        "SELECT * FROM repeat('ab', 3)",
    ]
    for p in probes:
        srows = [tuple(r) for r in eng.execute(p).collect()]
        drows = ddb.execute(p).fetchall()
        assert sorted(map(str, srows)) == sorted(map(str, drows)), (
            p, srows[:2], drows[:2]
        )
    # error('msg') raises like DuckDB
    with pytest.raises(Exception, match="boom"):
        eng.execute("SELECT error('boom') AS v").collect()


def test_advice_r7_pins(spark, ddb):
    """Round-7 ADVICE regressions, pinned against live DuckDB:
    (1) temporal series step direction decided at RUNTIME — a positive
    composite step whose text contains '-' must still emit the series,
    and a runtime-negative step with no '-' in its text must descend;
    (2) nested string-subscript calls inside the index argument of an
    outer string-subscript call are rewritten too (the splice is
    rescanned)."""
    from duckdb_nsql_spark.session import DuckSparkSession

    eng = DuckSparkSession(spark)
    probes = [
        # composite positive step containing '-'
        "SELECT * FROM generate_series(DATE '2024-01-01',"
        " DATE '2024-01-05', INTERVAL '2' DAY - INTERVAL '1' DAY)",
        "SELECT * FROM range(DATE '2024-01-01', DATE '2024-01-10',"
        " INTERVAL '3' DAY - INTERVAL '1' DAY)",
        "SELECT generate_series(DATE '2024-01-01', DATE '2024-01-07',"
        " INTERVAL '3' DAY - INTERVAL '1' DAY)::VARCHAR AS v",
        # runtime-negative step, no '-' anywhere in the rendered text
        "SELECT * FROM generate_series(TIMESTAMP '2024-01-05',"
        " TIMESTAMP '2024-01-01',"
        " INTERVAL (CAST(sign(ln(0.5)) AS INT)) DAY)",
        # nested string-subscript calls in the index argument
        "SELECT list_element('abc', list_element('21', 1)::INT) AS v",
        "SELECT list_element('abcdef', list_slice('321', 2, 2)::INT) AS v",
    ]
    for p in probes:
        srows = sorted(str(tuple(r)) for r in eng.execute(p).collect())
        drows = sorted(str(t) for t in ddb.execute(p).fetchall())
        assert srows == drows, (p, srows[:3], drows[:3])
    # facing-away temporal bounds: DuckDB raises; the engine keeps the
    # int path's lenient empty set (documented divergence)
    assert eng.execute(
        "SELECT * FROM generate_series(TIMESTAMP '2024-01-05',"
        " TIMESTAMP '2024-01-01', INTERVAL 1 DAY)"
    ).collect() == []
    # nextval(NULL)/currval(NULL) are NULL, no sequence required
    row = eng.execute("SELECT nextval(NULL) AS a, currval(NULL) AS b"
                      ).collect()[0]
    assert row["a"] is None and row["b"] is None


def test_dynamic_ym_interval_varchar_matches_duckdb(spark, ddb):
    """Dynamic YEAR-MONTH intervals cast straight to VARCHAR render
    DuckDB's text ('1 year 2 months', '-1 year -2 months', '00:00:00'
    for zero) through pure built-ins (pass_ym_interval_varchar) — the
    last known dialect-rendering gap. Every ym unit and both cast
    spellings, against live DuckDB."""
    from duckdb_nsql_spark.session import DuckSparkSession

    eng = DuckSparkSession(spark)
    eng.execute(
        "CREATE TABLE ymt (x INTEGER); INSERT INTO ymt VALUES"
        " (14),(12),(1),(0),(-14),(24),(13),(-1),(5)"
    )
    ddb.execute("DROP TABLE IF EXISTS ymt")
    ddb.execute(
        "CREATE TABLE ymt (x INTEGER); INSERT INTO ymt VALUES"
        " (14),(12),(1),(0),(-14),(24),(13),(-1),(5)"
    )
    for sql in [
        "SELECT x, CAST(INTERVAL (x) MONTH AS VARCHAR) AS r"
        " FROM ymt ORDER BY x",
        "SELECT x, INTERVAL (x) YEAR :: VARCHAR AS r FROM ymt ORDER BY x",
        "SELECT x, CAST(INTERVAL (x) QUARTER AS VARCHAR) AS r"
        " FROM ymt ORDER BY x",
        "SELECT x, TRY_CAST(INTERVAL (x + 1) DECADE AS TEXT) AS r"
        " FROM ymt ORDER BY x",
        "SELECT CAST(INTERVAL (3) CENTURY AS VARCHAR) AS r",
        # the non-cast dynamic ym path (date arithmetic) is unaffected
        "SELECT x, CAST(DATE '2020-01-15' + INTERVAL (x) MONTH AS DATE)"
        " AS d FROM ymt ORDER BY x",
    ]:
        srows = [tuple(r) for r in eng.execute(sql).collect()]
        drows = ddb.execute(sql).fetchall()
        assert srows == drows, (sql, srows[:3], drows[:3])
    eng.execute("DROP TABLE ymt")
    ddb.execute("DROP TABLE ymt")


def test_dynamic_interval_varchar_matches_duckdb(spark, ddb, sf_dir):
    """CAST of a DYNAMIC day-time interval to VARCHAR (non-literal
    operands — a column subtraction or INTERVAL (expr) UNIT) renders
    DuckDB's notation: days split from the time part with truncation
    toward zero ('15 days 11:22:15.4', '-1 day -02:00:00', '-12:00:00').
    The resolver types timestamp columns (_span_is_interval) and routes
    the cast through the duckdb_varchar UDF; timedelta rendering splits
    days like DuckDB's internal (days, micros) pair."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    eng.register_parquet_dir(sf_dir)
    ddb.execute(
        f"CREATE OR REPLACE VIEW ivx_events AS FROM '{sf_dir}/events.parquet'"
    )
    queries = [
        # dynamic ts-ts: sub-day, multi-day, negative sub-day, negative
        # multi-day, zero
        "SELECT event_id, CAST(ts - TIMESTAMP '2024-01-01 00:00:00'"
        " AS VARCHAR) AS d FROM {t} ORDER BY event_id LIMIT 6",
        "SELECT event_id, (ts - TIMESTAMP '2024-01-15 12:34:56.789')"
        "::VARCHAR AS d FROM {t} ORDER BY event_id DESC LIMIT 6",
        "SELECT event_id, CAST(TIMESTAMP '2024-01-02 12:00:00' - ts"
        " AS VARCHAR) AS d FROM {t} ORDER BY event_id LIMIT 6",
        "SELECT CAST(ts - ts AS VARCHAR) AS d FROM {t} LIMIT 2",
        "SELECT CAST(INTERVAL (event_id % 200) MINUTE AS VARCHAR) AS d"
        " FROM {t} ORDER BY event_id LIMIT 6",
    ]
    for q in queries:
        srows = [tuple(r) for r in eng.execute(q.format(t="events")).collect()]
        drows = ddb.execute(q.format(t="ivx_events")).fetchall()
        assert [tuple(map(str, r)) for r in srows] == [
            tuple(map(str, r)) for r in drows
        ], q


def test_decimal_column_division_matches_duckdb(spark, ddb):
    """DuckDB `/` (and `//` with any fractional operand) ALWAYS yields
    DOUBLE — including DECIMAL *columns*, where Spark would keep a widened
    DECIMAL. The rewrite layer resolves column types through the catalog
    (session._CatalogResolver.column_numeric == 'decimal') and casts the
    decimal-bearing primary span to DOUBLE, same as decimal literals."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    setup = [
        "CREATE TABLE decdiv(d DECIMAL(10,2), i BIGINT)",
        "INSERT INTO decdiv VALUES (7.50, 2), (10.00, 4), (0.25, 3)",
    ]
    for stmt in setup:
        eng.execute(stmt)
        ddb.execute(stmt)
    exprs = [
        "d / 2", "2 / d", "d / i", "d // 2", "d // i", "d / d",
        "-d / 3", "(d + 1) / 2", "round(d / 3, 3)",
    ]
    aggs = ["sum(d) / 2", "sum(d) / count(*)", "avg(d) / 2"]
    q = "SELECT " + ", ".join(
        f"{e} AS c{i}" for i, e in enumerate(exprs)
    ) + " FROM decdiv ORDER BY d"
    srows = [tuple(r) for r in eng.execute(q).collect()]
    drows = ddb.execute(q).fetchall()
    diffs = [
        (exprs[i], s[i], d[i])
        for s, d in zip(srows, drows)
        for i in range(len(exprs))
        if str(s[i]) != str(d[i])
    ]
    assert not diffs, diffs[:5]
    sdf = eng.execute(q)
    assert all(t == "double" for _, t in sdf.dtypes), sdf.dtypes
    qa = "SELECT " + ", ".join(
        f"{e} AS c{i}" for i, e in enumerate(aggs)
    ) + " FROM decdiv"
    sa = [tuple(r) for r in eng.execute(qa).collect()][0]
    da = ddb.execute(qa).fetchall()[0]
    adiffs = [
        (aggs[i], sa[i], da[i])
        for i in range(len(aggs))
        if str(sa[i]) != str(da[i])
    ]
    assert not adiffs, adiffs


def test_function_edge_grid_round4c_matches_duckdb(spark, ddb):
    """Fourth sweep wave: operator-function aliases (add/divide/...),
    even/round/fdiv/fmod DOUBLE result types, HUGEINT/UBIGINT casts as
    exact DECIMALs, 1-based two-parameter list lambdas, literal-NULL
    list_contains, md5_number_lower/upper (byte-reversed UBIGINT halves),
    negative-length substring, the parse_path family, 1-arg
    make_timestamp, 3-arg time_bucket offsets, to_binary bitstrings,
    to_<unit> interval constructors, epoch_ns/us, era, and DuckDB's
    avg()-is-always-DOUBLE typing. Every cell must equal DuckDB."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    exprs = [
        "even(-2.5)", "even(3)", "round(12345, -2)", "round(7)",
        "fdiv(7.0, 2.0)", "fdiv(-7, 2)", "fmod(7, 3)", "fmod(-7.5, 2.0)",
        "100000000000000000000::HUGEINT + 1", "1::UBIGINT + 5",
        "divide(7, 2)", "divide(-7, 2)", "multiply(3, 4)",
        "subtract(5, 9)", "add(2, 3)",
        "list_transform([10,20], (x, i) -> x + i)",
        "list_filter([10,20,30], (x,i) -> i > 1)",
        "list_transform([1,2], x -> x * 2)",
        "list_contains([1,NULL], NULL)", "list_contains([1,2], 2)",
        "md5_number_lower('abc')", "md5_number_upper('abc')",
        "md5_number_lower('')",
        "substring('hello', 2, -1)", "substring('hello', 4, -2)",
        "substring('hello', 1, -1)", "substring('hello', 3, -5)",
        "substring('hello', -2, -2)", "substring('hello', 0, 3)",
        "substring('hello', 2, 3)", "substr('hello', 4, -2)",
        "parse_path('/a/b/c.txt')", "parse_path('a/b')",
        "parse_path('a//b/')",
        "parse_dirname('/a/b/c.txt')", "parse_dirname('rel/x.t')",
        "parse_dirname('x.txt')",
        "parse_dirpath('/a/b/c.txt')", "parse_dirpath('x.txt')",
        "parse_dirpath('/x.txt')",
        "parse_filename('/a/b/c.txt')",
        "parse_filename('/a/b/c.txt', true)",
        "parse_filename('x.tar.gz', true)",
        "make_timestamp(1700000000000000)",
        "make_timestamp(2024, 2, 29, 12, 30, 15.5)",
        "time_bucket(INTERVAL '10 minutes', "
        "TIMESTAMP '2024-01-01 10:33:00', INTERVAL '5 minutes')",
        "time_bucket(INTERVAL '1 month', DATE '2024-05-05', "
        "INTERVAL '1 month')",
        "to_binary('ab')", "to_binary('')",
        "to_days(3)", "to_hours(25)", "to_weeks(2)", "to_minutes(90)",
        "to_seconds(90.5)", "to_milliseconds(1500)",
        "to_microseconds(1500)",
        "epoch_ns(TIMESTAMP '2024-01-01 00:00:01.5')",
        "epoch_us(TIMESTAMP '2024-01-01 00:00:01.5')",
        "extract(era FROM DATE '2024-01-01')",
        "date_part('era', DATE '2024-01-01')",
        # wave-4 probes that already matched, pinned against regression
        "regexp_extract_all('a1b22c333', '\\d+')",
        "regexp_split_to_array('a,b;c', '[,;]')",
        "regexp_matches('abc', 'B', 'i')",
        # MAP cells stringified: the two python clients render maps
        # differently (duckdb: dict of key/value LISTS), values identical
        "array_to_string(list_transform(map_entries(MAP {'a': 1, 'b': 2}),"
        " e -> e.key || '=' || e.value), ',')",
        "array_to_string(map_keys(map_concat(MAP {'a': 1}, MAP {'b': 2})),"
        " ',')",
        "array_to_string(map_values(map_concat(MAP {'a': 1}, "
        "MAP {'b': 2})), ',')",
        "cardinality(MAP {'a': 1, 'b': 2})",
        "list_reduce([1,2,3], (a, b) -> a + b)",
        "list_sort(list_intersect([1,2,3], [2,3,4]))",
        "flatten([[1,2],[3]])",
        "range(5, 1, -2)",
        "translate('abcba', 'ab', 'xy')",
        "instr('hello', 'll')",
        "make_date(2024, 2, 29)",
        "last_day(DATE '2024-02-05')",
        "date_diff('week', DATE '2024-01-01', DATE '2024-01-20')",
    ]
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if str(srow[i]) != str(drow[i])
    ]
    assert not diffs, diffs[:8]
    # avg() returns DOUBLE even over DECIMAL inputs (typing divergence
    # fixed by the AVG input cast)
    asql = (
        "SELECT avg(x) AS a, avg(DISTINCT x) AS b FROM (VALUES "
        "(CAST(1 AS DECIMAL(10,2))), (CAST(2 AS DECIMAL(10,2)))) t(x)"
    )
    assert [tuple(r) for r in eng.execute(asql).collect()] == \
        ddb.execute(asql).fetchall()


def test_function_edge_grid_round4d_matches_duckdb(spark, ddb):
    """Fifth sweep wave: decimal-LITERAL division is DOUBLE (DuckDB `/`
    always is), list_extract/array_extract NULL-for-0/OOB semantics,
    apply/array_transform/array_filter/list_pack/array_indexof renames,
    string_to_array + literal-dot and RUNTIME separators for
    string_split (regex-quoted via \\Q..\\E), and \\xNN blob literals
    that decode to real bytes. Every cell must equal DuckDB."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    exprs = [
        "CAST(1.0/3.0 AS VARCHAR)", "1.0/3.0", "10 / 4", "7 / 2.0",
        "list_extract([1,2,3], -1)", "list_extract([1,2,3], 0)",
        "list_extract([1,2,3], 5)", "array_extract([1,2,3], 2)",
        "apply([1,2], x -> x + 1)", "apply([1,2], (x,i) -> x+i)",
        "array_filter([1,2,3], x -> x > 1)",
        "list_pack(1, 2)", "array_indexof([10,20], 20)",
        "array_indexof([10,20], 99)",
        "string_to_array('a.b', '.')", "string_split('a.b.c', '.')",
        "string_split('a|b', '|')", "string_split('a+b', '+')",
        "str_split('a' || chr(92) || 'b', chr(92))",
        "string_split('a.b', substring('x.y', 2, 1))",
        "'\\x41\\x42'::BLOB::VARCHAR",
        "CAST('\\x41b'::BLOB AS VARCHAR)",
        "octet_length('\\xff\\x00'::BLOB)",
        "CAST(CAST('AB' AS BLOB) AS VARCHAR)",
        # wave-5 probes that already matched, pinned vs regression
        "TRY_CAST('12x' AS INTEGER)", "TRY_CAST('1.9' AS INTEGER)",
        "CAST('  42  ' AS INTEGER)",
        "levenshtein('kitten', 'sitting')",
        "jaro_winkler_similarity('abc','abd')", "hamming('abc','abd')",
        "gcd(12, 18)", "lcm(4, 6)", "bit_length('ab')",
        "[1,2] < [1,3]", "[1,2] < [1,2,0]",
        "len([1,2,3])", "ord('€')",
        # wave 8: map-producing functions as subscript bases (list-wrap
        # key access), duck map(keys, values) form, list cardinality /
        # distance family, zero-arg session functions
        "map_from_entries([('k1', 1), ('k2', 2)])['k1']",
        "map([1,2],[10,20])[2]", "map([1,2],[10,20])[9]",
        "map_concat(MAP {'a': 1}, MAP {'b': 2})['b']",
        "MAP {1: 'x'}[1]",
        "array_unique([1,1,2,NULL])", "list_count([1,NULL,3])",
        "array_length([1,2,3], 1)", "array_length([1,2,3])",
        "list_distance([0.0,0.0],[3.0,4.0])",
        "today() = current_date",
        "now() = transaction_timestamp()",
        "base64('ab'::BLOB)", "from_base64('YWI=')",
    ]
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if str(srow[i]) != str(drow[i])
    ]
    assert not diffs, diffs[:8]


def test_function_edge_grid_round4e_matches_duckdb(spark, ddb):
    """Sixth sweep wave: multi-arg grouping() (grouping_id bitmask),
    FILTER on WINDOW aggregates (folded into a CASE argument),
    correlated FROM-list unnest (implicit lateral -> LATERAL),
    type-preserving discrete quantiles (scalar, list, WITHIN GROUP),
    and ordered any_value. Row-set compare against DuckDB."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    setup = [
        "CREATE TABLE g6 (k VARCHAR, j VARCHAR, x INTEGER)",
        "INSERT INTO g6 VALUES ('a','p',1),('a','q',2),('b','p',3),"
        "('b',NULL,4),(NULL,'q',5)",
    ]
    for s in setup:
        eng.execute(s)
        ddb.execute(s)
    queries = [
        "SELECT k, j, grouping(k, j) AS gg, sum(x) AS s FROM g6 "
        "GROUP BY CUBE(k, j)",
        "SELECT k, grouping(k) AS gk, sum(x) AS s FROM g6 GROUP BY ROLLUP(k)",
        "SELECT count(*) FILTER (WHERE x > 2) OVER () AS c, x FROM g6",
        "SELECT sum(x) FILTER (WHERE x > 1) OVER (ORDER BY x) AS s, x FROM g6",
        "SELECT g6.k, u.* FROM g6, unnest([x, x+1]) AS u(e)",
        "SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY x) AS p FROM g6",
        "SELECT quantile_disc(x, 0.25) AS p FROM g6",
        "SELECT list_sort(quantile(x, [0.25, 0.75])) AS p FROM g6",
        "SELECT any_value(x ORDER BY x DESC) AS av, "
        "any_value(j ORDER BY x) AS aj FROM g6",
        "SELECT first(x ORDER BY x DESC) AS f, last(x ORDER BY x DESC) AS l "
        "FROM g6",
        "SELECT k, sum(x) FILTER (WHERE j IS NOT NULL) AS s FROM g6 "
        "GROUP BY k",
        "SELECT k, j, sum(x) AS s FROM g6 "
        "GROUP BY GROUPING SETS ((k), (j), (k, j), ())",
        "SELECT count(*) AS n FROM g6 GROUP BY ()",
        "SELECT sum(x) AS s FROM g6 GROUP BY () HAVING sum(x) > 1",
        "SELECT columns(* EXCLUDE (x)) FROM g6",
    ]
    for q in queries:
        drows = sorted(map(str, ddb.execute(q).fetchall()))
        srows = sorted(str(tuple(r)) for r in eng.execute(q).collect())
        assert drows == srows, (q, drows[:4], srows[:4])


def test_window_function_grid_matches_duckdb(spark, ddb):
    """Window battery: ranking family, lag/lead defaults, framed
    aggregates (ROWS/RANGE/interval RANGE), EXCLUDE CURRENT ROW
    (rewritten to frame-sum minus current contribution), windowed
    median (sorted frame collect), windowed string_agg. Every row of
    every cell must equal DuckDB."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    setup = [
        "CREATE TABLE w(g VARCHAR, k BIGINT, x DOUBLE, d DATE)",
        "INSERT INTO w VALUES "
        "('a', 1, 10.0, DATE '2024-01-01'),"
        "('a', 2, 20.0, DATE '2024-01-03'),"
        "('a', 3, NULL, DATE '2024-01-07'),"
        "('a', 4, 40.0, DATE '2024-01-08'),"
        "('b', 1, 5.0,  DATE '2024-02-01'),"
        "('b', 2, 15.0, DATE '2024-02-20')",
    ]
    for s in setup:
        eng.execute(s)
        ddb.execute(s)
    wins = [
        "row_number() OVER (PARTITION BY g ORDER BY k)",
        "rank() OVER (ORDER BY x)",
        "dense_rank() OVER (ORDER BY x)",
        "percent_rank() OVER (ORDER BY k)",
        "cume_dist() OVER (ORDER BY k)",
        "ntile(3) OVER (ORDER BY k)",
        "lag(x) OVER (PARTITION BY g ORDER BY k)",
        "lag(x, 2, -1.0) OVER (PARTITION BY g ORDER BY k)",
        "lead(x, 1) OVER (PARTITION BY g ORDER BY k)",
        "first_value(x) OVER (PARTITION BY g ORDER BY k)",
        "last_value(x) OVER (PARTITION BY g ORDER BY k)",
        "nth_value(x, 2) OVER (PARTITION BY g ORDER BY k)",
        "sum(x) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)",
        "sum(x) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)",
        "sum(x) OVER (PARTITION BY g ORDER BY k "
        "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)",
        "sum(x) OVER (PARTITION BY g ORDER BY d "
        "RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW)",
        "avg(x) OVER (PARTITION BY g)",
        "count(*) OVER (PARTITION BY g ORDER BY k)",
        "sum(x) OVER ()",
        "sum(x) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)",
        "count(x) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)",
        "avg(x) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)",
        "median(x) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)",
        "string_agg(g, ',') OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)",
    ]
    diffs = []
    for wexpr in wins:
        q = f"SELECT g, k, {wexpr} AS v FROM w ORDER BY g, k"
        mine = [
            tuple(f"{v:.8g}" if isinstance(v, float) else v for v in r)
            for r in eng.execute(q).collect()
        ]
        theirs = [
            tuple(f"{v:.8g}" if isinstance(v, float) else v for v in r)
            for r in ddb.execute(q).fetchall()
        ]
        if mine != theirs:
            diffs.append((wexpr, theirs[:3], mine[:3]))
    assert not diffs, diffs[:4]


def test_positional_join_list_aggregate_collate_match_duckdb(spark, ddb):
    """POSITIONAL JOIN (row-zip with NULL padding), list_aggregate
    named-aggregate application, and COLLATE NOCASE/NOACCENT mapping to
    Spark 4 collations — all cross-checked against DuckDB."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    setup = [
        "CREATE TABLE pj_t(a INT, b VARCHAR)",
        "INSERT INTO pj_t VALUES (1, 'x'), (2, 'y')",
        "CREATE TABLE pj_u(c INT)",
        "INSERT INTO pj_u VALUES (10), (20), (30)",
    ]
    for s in setup:
        eng.execute(s)
        ddb.execute(s)
    q = "SELECT * FROM pj_t POSITIONAL JOIN pj_u"
    assert [tuple(r) for r in eng.execute(q).collect()] == (
        ddb.execute(q).fetchall()
    )
    q2 = ("SELECT list_aggregate([1.0,2.0,3.0], 'sum') AS s, "
          "list_aggr([1.0,2.0], 'avg') AS a, "
          "list_aggregate(['b','a'], 'string_agg', '|') AS j, "
          "list_aggregate([4,1,NULL], 'count') AS n, "
          "list_aggregate([4,1,NULL], 'max') AS m")
    assert [tuple(r) for r in eng.execute(q2).collect()] == (
        ddb.execute(q2).fetchall()
    )
    q3 = ("SELECT 'A' = 'a' COLLATE NOCASE AS v1, "
          "'B' = 'a' COLLATE NOCASE AS v2")
    assert [tuple(r) for r in eng.execute(q3).collect()] == (
        ddb.execute(q3).fetchall()
    )


def test_nested_type_grid_matches_duckdb(spark, ddb):
    """Struct/map/list surface wave: struct_insert/struct_extract (named
    and positional), row(), struct unnest, COLUMNS(lambda) projection,
    encode/decode, zero-arg session functions. Cross-checked where the
    container's DuckDB supports the construct."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    exprs = [
        "struct_extract({'a': 1, 'b': 2}, 'b')",
        "struct_extract(row(7, 'y'), 1)",
        "({'a': {'b': {'c': 42}}}).a.b.c",
        "MAP {'k': 1}['k']",
        "element_at(MAP {'a': 1}, 'zzz')",
        "cardinality(MAP {'a': 1})",
        "[{'x': 1}, {'x': 2}][2].x",
        "list_transform([{'x': 1}, {'x': 2}], s -> s.x)",
        "decode('ab'::BLOB)",
        "octet_length('AB'::BLOB)",
        "current_schema()",
        "txid_current() >= 0",
    ]
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if str(srow[i]) != str(drow[i])
    ]
    assert not diffs, diffs[:6]
    # struct_insert over a column reference (the common shape)
    q = ("SELECT struct_insert(s, c := 9) AS v "
         "FROM (SELECT {'a': 1, 'b': 2} AS s) t")
    mine = eng.execute(q).collect()[0][0].asDict()
    theirs = ddb.execute(q).fetchall()[0][0]
    assert mine == theirs
    # struct unnest expands fields as columns
    q2 = "SELECT unnest({'a': 1, 'b': 2})"
    assert [tuple(r) for r in eng.execute(q2).collect()] == (
        ddb.execute(q2).fetchall()
    )
    # COLUMNS(lambda) over a registered table
    eng.register_parquet_dir(SF_DIR)
    for t in ("nation",):
        q3 = f"SELECT COLUMNS(c -> c LIKE 'n_n%') FROM {t} ORDER BY 1"
        assert [tuple(r) for r in eng.execute(q3).collect()] == (
            ddb.execute(q3).fetchall()
        )


def test_datetime_directive_grid_matches_duckdb(spark, ddb):
    """strftime/strptime directive battery: no-pad %-d forms, locale
    composites %x/%X/%c, lenient parsing (single-letter Java fields),
    day-name-stripped %A parsing, 3-arg date_sub complete-unit counts."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    exprs = [
        "strftime(TIMESTAMP '2024-07-09 05:03:07', '%-d/%-m %-H')",
        "strftime(DATE '2024-07-09', '%x')",
        "strftime(TIMESTAMP '2024-07-09 05:03:07', '%X')",
        "strftime(TIMESTAMP '2024-07-09 05:03:07', '%c')",
        "strptime('Jul 9 2024', '%b %d %Y')",
        "strptime('Tuesday, July 9, 2024', '%A, %B %d, %Y')",
        "strptime('2024-07-09 05:03:07 PM', '%Y-%m-%d %I:%M:%S %p')",
        "strptime('09/07/2024 05:03', '%d/%m/%Y %H:%M')",
        "date_sub('day', DATE '2024-01-01', DATE '2024-07-09')",
        "date_sub('month', DATE '2024-01-15', DATE '2024-03-14')",
        "date_sub('month', DATE '2024-03-14', DATE '2024-01-15')",
        "date_sub('year', DATE '2020-06-01', DATE '2024-05-31')",
        "date_sub('hour', TIMESTAMP '2024-01-01 00:30:00', "
        "TIMESTAMP '2024-01-01 05:00:00')",
        "date_diff('month', DATE '2024-01-31', DATE '2024-02-29')",
    ]
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    srow = [tuple(r) for r in eng.execute(sql).collect()][0]
    drow = ddb.execute(sql).fetchall()[0]
    diffs = [
        (exprs[i], srow[i], drow[i])
        for i in range(len(exprs))
        if str(srow[i]) != str(drow[i])
    ]
    assert not diffs, diffs[:6]


def test_quantified_comparisons_match_duckdb(spark, ddb):
    """ANY/ALL/SOME quantified subquery comparisons (Spark's parser
    rejects them outright; rewritten to IN/NOT IN or guarded min/max
    scalar aggregates). Grid covers empty sets (ALL over empty is TRUE),
    all-NULL and NULL-containing sets, compound left operands, the SOME
    synonym and the != spelling."""
    from duckdb_nsql_spark import connect

    eng = connect(spark=spark)
    eng.register_parquet_dir(SF_DIR)
    qs = [
        "SELECT count(*) AS n FROM customer WHERE c_acctbal > ANY"
        " (SELECT c_acctbal FROM customer WHERE c_custkey % 25 = 1)",
        "SELECT count(*) AS n FROM part WHERE p_retailprice = ANY"
        " (SELECT p_retailprice FROM part WHERE p_partkey % 24 = 1)",
        "SELECT count(*) AS n FROM part WHERE p_size < ALL"
        " (SELECT p_size FROM part WHERE p_partkey % 50 = 3)",
        "SELECT count(*) AS n FROM part WHERE p_size >= ALL"
        " (SELECT p_size FROM part WHERE p_partkey > 1e9)",
        "SELECT count(*) AS n FROM part WHERE p_size <> ALL"
        " (SELECT p_size FROM part WHERE p_partkey % 37 = 5)",
        "SELECT count(*) AS n FROM part WHERE p_size <> ANY"
        " (SELECT p_size FROM part WHERE p_partkey % 37 = 5)",
        "SELECT count(*) AS n FROM part WHERE p_size = ALL"
        " (SELECT p_size FROM part WHERE p_partkey = 7)",
        "SELECT count(*) AS n FROM part WHERE p_size = ALL"
        " (SELECT p_size FROM part WHERE p_partkey > 1e9)",
        "SELECT count(*) AS n FROM part WHERE p_size = ALL"
        " (SELECT nullif(p_size, p_size) FROM part WHERE p_partkey = 7)",
        "SELECT count(*) AS n FROM part WHERE p_size > ALL"
        " (SELECT nullif(p_size, 10) FROM part WHERE p_partkey % 100 = 11)",
        "SELECT count(*) AS n FROM customer WHERE c_acctbal + 10 > ANY"
        " (SELECT c_acctbal FROM customer WHERE c_custkey % 31 = 2)",
        "SELECT count(*) AS n FROM customer WHERE c_acctbal * 2 <= ALL"
        " (SELECT c_acctbal + 5000 FROM customer WHERE c_custkey % 13 = 4)",
        "SELECT count(*) AS n FROM orders WHERE o_orderstatus = SOME"
        " (SELECT o_orderstatus FROM orders WHERE o_orderkey % 19 = 1)",
        "SELECT count(*) AS n FROM part WHERE p_size != ANY"
        " (SELECT p_size FROM part WHERE p_partkey % 41 = 5)",
    ]
    for q in qs:
        srows = [tuple(r) for r in eng.execute(q).collect()]
        drows = ddb.execute(q).fetchall()
        assert sorted(map(str, srows)) == sorted(map(str, drows)), q


def test_canon_catches_cent_level_perturbation():
    """Round-5 ask #3's done-criterion: a deliberately injected ±0.01
    must fail the sweep's canon (the old :.6g hid it at 1e5 magnitude)."""
    a = canon([(324245.72,)], ["x"], ["float"])
    b = canon([(324245.73,)], ["x"], ["float"])
    assert a != b
    # while sub-1e-6 float32 rendering junk (driver-green) still passes
    c = canon([(0.2928,)], ["x"], ["float"])
    d = canon([(0.29280000925064087,)], ["x"], ["float"])
    assert c == d
    # and a DuckDB HUGEINT (int object here, float64 via fetchdf) equals
    # the Spark double rendering of the same value
    e = canon([(9,)], ["x"], ["float"])
    f = canon([(9.0,)], ["x"], ["float"])
    assert e == f


def test_sortable_guard_rejects_raw_array_entry(spark, ddb):
    """Round-6 ask #1's done-criterion: a deliberately added raw-array
    entry must FAIL the local suite.  A q114-shaped query projecting a
    raw LIST on both engines trips assert_driver_sortable on each side
    independently."""
    sdf = spark.sql("SELECT array(1, 2) AS a")
    with pytest.raises(AssertionError, match="pandas-sort"):
        assert_driver_sortable("fake_raw_array", sdf.schema, [("a", "BIGINT")])
    rel = ddb.sql("SELECT [1, 2] AS a")
    octs = list(zip(rel.columns, [str(t) for t in rel.types]))
    with pytest.raises(AssertionError, match="pandas-sort"):
        assert_driver_sortable(
            "fake_raw_array",
            spark.sql("SELECT 1 AS a").schema,
            octs,
        )
    # MAP outputs crash the driver the same way (dict cells)
    mdf = spark.sql("SELECT map('k', 1) AS m")
    with pytest.raises(AssertionError, match="pandas-sort"):
        assert_driver_sortable("fake_raw_map", mdf.schema, [("m", "BIGINT")])
    mrel = ddb.sql("SELECT map(['k'], [1]) AS m")
    with pytest.raises(AssertionError, match="pandas-sort"):
        assert_driver_sortable(
            "fake_raw_map",
            spark.sql("SELECT 1 AS m").schema,
            list(zip(mrel.columns, [str(t) for t in mrel.types])),
        )
