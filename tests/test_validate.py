"""Parse/bind-only validator (port of examples/validate_sql.py semantics)."""

import pytest

from duckdb_nsql_spark.validate import validate_sql


@pytest.fixture()
def loaded(loaded_engine):
    return loaded_engine


def test_valid_query(loaded):
    r = validate_sql(loaded, "SELECT n_name FROM nation WHERE n_regionkey = 0")
    assert r.ok


def test_valid_duckdbism(loaded):
    r = validate_sql(loaded, "SELECT * EXCLUDE (r_name) FROM region")
    assert r.ok


def test_parser_error(loaded):
    r = validate_sql(loaded, "SELEC broken FROM nowhere")
    assert not r.ok and r.category == "parser"


def test_catalog_error(loaded):
    r = validate_sql(loaded, "SELECT * FROM no_such_table_xyz")
    assert not r.ok and r.category == "catalog"


def test_binder_error(loaded):
    r = validate_sql(loaded, "SELECT no_such_col FROM region")
    assert not r.ok and r.category == "binder"


def test_no_execution_side_effects(loaded):
    # validation of a query must not run a job — check it completes fast
    # and doesn't require data access (blocked external access)
    r = validate_sql(
        loaded, "SELECT * FROM read_csv_auto('http://example.com/x.csv')"
    )
    assert not r.ok  # external access denied during validation


def test_dml_against_missing_table(loaded):
    r = validate_sql(loaded, "INSERT INTO missing_tbl VALUES (1)")
    assert not r.ok and r.category == "catalog"


def test_empty(loaded):
    assert not validate_sql(loaded, "   ").ok


def test_validate_reservoir_sample_no_count(loaded, monkeypatch):
    # ADVICE r1: validation must not run the exact-reservoir count() job
    import pyspark.sql

    def boom(self):
        raise AssertionError("count() ran during validation")

    monkeypatch.setattr(pyspark.sql.DataFrame, "count", boom)
    r = validate_sql(loaded, "SELECT * FROM orders USING SAMPLE 10% (reservoir)")
    assert r.ok


def test_validate_file_table_fn_drops_views(loaded, tmp_path):
    # temp views registered while analyzing file table functions are dropped
    p = tmp_path / "v.csv"
    p.write_text("a,b\n1,2\n")
    before = {t.name for t in loaded.spark.catalog.listTables()}
    r = validate_sql(loaded, f"SELECT a FROM read_csv_auto('{p}')")
    assert r.ok
    after = {t.name for t in loaded.spark.catalog.listTables()}
    assert after == before


def test_validate_expands_macros(loaded):
    loaded.execute("CREATE OR REPLACE MACRO v_half(x) AS x / 2")
    r = validate_sql(loaded, "SELECT v_half(o_totalprice) AS h FROM orders")
    assert r.ok, r
    # a genuinely unknown function still fails as before
    r2 = validate_sql(loaded, "SELECT no_such_fn(o_totalprice) FROM orders")
    assert not r2.ok
    loaded.execute("DROP MACRO v_half")


def test_validate_covers_engine_prepass_shapes(loaded_engine):
    """Statements the engine executes via SQL-level pre-passes (ASOF
    JOIN, UNION BY NAME, WHERE on a select alias) must validate too —
    round-4 regression: the validator bypassed those passes and rejected
    valid statements."""
    from duckdb_nsql_spark import validate

    ok_stmts = [
        "SELECT o.o_orderkey, e.value FROM orders o ASOF LEFT JOIN events e "
        "ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate",
        "SELECT n_regionkey AS k, count(*) AS n FROM nation GROUP BY 1 "
        "UNION ALL BY NAME SELECT count(*) AS n, r_regionkey AS k "
        "FROM region GROUP BY 2",
        "SELECT c_custkey, upper(c_mktsegment[1:4]) AS seg4 FROM customer "
        "WHERE seg4 = 'AUTO'",
    ]
    for stmt in ok_stmts:
        res = validate.validate_sql(loaded_engine, stmt)
        assert res.ok, (stmt, res.category, res.error)
    # and a broken ASOF shape is still rejected (loudly classified)
    res = validate.validate_sql(
        loaded_engine,
        "SELECT 1 FROM orders o ASOF JOIN events e "
        "ON o.o_custkey = e.user_id AND e.ts < o.o_orderdate",
    )
    assert not res.ok
