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


def test_validate_malformed_ddl_is_parser_error(loaded):
    """Non-query statements parse through the engine's own parsers
    (side effects suppressed) — a head-keyword match alone must not
    validate malformed DDL."""
    r = validate_sql(loaded, "CREATE TABLE t_bad (x INTEGR)")
    assert not r.ok and r.category == "parser", r
    r = validate_sql(loaded, "CREATE TABLE t_bad (x FLOOB(3), y INT)")
    assert not r.ok and r.category == "parser", r
    # well-formed DDL still validates, and validation creates NOTHING
    r = validate_sql(
        loaded,
        "CREATE TABLE t_good (x INTEGER PRIMARY KEY, y TEXT DEFAULT 'a',"
        " CHECK (x > 0))",
    )
    assert r.ok, r
    assert loaded._resolve_table_key("t_good") is None
    # the sentinel's constraint state was purged
    for attr in ("_checks", "_unique_keys", "_defaults", "_notnull_cols"):
        assert "__validate_coldefs__" not in getattr(loaded, attr)


def test_validate_ctas_and_view_check_inner_query(loaded):
    assert validate_sql(
        loaded, "CREATE TABLE t2 AS SELECT r_regionkey FROM region"
    ).ok
    r = validate_sql(
        loaded, "CREATE VIEW v2 AS SELECT no_col FROM region"
    )
    assert not r.ok and r.category == "binder", r
    assert loaded._resolve_table_key("t2") is None  # nothing materialized


def test_validate_copy_shapes(loaded, tmp_path):
    assert validate_sql(
        loaded, f"COPY region TO '{tmp_path}/r.csv' (FORMAT CSV, HEADER)"
    ).ok
    r = validate_sql(
        loaded, f"COPY (SELECT broken_col FROM region) TO '{tmp_path}/x.parquet'"
    )
    assert not r.ok and r.category == "binder", r
    r = validate_sql(loaded, f"COPY no_such_tbl TO '{tmp_path}/y.csv'")
    assert not r.ok and r.category == "catalog", r
    r = validate_sql(loaded, "COPY region")
    assert not r.ok and r.category == "parser", r


def test_validate_alter_and_drop(loaded):
    r = validate_sql(loaded, "ALTER TABLE region ALTER r_name SET DATA TYPE FLOOB")
    assert not r.ok and r.category == "parser", r
    assert validate_sql(
        loaded, "ALTER TABLE region ALTER r_name SET DATA TYPE VARCHAR"
    ).ok
    r = validate_sql(loaded, "ALTER TABLE ghost_tbl ADD COLUMN z INTEGER")
    assert not r.ok and r.category == "catalog", r
    r = validate_sql(loaded, "DROP TABLE ghost_tbl")
    assert not r.ok and r.category == "catalog", r
    assert validate_sql(loaded, "DROP TABLE IF EXISTS ghost_tbl").ok
    assert validate_sql(loaded, "DROP TABLE region").ok
    assert loaded._resolve_table_key("region") is not None  # not executed


def test_validate_merge_target(loaded):
    r = validate_sql(
        loaded,
        "MERGE INTO ghost_tbl USING region r ON ghost_tbl.a = r.r_regionkey "
        "WHEN MATCHED THEN UPDATE SET a = 1",
    )
    assert not r.ok and r.category == "catalog", r
    r = validate_sql(loaded, "MERGE region")  # no USING clause
    assert not r.ok and r.category == "parser", r


def test_validate_insert_select_binds_source(loaded):
    r = validate_sql(
        loaded, "INSERT INTO region SELECT broken FROM nation"
    )
    assert not r.ok and r.category == "binder", r


def test_validate_deadline_is_hang_proof(loaded, monkeypatch):
    """The documented timeout actually exists: a statement whose
    analysis hangs must return within the deadline, as VALID — the
    reference's subprocess validator does exactly this on
    TimeoutExpired (examples/utils.py:102-105)."""
    import time as _time

    def hang(self, sql, **kw):
        _time.sleep(300)

    monkeypatch.setattr(type(loaded), "_rewrite_query", hang)
    t0 = _time.monotonic()
    r = validate_sql(loaded, "SELECT 1", timeout_s=1.0)
    elapsed = _time.monotonic() - t0
    assert elapsed < 5.0, f"deadline not enforced ({elapsed:.1f}s)"
    assert r.ok  # timeout-means-valid, per the reference contract
