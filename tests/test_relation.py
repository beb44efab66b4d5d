"""DuckDBPyRelation-compatible relation API (relation.py): chainers
compose lazily through the dialect pipeline; terminals fetch. Where the
construct exists in the container's duckdb, the SAME chain runs on a real
DuckDBPyRelation as the oracle.
"""

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")  # matches conftest


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("nation", "region", "customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _sorted(rows):
    return sorted(tuple(r) for r in rows)


def test_sql_returns_relation_chain(loaded_engine, duck):
    mine = (
        loaded_engine.sql("SELECT * FROM nation")
        .filter("n_regionkey = 1")
        .project("n_name", "n_nationkey + 100 AS k")
        .order("k")
        .fetchall()
    )
    theirs = (
        duck.sql("SELECT * FROM nation")
        .filter("n_regionkey = 1")
        .project("n_name, n_nationkey + 100 AS k")
        .order("k")
        .fetchall()
    )
    assert mine == theirs


def test_relation_aggregate_matches_duckdb(loaded_engine, duck):
    chain = lambda root: root.aggregate(  # noqa: E731
        "n_regionkey, count(*) AS n", "n_regionkey"
    ).order("n_regionkey")
    assert (
        chain(loaded_engine.sql("FROM nation")).fetchall()
        == chain(duck.sql("FROM nation")).fetchall()
    )


def test_relation_aggregate_group_by_all(loaded_engine):
    rel = loaded_engine.sql("FROM nation").aggregate(
        "n_regionkey, count(*) AS n"
    )
    rows = dict(rel.fetchall())
    assert sum(rows.values()) == 25 and len(rows) == 5


def test_relation_join_with_aliases(loaded_engine, duck):
    def chain(con):
        n = con.sql("FROM nation").set_alias("n")
        r = con.sql("FROM region").set_alias("r")
        return (
            n.join(r, "n.n_regionkey = r.r_regionkey")
            .project("r_name, n_name")
            .order("r_name, n_name")
            .fetchall()
        )

    assert chain(loaded_engine) == chain(duck)


def test_relation_limit_offset_count(loaded_engine, duck):
    mine = loaded_engine.sql("FROM nation").order("n_nationkey").limit(3, 5)
    theirs = duck.sql("FROM nation ORDER BY n_nationkey").limit(3, 5)
    assert mine.fetchall() == theirs.fetchall()
    assert (
        loaded_engine.sql("FROM orders").count("*").fetchone()
        == duck.sql("FROM orders").count("*").fetchone()
    )


def test_relation_setops_and_distinct(loaded_engine, duck):
    def chain(con):
        a = con.sql("SELECT n_regionkey FROM nation")
        b = con.sql("SELECT r_regionkey AS n_regionkey FROM region WHERE r_regionkey < 2")
        return _sorted(a.distinct().except_(b).fetchall())

    assert chain(loaded_engine) == chain(duck)


def test_relation_scalar_aggs(loaded_engine, duck):
    for m in ("min", "max", "sum"):
        mine = getattr(loaded_engine.sql("FROM orders"), m)("o_custkey")
        theirs = getattr(duck.sql("FROM orders"), m)("o_custkey")
        assert mine.fetchone() == theirs.fetchone()


def test_relation_duckdb_dialect_exprs(loaded_engine):
    # DuckDB-dialect inside relation ops: 1-based slice + :: cast
    rows = (
        loaded_engine.sql("FROM region")
        .project("r_name[1:2] AS pre", "r_regionkey::VARCHAR AS k")
        .order("k")
        .fetchall()
    )
    assert len(rows) == 5 and all(len(p) <= 2 for p, _ in rows)


def test_relation_metadata_and_terminals(loaded_engine):
    rel = loaded_engine.sql("SELECT n_name, n_nationkey FROM nation")
    assert rel.columns == ["n_name", "n_nationkey"]
    assert rel.types[1] in ("BIGINT", "INTEGER")
    assert rel.shape == (25, 2)
    pdf = rel.df()
    assert list(pdf.columns) == ["n_name", "n_nationkey"] and len(pdf) == 25
    at = rel.fetch_arrow_table()
    assert at.num_rows == 25
    np_cols = rel.fetchnumpy()
    assert len(np_cols["n_nationkey"]) == 25
    assert rel.fetchmany(4).__len__() == 4


def test_relation_create_and_insert(engine):
    engine.execute("CREATE TABLE base(a INT)")
    engine.execute("INSERT INTO base VALUES (1), (2), (3)")
    engine.sql("SELECT a * 10 AS a FROM base").create("tens")
    assert _sorted(engine.execute("SELECT * FROM tens").collect()) == [
        (10,), (20,), (30,),
    ]
    engine.sql("SELECT 99 AS a").insert_into("tens")
    assert _sorted(engine.execute("SELECT * FROM tens").collect()) == [
        (10,), (20,), (30,), (99,),
    ]


def test_relation_to_parquet_roundtrip(loaded_engine, tmp_path):
    p = str(tmp_path / "nation_out.parquet")
    loaded_engine.sql("FROM nation").to_parquet(p)
    back = loaded_engine.execute(f"SELECT count(*) AS n FROM read_parquet('{p}')")
    assert back.collect()[0][0] == 25


def test_relation_delegates_to_dataframe(loaded_engine):
    rel = loaded_engine.sql("FROM nation")
    # Spark DataFrame surface still reachable
    assert rel.schema.fieldNames()[0] == "n_nationkey"
    assert rel.select("n_name").count() == 25


def test_alias_survives_chained_ops_into_join(loaded_engine):
    """set_alias must persist through filter/project/order (duckdb
    preserves the relation alias across single-parent chainers) so a
    later join condition can reference it; join results start fresh.
    Regression: harness/fuzz_relation.py combos failed to bind lhs.k."""
    lhs = (
        loaded_engine.sql("SELECT c_custkey AS k, c_mktsegment AS s FROM customer")
        .set_alias("lhs")
        .filter("k < 50")
    )
    rhs = loaded_engine.sql(
        "SELECT c_custkey AS k2, round(c_acctbal, 1) AS v FROM customer"
    ).set_alias("rhs")
    rows = (
        lhs.join(rhs, "lhs.k = rhs.k2", how="left")
        .project("k, s, v")
        .order("k")
        .fetchall()
    )
    assert len(rows) == 50 and rows[0][0] == 0


def test_relation_fuzz_seed_5(loaded_engine):
    """Pinned relation-API differential seed: 50 random chains/combos
    (project/filter/aggregate/order/limit/distinct plus union/except/
    intersect/join combinators) replayed on duckdb's native relation
    API and the engine's DuckRelation."""
    import importlib.util
    import os as _os
    import random

    import duckdb as _duckdb

    path = _os.path.join(
        _os.path.dirname(__file__), "..", "harness", "fuzz_relation.py"
    )
    spec = importlib.util.spec_from_file_location("fuzz_relation", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.rng = random.Random(5)
    _sfdir = _os.environ.get(
        "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01"
    )  # must match conftest SF_DIR (loaded_engine's data)
    ddb = _duckdb.connect()
    for t in mod.TABLES:
        ddb.execute(
            "CREATE VIEW {0} AS SELECT * FROM "
            "read_parquet('{1}/{0}.parquet')".format(t, _sfdir)
        )
    fails = 0
    for ci in range(50):
        t = mod.rng.choice(list(mod.TABLES))
        combo = mod.rng.random() < 0.35
        state = mod.rng.getstate()
        steps = None if combo else mod.build_chain(t)
        base = f"SELECT * FROM {t}"
        if combo:
            mod.rng.setstate(state)
            d = mod.build_combo(t, ddb.sql).fetchall()
            mod.rng.setstate(state)
            s = mod.build_combo(t, loaded_engine.sql).fetchall()
        else:
            d = mod.apply_chain(ddb.sql(base), steps).fetchall()
            s = mod.apply_chain(loaded_engine.sql(base), steps).fetchall()
        if sorted(map(str, d)) != sorted(map(str, s)):
            fails += 1
    assert fails == 0
