"""Layout maintenance (sources/maintenance.py): compaction preserves data
and reduces file count without a shuffle; clustering yields disjoint
per-file ranges that parquet pruning can exploit; both swaps are atomic.
"""

import os

import pytest

from duckdb_nsql_spark.sources import maintenance as mt

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture()
def fragmented(spark, tmp_path):
    """orders written as many small files (streaming-ingest shape)."""
    src = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    d = str(tmp_path / "orders_frag")
    src.repartition(24).write.parquet(d)
    return d, src.count()


def test_compact_preserves_rows_and_reduces_files(spark, fragmented):
    d, n = fragmented
    before = len(mt._data_files(d))
    assert before >= 24
    stats = mt.compact_parquet(spark, d, target_file_bytes=1 << 30)
    assert stats["files_before"] == before
    assert stats["files_after"] == 1
    assert spark.read.parquet(d).count() == n


def test_compact_plan_has_no_shuffle(spark, fragmented):
    d, _ = fragmented
    df = spark.read.parquet(d).coalesce(2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # coalesce is narrow — compaction's point


def test_cluster_produces_disjoint_file_ranges(spark, fragmented):
    d, n = fragmented
    mt.cluster_parquet(spark, d, ["o_custkey"], num_files=6)
    assert spark.read.parquet(d).count() == n
    ranges = mt.file_ranges(d, "o_custkey")
    assert len(ranges) >= 4
    assert mt.overlap_count(ranges) == 0
    # pruning evidence: a tight predicate's matching files << all files
    lo = ranges[0]
    hits = [r for r in ranges if r[0] <= lo[1] and r[1] >= lo[0]]
    assert len(hits) == 1


def test_cluster_rows_survive_and_filter_correct(spark, fragmented):
    d, _ = fragmented
    src_sum = spark.read.parquet(d).selectExpr(
        "sum(o_orderkey) AS s"
    ).collect()[0]["s"]
    mt.cluster_parquet(spark, d, ["o_orderdate"], num_files=4)
    after = spark.read.parquet(d)
    assert after.selectExpr("sum(o_orderkey) AS s").collect()[0]["s"] == src_sum


def test_call_compact_and_cluster_sql_surface(engine, spark, tmp_path):
    src = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    d = str(tmp_path / "nation_many")
    src.repartition(8).write.parquet(d)
    out = engine.execute(f"CALL compact('{d}')").collect()[0]
    assert out["files_after"] < out["files_before"]
    out2 = engine.execute(f"CALL cluster('{d}', 'n_regionkey')").collect()[0]
    assert out2["cluster_cols"] == "n_regionkey"
    assert spark.read.parquet(d).count() == 25


def test_checkpoint_collapses_streaming_segments(spark, tmp_path):
    """CHECKPOINT merges a durable table's streaming-append segments into
    one version dir (the WAL->storage analogue) and refreshes the
    session's view of the table; VACUUM stays a no-op."""
    from duckdb_nsql_spark import connect

    con = connect(spark=spark, database=str(tmp_path / "wh"))
    con.execute("CREATE TABLE t (x INTEGER); INSERT INTO t VALUES (1),(2)")
    wh = con._warehouse
    wh.append_table(spark, "t", spark.createDataFrame([(3,)], "x int"))
    wh.append_table(spark, "t", spark.createDataFrame([(4,)], "x int"))
    assert isinstance(wh.tables()["t"]["version"], list)
    assert len(wh.tables()["t"]["version"]) == 3
    con.execute("CHECKPOINT")
    ent = wh.tables()["t"]
    assert isinstance(ent["version"], str)  # single collapsed version
    assert sorted(
        r[0] for r in con.execute("SELECT x FROM t").collect()
    ) == [1, 2, 3, 4]
    con.execute("VACUUM")  # still a no-op
    con.close()


def test_zorder_prunes_both_columns(spark, tmp_path):
    """cluster() gives perfect pruning on the LEADING column and none on
    the second; zorder() must keep footer min/max spans narrow on BOTH.
    64x64 grid into 16 files: every z-ordered file's span on each axis
    must be <= half the global span, while the linear-clustered layout's
    second column spans the whole domain."""
    import itertools

    from duckdb_nsql_spark.sources import maintenance as mt

    n = 64
    rows = [(x, y) for x, y in itertools.product(range(n), range(n))]
    d1 = str(tmp_path / "zo")
    d2 = str(tmp_path / "cl")
    df = spark.createDataFrame(rows, ["x", "y"])
    df.repartition(8).write.parquet(d1)
    df.repartition(8).write.parquet(d2)

    mt.zorder_parquet(spark, d1, "x", "y", num_files=16)
    mt.cluster_parquet(spark, d2, ["x", "y"], num_files=16)

    def max_span(path, col):
        return max(hi - lo for lo, hi in mt.file_ranges(path, col))

    # z-order: rectangles — both axes bounded
    assert max_span(d1, "x") <= 32
    assert max_span(d1, "y") <= 32
    # linear cluster: leading column narrow, second column full-domain
    assert max_span(d2, "x") <= 8
    assert max_span(d2, "y") == n - 1
    # rows survive the rewrite
    assert spark.read.parquet(d1).count() == n * n


def test_call_zorder_sql_surface(engine, spark, tmp_path):
    import itertools

    d = str(tmp_path / "zsql")
    spark.createDataFrame(
        [(x, y) for x, y in itertools.product(range(16), range(16))],
        ["a", "b"],
    ).repartition(4).write.parquet(d)
    out = engine.execute(f"CALL zorder('{d}', 'a', 'b')").collect()[0]
    assert out["path"] == d and out["zorder_cols"] == "a,b"
    assert out["files"] >= 1
    assert spark.read.parquet(d).count() == 256
