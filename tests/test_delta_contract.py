"""Contract tests for the warehouse's DELTA branches.

The container ships no delta-spark jars, so the delta code paths cannot
run end-to-end here — these tests pin the CONTRACT instead: given a
stubbed Delta runtime (``delta_available`` forced true, a fake
``delta.tables.DeltaTable`` module, fake DataFrame/Spark recorders), the
warehouse must issue exactly the Delta API calls the cluster path relies
on — ``format('delta')`` writes, ``txnAppId``/``txnVersion`` idempotence
options, and the ``forPath -> merge(cond) -> whenMatchedUpdate ->
whenNotMatchedInsertAll -> execute`` MERGE chain. On a real cluster the
same code runs against the real jars; nothing here is delta-specific
mocking of OUR logic, only of Delta's entry points.
"""

import os
import sys
import types

import pytest

from duckdb_nsql_spark.sources import warehouse as wh


class FakeWriter:
    def __init__(self, log):
        self.log = log
        self.calls = {"options": {}}

    def format(self, fmt):
        self.calls["format"] = fmt
        return self

    def mode(self, m):
        self.calls["mode"] = m
        return self

    def option(self, k, v):
        self.calls["options"][k] = v
        return self

    def save(self, path):
        self.calls["save"] = path
        self.log.append(("write", dict(self.calls)))

    def parquet(self, path):  # pragma: no cover - parquet fallback guard
        self.calls["parquet"] = path
        self.log.append(("write", dict(self.calls)))


class FakeCol:
    """Minimal Column stand-in for the window/reduce plumbing."""

    def desc(self):
        return self

    def __eq__(self, other):  # noqa: D105 — comparison builds a FakeCol
        return FakeCol()

    def __hash__(self):  # noqa: D105
        return 0


class FakeDF:
    def __init__(self, log, columns=("k", "v", "ts")):
        self.log = log
        self.columns = list(columns)

    @property
    def write(self):
        return FakeWriter(self.log)

    # window-reduce plumbing used by upsert_table's batch reduction
    def withColumn(self, name, col):
        return self

    def filter(self, cond):
        return self

    def drop(self, name):
        return self

    def alias(self, a):
        self.log.append(("df.alias", a))
        return self


class FakeReader:
    def __init__(self, log):
        self.log = log

    def format(self, fmt):
        self.log.append(("read.format", fmt))
        return self

    def option(self, k, v):
        self.log.append(("read.option", k, v))
        return self

    def load(self, path):
        self.log.append(("read.load", path))
        return "LOADED_DELTA_DF"


class FakeSpark:
    def __init__(self, log):
        self.log = log

    @property
    def read(self):
        return FakeReader(self.log)


class FakeRow(dict):
    def __getattr__(self, k):  # noqa: D105 — Row-style attribute access
        return self[k]


class FakeMerge:
    """Stub DeltaTable handle: merge chain + history/restore surface.

    ``version_by_path`` (class-level) lets a test advance a table's Delta
    log version between calls, emulating in-transaction DML."""

    version_by_path: dict = {}

    def __init__(self, log, path=None):
        self.log = log
        self.path = path

    def history(self, n=None):
        ver = self.version_by_path.get(self.path, 0)
        log, path = self.log, self.path
        log.append(("history", path, n))

        class _H:
            def collect(self):
                return [FakeRow(version=ver)]

        return _H()

    def restoreToVersion(self, v):
        self.log.append(("restoreToVersion", self.path, v))
        self.version_by_path[self.path] = v

    def merge(self, src, cond):
        self.log.append(("merge.cond", cond))
        return self

    def alias(self, a):
        self.log.append(("merge.alias", a))
        return self

    def whenMatchedUpdate(self, condition=None, set=None):
        self.log.append(("merge.whenMatchedUpdate", condition, dict(set)))
        return self

    def whenNotMatchedInsertAll(self):
        self.log.append(("merge.whenNotMatchedInsertAll",))
        return self

    def execute(self):
        self.log.append(("merge.execute",))


@pytest.fixture()
def delta_stub(monkeypatch, tmp_path):
    """Force delta mode on and install a fake delta.tables module."""
    log: list = []
    monkeypatch.setattr(wh, "delta_available", lambda spark: True)
    fake_tables = types.ModuleType("delta.tables")

    FakeMerge.version_by_path = {}

    class DeltaTable:
        @staticmethod
        def forPath(spark, path):
            log.append(("DeltaTable.forPath", path))
            return FakeMerge(log, path)

    fake_tables.DeltaTable = DeltaTable
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)
    # window plumbing without a real Spark session
    fake_w = types.SimpleNamespace(
        partitionBy=lambda *c: types.SimpleNamespace(orderBy=lambda *o: "W")
    )
    monkeypatch.setattr(
        "pyspark.sql.Window",
        fake_w,
        raising=False,
    )
    monkeypatch.setattr(
        "pyspark.sql.functions.col", lambda c: FakeCol(), raising=False
    )
    monkeypatch.setattr(
        "pyspark.sql.functions.row_number",
        lambda: types.SimpleNamespace(over=lambda w: FakeCol()),
        raising=False,
    )
    w = wh.DurableWarehouse(str(tmp_path / "wh"), fmt="delta")
    return w, log


def test_delta_save_table_contract(delta_stub):
    w, log = delta_stub
    spark = FakeSpark(log)
    df = FakeDF(log)
    out = w.save_table(spark, "t1", df, meta={"m": 1})
    writes = [t[1] for t in log if t[0] == "write"]
    assert writes and writes[0]["format"] == "delta"
    assert writes[0]["mode"] == "overwrite"
    assert writes[0]["options"].get("overwriteSchema") == "true"
    ent = w.tables()["t1"]
    assert ent["version"] == "delta" and ent["meta"] == {"m": 1}
    assert out == "LOADED_DELTA_DF"
    # load_df goes through the delta reader too
    assert w.load_df(spark, "t1") == "LOADED_DELTA_DF"
    assert ("read.format", "delta") in log


def test_delta_append_txn_idempotence_options(delta_stub):
    w, log = delta_stub
    spark = FakeSpark(log)
    w.append_table(
        spark,
        "t2",
        FakeDF(log),
        meta={"stream_wm": {"s1": 7}},
        txn=("s1", 7),
    )
    writes = [t[1] for t in log if t[0] == "write"]
    assert writes[-1]["format"] == "delta" and writes[-1]["mode"] == "append"
    assert writes[-1]["options"].get("txnAppId") == "s1"
    assert writes[-1]["options"].get("txnVersion") == "7"
    assert w.tables()["t2"]["meta"]["stream_wm"] == {"s1": 7}


def test_delta_upsert_merge_chain(delta_stub):
    w, log = delta_stub
    spark = FakeSpark(log)
    # bootstrap: first batch appends (creates the delta table)
    w.upsert_table(
        spark, "t3", FakeDF(log), ["k"], "ts", meta={}, txn=("cdc", 0)
    )
    writes = [t[1] for t in log if t[0] == "write"]
    assert writes[-1]["mode"] == "append"
    log.clear()
    # second batch: native MERGE against the existing table
    w.upsert_table(
        spark,
        "t3",
        FakeDF(log),
        ["k"],
        "ts",
        meta={"stream_wm": {"cdc": 1}},
        txn=("cdc", 1),
    )
    ops = [e[0] for e in log]
    assert "DeltaTable.forPath" in ops
    assert ("merge.whenNotMatchedInsertAll",) in log
    assert ("merge.execute",) in log
    cond = next(e[1] for e in log if e[0] == "merge.cond")
    assert cond == "t.k = s.k"
    upd = next(e for e in log if e[0] == "merge.whenMatchedUpdate")
    assert upd[1] == "(s.ts >= t.ts)"  # only newer rows overwrite
    assert upd[2] == {"k": "s.k", "v": "s.v", "ts": "s.ts"}
    # the forPath target is the committed table dir
    path = next(e[1] for e in log if e[0] == "DeltaTable.forPath")
    assert path == os.path.join(w.root, w.tables()["t3"]["dir"])
    # watermark meta committed with the merge
    assert w.tables()["t3"]["meta"]["stream_wm"] == {"cdc": 1}


def test_delta_upsert_merge_tiebreak_condition(delta_stub):
    """The matched condition must be the FULL lexicographic comparison
    over (order_col, *tiebreak_cols) — an existing row that ties on
    order_col but wins the tiebreak must survive, matching the parquet
    path's row_number ordering. Only the FINAL key keeps >= (replay
    idempotence)."""
    w, log = delta_stub
    spark = FakeSpark(log)
    w.upsert_table(
        spark, "t4", FakeDF(log), ["k"], "ts",
        tiebreak_cols=["seq", "src"], meta={}, txn=("cdc", 0),
    )
    log.clear()
    w.upsert_table(
        spark, "t4", FakeDF(log), ["k"], "ts",
        tiebreak_cols=["seq", "src"], meta={}, txn=("cdc", 1),
    )
    upd = next(e for e in log if e[0] == "merge.whenMatchedUpdate")
    assert upd[1] == (
        "(s.ts > t.ts)"
        " OR (s.ts = t.ts AND s.seq > t.seq)"
        " OR (s.ts = t.ts AND s.seq = t.seq AND s.src >= t.src)"
    )


def test_delta_rollback_restores_advanced_logs(delta_stub):
    """ROLLBACK interplay: a catalog restore alone cannot rewind Delta's
    per-table log, so the session snapshots each table's log version at
    BEGIN (delta_table_versions) and rollback must issue
    restoreToVersion for exactly the tables whose log advanced —
    untouched tables get no restore call."""
    w, log = delta_stub
    spark = FakeSpark(log)
    w.save_table(spark, "ta", FakeDF(log), {})
    w.save_table(spark, "tb", FakeDF(log), {})
    snap = w.delta_table_versions(spark)
    assert set(snap) == {"ta", "tb"} and set(snap.values()) == {0}
    # in-transaction DML advances ta's Delta log to version 3
    pa = os.path.join(w.root, w.tables()["ta"]["dir"])
    FakeMerge.version_by_path[pa] = 3
    log.clear()
    w.restore_delta_versions(spark, snap)
    restores = [e for e in log if e[0] == "restoreToVersion"]
    assert restores == [("restoreToVersion", pa, 0)]
    assert FakeMerge.version_by_path[pa] == 0  # log rewound
    # idempotent: nothing advanced -> no restore calls
    log.clear()
    w.restore_delta_versions(spark, w.delta_table_versions(spark))
    assert [e for e in log if e[0] == "restoreToVersion"] == []


def test_delta_rollback_skips_missing_table_dirs(delta_stub):
    """A snapshotted table whose directory vanished during the
    transaction (drop_table rmtrees immediately) makes forPath raise;
    rollback must SKIP it and still rewind the remaining tables' logs
    (r7 ADVICE: an unguarded forPath aborted the loop, leaving a
    partially applied ROLLBACK)."""
    w, log = delta_stub
    spark = FakeSpark(log)
    w.save_table(spark, "ta", FakeDF(log), {})
    w.save_table(spark, "tb", FakeDF(log), {})
    snap = w.delta_table_versions(spark)
    pa = os.path.join(w.root, w.tables()["ta"]["dir"])
    pb = os.path.join(w.root, w.tables()["tb"]["dir"])
    # both logs advanced in-transaction; ta's directory then vanished
    FakeMerge.version_by_path[pa] = 2
    FakeMerge.version_by_path[pb] = 5
    mod = sys.modules["delta.tables"]
    orig = mod.DeltaTable.forPath

    def raising_for_pa(spark, path, _orig=orig):
        if path == pa:
            raise RuntimeError("no delta log at " + path)
        return _orig(spark, path)

    mod.DeltaTable.forPath = raising_for_pa
    try:
        log.clear()
        w.restore_delta_versions(spark, snap)
    finally:
        mod.DeltaTable.forPath = orig
    restores = [e for e in log if e[0] == "restoreToVersion"]
    assert restores == [("restoreToVersion", pb, 0)]
    assert FakeMerge.version_by_path[pb] == 0


def test_delta_append_conflict_then_replay_same_txn(delta_stub, monkeypatch):
    """CommitConflict interplay on the delta append path: the data append
    and the catalog commit are SEPARATE transactions, so a conflict
    between them leaves appended rows behind. The contract that makes
    the retry safe: the replayed append carries the IDENTICAL
    txnAppId/txnVersion pair (Delta's log then no-ops the duplicate),
    and the catalog commit succeeds on the retry."""
    w, log = delta_stub
    spark = FakeSpark(log)
    w.append_table(spark, "tc", FakeDF(log), {}, txn=("cdc", 7))
    base_entry = dict(w.tables()["tc"])

    real = w._commit_entry
    calls = {"n": 0}

    def conflict_once(name, entry, base):
        calls["n"] += 1
        if calls["n"] == 1:
            raise wh.CommitConflict("concurrent writer")
        return real(name, entry, base)

    monkeypatch.setattr(w, "_commit_entry", conflict_once)
    log.clear()
    with pytest.raises(wh.CommitConflict):
        w.append_table(spark, "tc", FakeDF(log), {}, txn=("cdc", 8))
    first = [t[1] for t in log if t[0] == "write"][-1]
    # data hit the Delta log before the conflict — replay must dedup
    assert first["options"] == {"txnAppId": "cdc", "txnVersion": "8"}
    # catalog untouched by the failed commit
    assert w.tables()["tc"] == base_entry
    log.clear()
    w.append_table(spark, "tc", FakeDF(log), {}, txn=("cdc", 8))
    second = [t[1] for t in log if t[0] == "write"][-1]
    assert second["options"] == first["options"]  # identical txn key
    assert w.tables()["tc"]["meta"] == {}  # retry committed


def test_delta_unavailable_raises(tmp_path):
    w = wh.DurableWarehouse(str(tmp_path / "wh2"), fmt="delta")
    with pytest.raises(RuntimeError, match="delta-spark"):
        w.save_table(FakeSpark([]), "t", FakeDF([]), meta={})


def test_delta_time_travel_reads_version_as_of(delta_stub):
    """load_df_at on a delta warehouse must pin versionAsOf to the Delta
    log version RECORDED AT COMMIT TIME — not read the current snapshot
    (which would silently return wrong data for historical commits)."""
    w, log = delta_stub
    spark = FakeSpark(log)
    w.save_table(spark, "tt", FakeDF(log), meta={"gen": 1})
    first_commit = w.commits()[-1]
    tdir = w.tables()["tt"]["dir"]
    path = os.path.join(w.root, tdir)
    assert w.catalog_at(first_commit)["tables"]["tt"]["delta_version"] == 0
    # the Delta log advances (second overwrite) — new commit records v1
    FakeMerge.version_by_path[path] = 1
    w.save_table(spark, "tt", FakeDF(log), meta={"gen": 2})
    second_commit = w.commits()[-1]
    assert w.catalog_at(second_commit)["tables"]["tt"]["delta_version"] == 1
    log.clear()
    assert w.load_df_at(spark, "tt", first_commit) == "LOADED_DELTA_DF"
    assert ("read.option", "versionAsOf", "0") in log
    log.clear()
    assert w.load_df_at(spark, "tt", second_commit) == "LOADED_DELTA_DF"
    assert ("read.option", "versionAsOf", "1") in log


def test_delta_time_travel_pre_versioned_commit_raises(delta_stub):
    """A delta commit entry WITHOUT delta_version (written before version
    tracking, or with an unreadable log) must refuse time travel loudly
    instead of returning the latest snapshot."""
    w, log = delta_stub
    spark = FakeSpark(log)
    w.save_table(spark, "old", FakeDF(log), meta={})
    num = w.commits()[-1]
    # strip the recorded version, emulating a pre-tracking commit
    import json as _json

    cpath = os.path.join(w.root, "_commits", f"{num:020d}.json")
    cat = _json.load(open(cpath))
    cat["tables"]["old"].pop("delta_version")
    with open(cpath, "w") as f:
        _json.dump(cat, f)
    with pytest.raises(ValueError, match="delta version tracking"):
        w.load_df_at(spark, "old", num)
