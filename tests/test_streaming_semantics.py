"""Incremental-trigger semantics of the streaming windows: watermark
advancement across micro-batches, append-mode window finalization, and
late-data dropping — the behaviors a single availableNow batch (the
oracle-parity tests) cannot observe. Also pins the session-window merge
boundary that ORACLE_STREAM_SESSION's gaps-and-islands SQL assumes.
"""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from duckdb_nsql_spark.streaming import windows as sw


def _write_events(path: str, rows: list[tuple[int, str]]) -> None:
    """rows: (event_id, 'HH:MM') on a fixed day, schema of events.parquet."""
    ts = [
        dt.datetime(2024, 3, 1, int(h), int(m), tzinfo=dt.timezone.utc)
        for h, m in (t.split(":") for _, t in rows)
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([i for i, _ in rows], pa.int64()),
            "ts": pa.array([t.replace(tzinfo=None) for t in ts],
                           pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, path)


def test_append_mode_watermark_closes_windows_and_drops_late(spark, tmp_path):
    # two availableNow runs over a shared checkpoint: run 2 restores the
    # watermark (12:00) and window state from run 1 — the restart shape a
    # production job takes — so the late event must drop and only the
    # windows the restored watermark closed may emit
    d = str(tmp_path / "stream_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)

    def run_once():
        # memory sink cannot recover from a checkpoint; foreachBatch can
        acc = []
        stream = sw.read_events_stream(spark, d)
        agg = sw.tumbling_agg(stream, window="1 hour", watermark="1 hour")
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, _epoch: acc.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return {r["window_start"].strftime("%H:%M"): r["n"] for r in acc}

    # run 1: windows 10:00 (x2), 11:00 (x1), 13:00 (x1); availableNow
    # finalizes the watermark (13:00 - 1h = 12:00) before terminating, so
    # the two closed windows emit within this run; [13,14) stays open
    _write_events(os.path.join(d, "a.parquet"),
                  [(1, "10:05"), (2, "10:45"), (3, "11:10"), (4, "13:00")])
    assert run_once() == {"10:00": 2, "11:00": 1}

    # run 2 restores watermark 12:00 from the checkpoint: 10:30 is LATE
    # (its window already closed and emitted) and must vanish — were it
    # accepted, window 10:00 would re-emit. 16:00 pushes the watermark to
    # 15:00, closing [13,14) with run 1's restored state.
    _write_events(os.path.join(d, "b.parquet"),
                  [(5, "10:30"), (6, "16:00")])
    r2 = run_once()
    assert r2 == {"13:00": 1}, r2  # no 10:00 re-emission, no open 16:00


@pytest.mark.parametrize(
    "minute_b,expect_sessions",
    [(30, 1), (31, 2)],  # gap=30m: boundary-inclusive merge, split past gap
)
def test_session_window_gap_boundary(spark, tmp_path, minute_b, expect_sessions):
    # pins the boundary ORACLE_STREAM_SESSION's lag() SQL assumes: an event
    # at exactly prev_ts + gap still merges; only a STRICTLY larger gap
    # starts a new session
    d = str(tmp_path / f"sess_{minute_b}")
    os.makedirs(d)
    _write_events(os.path.join(d, "x.parquet"),
                  [(1, "10:00"), (2, f"10:{minute_b}")])
    stream = sw.read_events_stream(spark, d)
    agg = sw.session_agg(stream, gap="30 minutes", watermark="2 hours")
    out = sw.run_stream_to_memory(agg, f"t_sess_{minute_b}", mode="complete")
    assert out.count() == expect_sessions
    if expect_sessions == 1:
        row = out.collect()[0]
        # session_end = last event + gap
        assert row["session_end"].minute == (minute_b + 30) % 60


def test_stateful_accumulates_across_restarts(spark, tmp_path):
    # running_user_stats state survives a checkpointed restart and keeps
    # accumulating — not resetting per run
    from duckdb_nsql_spark.streaming import stateful as st

    d = str(tmp_path / "stateful_in")
    ckpt = str(tmp_path / "state_ckpt")
    os.makedirs(d)

    def run_once():
        # memory sink cannot recover from a checkpoint; foreachBatch can
        acc = []
        stream = sw.read_events_stream(spark, d)
        out = st.running_user_stats(stream)
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda df, _epoch: acc.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return acc

    _write_events(os.path.join(d, "a.parquet"), [(1, "10:00"), (2, "10:10")])
    r1 = run_once()
    assert [r["n_events"] for r in r1] == [2]
    _write_events(os.path.join(d, "b.parquet"), [(3, "10:20")])
    r2 = run_once()
    assert [r["n_events"] for r in r2] == [3]  # restored 2 + 1 new


def _write_typed_events(path: str, rows: list[tuple[int, str, str]]) -> None:
    """rows: (event_id, 'HH:MM', event_type) on the fixed day."""
    ts = [
        dt.datetime(2024, 3, 1, int(h), int(m))
        for h, m in (t.split(":") for _, t, _ty in rows)
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([i for i, _, _ty in rows], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([ty for _, _, ty in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, path)


def test_stream_stream_join_state_ages_out(spark, tmp_path):
    """Inner stream-stream join state lifecycle over one continuous run
    (maxFilesPerTrigger=1 -> one file per micro-batch): in-bound matches
    always emit; once the watermark passes a row's join window the state
    is swept at the end of the next batch that ran with that watermark —
    a too-late arrival may brush not-yet-swept state (best-effort drop,
    Spark's documented contract) but after the sweep an equally-late
    arrival finds NOTHING. The sweep is what bounds join state at ~one
    watermark interval per side. (Across availableNow restarts the
    dual-watermark query does not advance its restored watermark on this
    build, so the lifecycle is pinned within a single run.)"""
    d = str(tmp_path / "join_in")
    os.makedirs(d)
    files = [
        # b0: click+purchase pair up; click 13:00 will drive the watermark
        ("a.parquet", [(1, "10:00", "click"), (2, "10:10", "purchase"),
                       (3, "13:00", "click")]),
        # b1: purchase 13:10 joins click 3; watermark after: 12:00
        ("b.parquet", [(5, "13:10", "purchase")]),
        # b2: late-day click advances the clicks-side max -> wm 12:10
        ("c.parquet", [(7, "16:00", "click")]),
        # b3: too-late purchase -- may brush unswept click-1 state
        ("e.parquet", [(6, "10:25", "purchase")]),
        # b4: equally-late purchase -- state swept, must find nothing
        ("f.parquet", [(8, "10:26", "purchase")]),
    ]
    for i, (fname, rows) in enumerate(files):
        path = os.path.join(d, fname)
        _write_typed_events(path, rows)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    per_batch: dict[int, list] = {}
    stream = sw.read_events_stream(spark, d, max_files_per_trigger=1)
    joined = sw.stream_stream_join(stream, within="30 minutes", watermark="1 hour")
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, epoch: per_batch.setdefault(int(epoch), []).extend(
                sorted((r["left_id"], r["right_id"]) for r in df.collect())
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert per_batch.get(0) == [(1, 2)]
    assert per_batch.get(1) == [(3, 5)]
    assert per_batch.get(2, []) == []
    assert set(per_batch.get(3, [])) <= {(1, 6)}  # best-effort late drop
    assert per_batch.get(4, []) == []  # state swept: no (1, 8)


def test_stream_dedup_across_micro_batches_and_watermark_expiry(
    spark, tmp_path
):
    """dropDuplicatesWithinWatermark: a key repeated in a LATER micro-batch
    is suppressed while inside the watermark horizon, but re-emits once
    the watermark has advanced past its state (bounded state — the
    property that matters on an infinite stream)."""
    from duckdb_nsql_spark.streaming import dedup as sd

    d = str(tmp_path / "ded_in")
    os.makedirs(d)
    files = [
        ("a.parquet", [(1, "01:00"), (2, "01:10")]),
        # batch 2: id=1 again within watermark -> suppressed; id=3 new
        ("b.parquet", [(1, "01:20"), (3, "01:30")]),
        # batch 3: far future advances the watermark past the old state
        ("c.parquet", [(9, "09:00")]),
        # batch 4: watermark eviction lags one batch (state store sweeps
        # at batch END using the PREVIOUS batch's closing watermark), so
        # this occurrence is still suppressed...
        ("d.parquet", [(1, "09:30")]),
        # ...and batch 5's is the first to see the swept store: re-emits
        ("e.parquet", [(1, "09:40")]),
        # batch 6: fresh state from 09:40 suppresses again
        ("f.parquet", [(1, "09:50")]),
    ]
    for i, (fname, rows) in enumerate(files):
        path = os.path.join(d, fname)
        _write_events(path, rows)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    per_batch: dict[int, list] = {}
    stream = sw.read_events_stream(spark, d, max_files_per_trigger=1)
    out = sd.dedup_exact_stream(
        stream, key_cols=("event_id",), watermark="1 hour"
    ).select("event_id")
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, epoch: per_batch.setdefault(int(epoch), []).extend(
                sorted(r["event_id"] for r in df.collect())
            )
        )
        .option("checkpointLocation", str(tmp_path / "ded_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert per_batch.get(0) == [1, 2]
    assert per_batch.get(1) == [3]          # duplicate id=1 suppressed
    assert per_batch.get(2) == [9]
    assert per_batch.get(3) == []           # eviction lags one batch
    assert per_batch.get(4) == [1]          # state expired -> re-emitted
    assert per_batch.get(5) == []           # re-armed state suppresses


def test_warehouse_sink_exactly_once_across_replay_and_restart(
    spark, tmp_path
):
    """The foreachBatch warehouse sink is idempotent: (1) a crash-replay
    of an already-committed batch (foreachBatch's at-least-once contract)
    appends nothing, because the batch watermark committed ATOMICALLY
    with the data; (2) restarting the checkpointed query over new
    backlog ingests only the new files; (3) appends accumulate immutable
    segments — earlier segment dirs are untouched on disk."""
    from duckdb_nsql_spark.sources.warehouse import DurableWarehouse
    from duckdb_nsql_spark.streaming import sink as sk
    from duckdb_nsql_spark.streaming import windows as sw

    src = tmp_path / "src"
    src.mkdir()

    def write_file(n: int, ids: range) -> None:
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(list(ids), pa.int64()),
                    "ts": pa.array(
                        [
                            dt.datetime(2024, 1, 1, 0, i % 60)
                            for i in ids
                        ],
                        pa.timestamp("us"),
                    ),
                    "value": pa.array([float(i) for i in ids]),
                }
            ),
            str(src / f"part-{n}.parquet"),
        )

    write_file(0, range(0, 10))
    write_file(1, range(10, 30))

    wh = DurableWarehouse(str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return sk.stream_to_table(
            spark, wh, stream, "ingest", ckpt, stream_id="s1"
        )

    q = start()
    q.awaitTermination(120)
    df = wh.load_df(spark, "ingest")
    assert df.count() == 30
    ent = wh.tables()["ingest"]
    segs1 = list(ent["version"])
    assert len(segs1) == 2  # one immutable segment per micro-batch
    wm1 = ent["meta"]["stream_wm"]["s1"]

    # (1) crash replay: re-deliver the LAST batch manually (what Spark
    # does after dying between sink commit and checkpoint write)
    replay = wh.load_df(spark, "ingest").limit(5)
    # rebuild the processor exactly as stream_to_table wires it
    ent_before = wh.tables()["ingest"]

    def _process(batch_df, batch_id):
        e = wh.tables().get("ingest")
        meta = dict((e or {}).get("meta") or {})
        wm = dict(meta.get("stream_wm") or {})
        if batch_id <= wm.get("s1", -1):
            return
        wm["s1"] = batch_id
        meta["stream_wm"] = wm
        wh.append_table(spark, "ingest", batch_df, meta)

    _process(replay, wm1)  # replayed batch id == committed watermark
    assert wh.load_df(spark, "ingest").count() == 30  # nothing appended
    assert wh.tables()["ingest"] == ent_before

    # (2) restart over NEW backlog: only the new file ingests
    write_file(2, range(30, 37))
    q2 = start()
    q2.awaitTermination(120)
    df2 = wh.load_df(spark, "ingest")
    assert df2.count() == 37
    assert [r[0] for r in df2.agg(F.sum("event_id")).collect()] == [
        sum(range(37))
    ]
    segs2 = list(wh.tables()["ingest"]["version"])
    # (3) earlier segments are untouched prefixes of the new list
    assert segs2[: len(segs1)] == segs1
    assert len(segs2) == 3


def test_cdc_upsert_sink_latest_per_key_and_replay(spark, tmp_path):
    """The CDC upsert sink keeps the globally-latest row per key across
    micro-batches (batch-size independent), skips replayed batches, and
    a restart over new backlog merges only the new rows."""
    from duckdb_nsql_spark.sources.warehouse import DurableWarehouse
    from duckdb_nsql_spark.streaming import sink as sk

    src = tmp_path / "src"
    src.mkdir()

    def write_file(n, rows):  # rows: (key, seq, val)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([r[0] for r in rows], pa.int64()),
                    "seq": pa.array([r[1] for r in rows], pa.int64()),
                    "v": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            str(src / f"part-{n}.parquet"),
        )

    # batch 0 carries a NEWER seq for key 1 than batch 1 does: the
    # final row for key 1 must come from batch 0 (global latest, not
    # last-batch-wins)
    write_file(0, [(1, 10, "a10"), (2, 1, "b1")])
    write_file(1, [(1, 5, "a5"), (3, 2, "c2")])

    wh = DurableWarehouse(str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema("k long, seq long, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return sk.stream_upsert_to_table(
            spark, wh, stream, "t", ["k"], "seq", ckpt, stream_id="s1"
        )

    start().awaitTermination(120)
    rows = {
        r["k"]: (r["seq"], r["v"])
        for r in wh.load_df(spark, "t").collect()
    }
    assert rows == {1: (10, "a10"), 2: (1, "b1"), 3: (2, "c2")}

    # crash replay of the last committed batch: no change
    ent_before = wh.tables()["t"]
    wm = ent_before["meta"]["stream_wm"]["s1"]
    replay = wh.load_df(spark, "t")

    def _process(batch_df, batch_id):
        e = wh.tables().get("t")
        meta = dict((e or {}).get("meta") or {})
        w = dict(meta.get("stream_wm") or {})
        if batch_id <= w.get("s1", -1):
            return
        raise AssertionError("replayed batch was not skipped")

    _process(replay, wm)
    assert wh.tables()["t"] == ent_before

    # restart over new backlog: key 2 updated, key 4 added
    write_file(2, [(2, 9, "b9"), (4, 1, "d1")])
    start().awaitTermination(120)
    rows = {
        r["k"]: (r["seq"], r["v"])
        for r in wh.load_df(spark, "t").collect()
    }
    assert rows == {
        1: (10, "a10"),
        2: (9, "b9"),
        3: (2, "c2"),
        4: (1, "d1"),
    }


def test_stream_sample_replay_stable_and_batch_identical(spark, sf_dir):
    """Deterministic streaming sampler: two independent drains of the
    same backlog keep EXACTLY the same rows (replay/retry stability —
    the exactly-once property rand() sampling lacks), and the kept set
    equals the batch filter twin."""
    import os

    from pyspark.sql import functions as F

    from duckdb_nsql_spark.operators.sampling import hash_bucket
    from duckdb_nsql_spark.streaming import dedup as sd

    path = os.path.join(sf_dir, "documents.parquet")

    def drain(tag):
        docs = sd.read_documents_stream(spark, path)
        out = sd.sample_stream(docs, rate=0.2).select("doc_id")
        return {
            r["doc_id"]
            for r in sd.run_available_now(
                out, spark, f"ssample_{tag}"
            ).collect()
        }

    a, b = drain("a"), drain("b")
    assert a == b and 0 < len(a)
    batch = {
        r["doc_id"]
        for r in spark.read.parquet(path)
        .filter(hash_bucket(F.col("doc_id"), 10_000, "ssample:") < 2000)
        .select("doc_id")
        .collect()
    }
    assert a == batch
    total = spark.read.parquet(path).count()
    assert 0.1 < len(a) / total < 0.3  # ~20% rate, md5-uniform


def test_stream_hll_state_bounded_and_batch_identical(spark, sf_dir):
    """Streaming HLL: the register table is bounded at |langs| x 64
    regardless of stream length, and the finalized estimate equals the
    batch sketch over the same corpus even when every document arrives
    twice (duplication-insensitivity of register max)."""
    import os

    from duckdb_nsql_spark.operators import sketches
    from duckdb_nsql_spark.streaming import dedup as sd

    path = os.path.join(sf_dir, "documents.parquet")
    doubled = sd.read_documents_stream(spark, path).unionAll(
        sd.read_documents_stream(spark, path)
    )
    regs = sd.hll_register_stream(doubled)
    reg_table = sd.run_available_now(
        regs, spark, "stream_hll_sem", output_mode="complete"
    )
    n_langs = spark.read.parquet(path).select("lang").distinct().count()
    assert reg_table.count() <= n_langs * sketches.HLL_M

    stream_est = {
        r["lang"]: r["hll_estimate"]
        for r in sketches.hll_finalize(reg_table, "lang").collect()
    }
    batch = {
        r["lang"]: r["hll_estimate"]
        for r in sketches.hll_distinct(spark.read.parquet(path)).collect()
    }
    assert stream_est == batch
