"""Exactly-once streaming ingest into a durable warehouse table.

Structured Streaming's ``foreachBatch`` is only AT-LEAST-once: after a
crash between sink write and checkpoint commit, the restarted query
replays the last micro-batch. The standard fix (Delta's ``txnAppId`` /
``txnVersion`` pattern) is an idempotent sink: the sink records the
highest ``batchId`` it has committed TRANSACTIONALLY WITH the data, and
silently skips any batch at or below that watermark.

Here the warehouse commit log provides the transaction: each micro-batch
appends one immutable parquet segment and CAS-commits a catalog entry
carrying both the new segment list and the updated
``meta["stream_wm"][stream_id] = batch_id`` watermark — one O_EXCL
commit file, so data and progress are atomic. Replayed batches are
detected from the committed watermark, never from checkpoint state.

Scale design: appends cost O(micro-batch) — existing table files are
never read or rewritten (``DurableWarehouse.append_table``); state is a
single integer per stream, not a seen-key set; a periodic ``save_table``
rewrite (or ``CALL compact``) collapses accumulated small segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..sources.warehouse import DurableWarehouse


def stream_to_table(
    spark: SparkSession,
    warehouse: DurableWarehouse,
    stream_df: DataFrame,
    table: str,
    checkpoint_dir: str,
    stream_id: str = "stream-1",
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming query that ingests ``stream_df`` into warehouse
    ``table`` with exactly-once batch semantics (idempotent foreachBatch
    keyed by the committed batch watermark)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ent = warehouse.tables().get(table)
        meta = dict((ent or {}).get("meta") or {})
        wm = dict(meta.get("stream_wm") or {})
        if batch_id <= wm.get(stream_id, -1):
            return  # replayed batch — already committed atomically
        wm[stream_id] = batch_id
        meta["stream_wm"] = wm
        # txn: on the parquet path the CAS commit is already atomic with
        # the data; on the delta path it keys Delta's idempotent writer
        # (txnAppId/txnVersion) so a crash between the Delta append and
        # the catalog commit cannot double-append on replay
        warehouse.append_table(
            spark, table, batch_df, meta, txn=(stream_id, batch_id)
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert_to_table(
    spark: SparkSession,
    warehouse: DurableWarehouse,
    stream_df: DataFrame,
    table: str,
    key_cols: list[str],
    order_col: str,
    checkpoint_dir: str,
    stream_id: str = "cdc-1",
    tiebreak_cols: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """CDC-style exactly-once UPSERT ingest: each micro-batch merges into
    the warehouse table keeping, per key, the row with the greatest
    ``order_col`` (then ``tiebreak_cols``) across EVERYTHING seen so far —
    so the final table is independent of how the source was micro-batched.

    Same idempotence contract as :func:`stream_to_table`: the batch
    watermark commits atomically with the merged data (one commit-log
    entry), so a replayed batch after a crash is skipped from committed
    state. The merge itself is :meth:`DurableWarehouse.upsert_table` —
    copy-on-write rewrite in parquet mode (the honest cost of upsert on
    immutable files), Delta's native transactional MERGE in delta mode
    (O(changed files), the cluster-scale path; contract-tested against
    the DeltaTable API in tests/test_delta_contract.py).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ent = warehouse.tables().get(table)
        meta = dict((ent or {}).get("meta") or {})
        wm = dict(meta.get("stream_wm") or {})
        if batch_id <= wm.get(stream_id, -1):
            return  # replayed batch — already merged atomically
        wm[stream_id] = batch_id
        meta["stream_wm"] = wm
        warehouse.upsert_table(
            spark,
            table,
            batch_df,
            key_cols,
            order_col,
            tiebreak_cols=tiebreak_cols,
            meta=meta,
            txn=(stream_id, batch_id),
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
