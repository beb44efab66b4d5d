"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running statistics maintained in explicit group state — the
pattern for operators Structured Streaming's built-in aggs can't express
(custom eviction, EMA decay, session stitching across restarts). State is
per-key and bounded; the shuffle key is user_id, so scale-out is the
standard keyed-state story (state store per partition, checkpointed).

When a finite file-source stream is drained in one availableNow pass, the
emitted per-user rows equal the batch groupBy aggregate — which is what
makes this operator oracle-checkable in the driver's correctness gate.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total double, ema double"
STATE_SCHEMA = "n bigint, total double, ema double"

EMA_ALPHA = 0.1


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, ema = state.get
    else:
        n, total, ema = 0, 0.0, None
    for pdf in pdfs:
        vals = pdf["value"].astype(float)
        n += len(vals)
        total += float(vals.sum())
        for v in vals:
            ema = v if ema is None else (EMA_ALPHA * v + (1 - EMA_ALPHA) * ema)
    state.update((n, total, ema if ema is not None else 0.0))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total": [round(total, 4)],
            "ema": [round(ema or 0.0, 4)],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events stream -> per-user running (count, sum, EMA) with explicit
    keyed state. Update-mode output: one row per user per trigger."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
