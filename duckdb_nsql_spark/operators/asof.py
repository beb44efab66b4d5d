"""As-of and range joins — operators the reference's engine (DuckDB) has
natively but Spark lacks; composed from built-in ops (SURVEY §2.3 notes
these as free extensions; DuckDB's ASOF JOIN is the oracle).

asof_join uses the union-and-window trick: tag both sides, union on the
(key, ts) ordering, and carry the latest right-side values forward with
``last(ignorenulls)`` over a running window. One shuffle on the join key
(the same shuffle a sort-merge join would need), no per-key Python, no
point lookups — this is the scalable formulation for billions of rows,
and it is skew-safe in the same way a sort-merge join is.

range_join expands the left interval onto an integer bucket grid and
equi-joins on (key, bucket) before the precise range filter — turning a
cross product into a bounded fan-out join Catalyst can shuffle-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    prefilter_right: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' mirrors).

    Output: all left columns + right's non-key payload columns
    (null when no match) — matching DuckDB ``ASOF LEFT JOIN``.

    ``prefilter_right`` (default on) semi-joins the right side on the
    left's DISTINCT key domain before the union-window. This recovers
    the join-key constraint inference DuckDB's optimizer applies to a
    native ASOF JOIN (a filter on the left key implies the same filter
    on the right key), which the union formulation otherwise loses:
    right rows whose key never occurs on the left cannot match, so
    dropping them is result-neutral, and when the left key domain is
    selective it prunes the window's shuffle by orders of magnitude
    (the sf10 bench row: 10 M events -> ~33 k for 500 users; AQE
    broadcasts the tiny distinct-key build at runtime, so the filter
    is map-side — no extra shuffle of the right side). When the left
    domain covers most right keys the semi-join prunes nothing and AQE
    falls back to a shuffle semi-join — one extra exchange of the
    right side; pass ``prefilter_right=False`` for that full-domain
    shape.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    # A NULL join key never matches under SQL equality (DuckDB ASOF ON
    # l.k = r.k gives NULL-keyed left rows a NULL payload), but the
    # union-window formulation would otherwise group NULL-keyed rows of
    # BOTH sides into one window partition and carry right values into
    # left rows — caught by the round-11 NULL-key parity test. Dropping
    # NULL-keyed right rows is always result-neutral and restores the
    # equality semantics on the prefilter_right=False path too (the
    # semi-join was already dropping them on the default path).
    right = right.filter(F.col(key).isNotNull())
    if prefilter_right:
        right = right.join(
            left.select(F.col(key)).distinct(), on=key, how="left_semi"
        )
    payload = [c for c in right.columns if c not in (key, right_ts)]

    lhs = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    rhs = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = lhs.unionByName(rhs)

    if direction == "backward":
        # right rows sort before left rows at equal ts (<= semantics)
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = {c: F.last(f"__r_{c}", ignorenulls=True).over(w) for c in payload}
        fill["__matched_ts"] = F.last("__r_ts", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = {c: F.last(f"__r_{c}", ignorenulls=True).over(w) for c in payload}
        fill["__matched_ts"] = F.last("__r_ts", ignorenulls=True).over(w)

    filled = unioned.select(
        "__is_left",
        "__lrow",
        *[v.alias(k) for k, v in fill.items()],
    ).filter(F.col("__is_left") == 1)
    return filled.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(c).alias(f"{c}_right") if c in left.columns else F.col(c) for c in payload],
        F.col("__matched_ts").alias(f"{right_ts}_matched"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str | None,
    left_lo: str,
    left_hi: str,
    right_val: str,
    bucket_width: float,
) -> DataFrame:
    """Join right rows whose ``right_val`` falls in [left_lo, left_hi].

    Each left interval explodes into ceil(width/bucket_width)+1 buckets;
    the equi-join on (key, bucket) bounds the match fan-out, then the
    exact predicate filters. bucket_width should be ~ the typical
    interval width so fan-out stays small.
    """
    lo_b = (F.col(left_lo) / bucket_width).cast("long")
    hi_b = (F.col(left_hi) / bucket_width).cast("long")
    l = left.withColumn("__b", F.explode(F.sequence(lo_b, hi_b)))
    r = right.withColumn("__b", (F.col(right_val) / bucket_width).cast("long"))
    on = [l["__b"] == r["__b"]]
    if key:
        on.append(l[key] == r[key])
    joined = l.join(r, on[0] if len(on) == 1 else on[0] & on[1])
    return (
        joined.filter(
            (r[right_val] >= l[left_lo]) & (r[right_val] <= l[left_hi])
        )
        .drop(l["__b"])
        .drop(r["__b"])
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a user's events split
    into sessions wherever consecutive events are more than
    ``gap_minutes`` apart — the batch twin of the streaming
    session-window aggregate (streaming/windows.session_agg), used to
    sessionize historical backlogs with the same gap rule.

    Classic two-window algebra, both keyed by the user (NO global
    window): lag() marks gap starts, a running sum of the markers
    numbers the sessions, then one aggregate keyed by (user, session).
    Scale: two shuffles on user_id (the second reuses the first's
    partitioning — same key), output bounded by |sessions|. Ties on the
    timestamp order deterministically by ``tiebreak_col``.
    """
    # integer MICROSECONDS throughout (unix_micros / DuckDB epoch_us):
    # unix_timestamp() truncates sub-second fractions, so a 1800.4 s gap
    # would read 1800 and merge sessions an exact engine must split
    w = Window.partitionBy(user_col).orderBy(time_col, tiebreak_col)
    # NTZ -> LTZ cast only for the micros arithmetic (unix_micros takes
    # TIMESTAMP): gaps and durations are DIFFERENCES, so the zone
    # offset cancels whatever the session timezone; emitted
    # session_start/end keep the source column's type untouched.
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(
        prev_us.isNull() | (us - prev_us > gap_minutes * 60 * 1_000_000),
        1,
    ).otherwise(0)
    marked = events.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(w).cast("int")
    )
    return (
        marked.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.min(time_col).alias("session_start"),
            F.max(time_col).alias("session_end"),
            (
                F.unix_micros(F.max(time_col).cast("timestamp"))
                - F.unix_micros(F.min(time_col).cast("timestamp"))
            )
            .cast("bigint")
            .alias("duration_us"),
        )
    )
