"""Skew-handling primitives: salting for hot keys.

AQE's skew-join split handles sort-merge joins automatically; salting is
the explicit tool for (a) skewed *aggregations* (a hot group overwhelms
one reducer) and (b) broadcast-infeasible joins with a few hot keys.
Both utilities keep results exactly equal to their unsalted equivalents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_key_report(df: DataFrame, key: str, table_name: str) -> DataFrame:
    """One-row key-concentration report for ``df[key]``: row/key
    counts, hottest-key share, top-10 share. One aggregate over the
    table; the top-10 sum is tie-insensitive (equal counts sum equally).
    The measurement is ROLE-AGNOSTIC — the same concentration numbers
    drive the layout decision whether ``key`` is a join key or a
    GROUP BY key (a hot aggregation key overwhelms one reducer exactly
    like a hot join key does; a uniform fact-scale one earns CLUSTER BY
    either way). This is the measurement half of the salt-or-cluster
    decision — :func:`recommend_layout` turns rows of it into the
    layout call."""
    counts = df.groupBy(key).agg(F.count("*").alias("c"))
    top10 = counts.orderBy(F.col("c").desc(), F.col(key)).limit(10)
    stats = counts.agg(
        F.sum("c").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("c").alias("top1"),
    )
    t10 = top10.agg(F.sum("c").alias("top10"))
    return stats.crossJoin(t10).select(
        F.lit(table_name).alias("table_name"),
        F.lit(key).alias("key_name"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.round(F.col("top1") / F.col("n_rows"), 6).alias("top1_share"),
        F.round(F.col("top10") / F.col("n_rows"), 6).alias("top10_share"),
    )


def recommend_layout(
    report: DataFrame,
    salt_ratio: float = 8.0,
    salt_min_share: float = 0.001,
    cluster_min_rows: int = 10_000_000,
    cluster_min_keys: int = 10_000,
) -> DataFrame:
    """Turn key-skew measurements into an EXECUTABLE layout call —
    the decision procedure behind the q13 CLUSTER BY mitigation and the
    salted-join path, so the 100 TB choice is derived from data, not
    prose. Applies to JOIN keys, GROUP BY keys, and WINDOW PARTITION BY
    keys alike: a table bucketed at rest on its hot key runs
    exchange-free (the scan reports HashPartitioning(key), which
    satisfies the aggregate's/window's ClusteredDistribution — the
    q3/B3 1.5 M-group shape loses its only exchange, and a
    running-sum window over 1.5 M customers measured 1.65 -> 0.86 s at
    sf10), the same way it deletes a join's shuffle.
    Input rows are :func:`join_key_report` output; adds:

    - ``skew_ratio`` = top1_share × n_keys: the hottest key's multiple
      of a perfectly uniform key's share (1.0 = uniform).
    - ``recommendation``:
      * ``salt`` — the hot key is both RELATIVELY heavy (skew_ratio ≥
        ``salt_ratio``: one reducer gets ≥8× its fair share, the
        straggler regime AQE's skew split and explicit salting exist
        for) and ABSOLUTELY heavy (top1_share ≥ ``salt_min_share``:
        at 100 TB, 0.1% of the table in one key is a fat reducer
        regardless of ratio). Route through salted_join /
        salted_aggregate, or rely on AQE skew-join for SMJ plans.
      * ``cluster`` — distribution is uniform, the table is
        fact-scale (n_rows ≥ ``cluster_min_rows``), AND the key is
        high-cardinality (n_keys ≥ ``cluster_min_keys``):
        pre-clustering at rest on this key (CLUSTER BY ... INTO n
        BUCKETS) deletes the join exchange on every subsequent join AND
        the shuffle of any GROUP BY or WINDOW PARTITION BY on the key —
        the q13 fact⋈fact mitigation, the q3 hot-grouping-key one, and
        the high-NDV window one. The 10 M row default matches the
        MEASURED join crossover
        (BASELINE §8: the bucketed read costs more than the deleted
        exchange saves at 600 k and 6 M rows — 0.64 vs 0.38 s, 1.24 vs
        1.09 s — and wins at 60 M: 2.24 vs 3.06 s); below it, the plain
        shuffle or a broadcast is the faster plan on measured data.
        The key-cardinality floor is the round-12 q12 finding: a
        LOW-cardinality key leaves buckets empty and serializes the
        operator — the 25-nation window topk over a table bucketed on
        the 25-value key measured 1.96 s vs 0.39 s plain at sf10 (5×
        WORSE), while the 1.5 M-customer running-sum window measured
        0.86 s vs 1.65 s (1.9× better). Clustering needs n_keys far
        above any sane bucket count to balance; 10 k is a conservative
        floor.
      * ``none`` — small table or low-cardinality key: broadcast it or
        let a plain shuffle (with map-side WindowGroupLimit / partial
        aggregation) handle it; neither salting nor a bucketed layout
        pays.

    A pure projection over the (tiny) report — no data-sized work.
    """
    skewr = F.round(F.col("top1_share") * F.col("n_keys"), 3)
    rec = (
        F.when(
            (skewr >= salt_ratio) & (F.col("top1_share") >= salt_min_share),
            F.lit("salt"),
        )
        .when(
            (F.col("n_rows") >= cluster_min_rows)
            & (F.col("n_keys") >= cluster_min_keys),
            F.lit("cluster"),
        )
        .otherwise(F.lit("none"))
    )
    return report.select(
        "table_name",
        "key_name",
        "n_rows",
        "n_keys",
        "top1_share",
        "top10_share",
        skewr.alias("skew_ratio"),
        rec.alias("recommendation"),
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs`` maps output column -> (input column, fn) where fn is one of
    sum/count/min/max. Stage 1 aggregates on (key, salt) — spreading a
    hot key over ``salt_buckets`` reducers — stage 2 merges partials on
    the key alone. For algebraic aggregates the result is identical to a
    single groupBy; the second shuffle moves only |keys|×|buckets| rows.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    stage1_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            stage1_aggs.append(F.count(col).alias(out))
        elif fn == "sum":
            stage1_aggs.append(F.sum(col).alias(out))
        elif fn == "min":
            stage1_aggs.append(F.min(col).alias(out))
        elif fn == "max":
            stage1_aggs.append(F.max(col).alias(out))
        else:
            raise ValueError(f"unsupported agg {fn!r} (not algebraic)")
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*stage1_aggs)
    merged = partial.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[aggs[out][1]])(out).alias(out)
            for out in aggs
        ]
    )
    return merged


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: list,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``hot_keys`` on the (large) left side are salted.

    Left rows with a hot key get a random salt in [0, buckets); the
    right side replicates its hot-key rows once per salt value, so
    every (key, salt) pair still meets its matches. Non-hot keys use
    salt 0 on both sides — no replication, no behavior change. Result
    is row-identical to the plain join for ``inner`` and ``left`` joins.

    ``right``/``full`` joins are rejected: an *unmatched* hot right row
    is replicated once per salt and each replica would emit its own
    null-extended output row, duplicating results. Swap the inputs and
    use a left join, or rely on AQE's skew-join handling instead.
    """
    if how.lower().replace("_", "") not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full outer would duplicate unmatched hot right rows "
            "(one per salt replica)"
        )
    hot = F.array(*[F.lit(k) for k in hot_keys])
    l_salted = left.withColumn(
        "__salt",
        F.when(
            F.array_contains(hot, F.col(key)),
            (F.rand(seed=42) * salt_buckets).cast("int"),
        ).otherwise(F.lit(0)),
    )
    r_salted = _replicate_hot(right, key, hot, salt_buckets)
    out = l_salted.join(r_salted, [key, "__salt"], how)
    return out.drop("__salt")


def _replicate_hot(df: DataFrame, key: str, hot: Column, salt_buckets: int) -> DataFrame:
    # explode inside when() is illegal — replicate via a generated salt array
    salts = F.when(
        F.array_contains(hot, F.col(key)),
        F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
    ).otherwise(F.array(F.lit(0)))
    return df.withColumn("__salt", F.explode(salts))
