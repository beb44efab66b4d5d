"""Skew-handling primitives: salting for hot keys.

AQE's skew-join split handles sort-merge joins automatically; salting is
the explicit tool for (a) skewed *aggregations* (a hot group overwhelms
one reducer) and (b) broadcast-infeasible joins with a few hot keys.
Both utilities keep results exactly equal to their unsalted equivalents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
