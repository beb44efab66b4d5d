"""Bucketed table layout: pre-shuffled, co-located fact-to-fact joins.

The reference engine (a single-node DuckDB binary) never needs this — a
hash join is always in-process. On a cluster the equivalent physical
property must live in the at-rest layout: two tables bucketed into the
same number of buckets on the join key hash-partition identically, so a
join between them needs NO exchange on either side — the single biggest
shuffle eliminated for a repeated fact⋈fact join (orders⋈lineitem at
100 TB is re-shuffled by every ad-hoc query otherwise).

Spark's bucketing ties to the session catalog (``bucketBy`` requires
``saveAsTable``); the files land under ``spark.sql.warehouse.dir``. At
production scale that is the object store and the bucket metadata lives
in the metastore — same API, same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    n_buckets: int = 64,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a parquet table bucketed (and per-file sorted) on
    ``keys``. Sorting per bucket file lets a later sort-merge join skip its
    Sort as well — the scan comes back both partitioned AND ordered.

    ``n_buckets`` sizes the parallelism of every downstream co-located
    join: pick ~(table size / 128MB) at scale, and the SAME number for
    every table that will join on these keys.
    """
    import os
    import shutil

    spark = df.sparkSession
    if mode == "overwrite":
        if spark.catalog.tableExists(name):
            # registered managed table: DROP removes both the catalog
            # entry and its files at the table's true location
            spark.sql(f"DROP TABLE {name}")
        elif "." not in name:
            # no catalog entry, but a previous PROCESS's files at the
            # default managed location would fail saveAsTable with
            # LOCATION_ALREADY_EXISTS. Clear only that orphaned default
            # path, only for unqualified names (a qualified or custom-
            # LOCATION table never lands at <warehouse>/<name>), and
            # only under overwrite — append must never delete data.
            wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            local = wh[len("file:"):] if wh.startswith("file:") else wh
            leftover = os.path.join(local, name.lower())
            if os.path.isdir(leftover):
                shutil.rmtree(leftover, ignore_errors=True)
    # ONE file per bucket: repartition on the bucket keys with exactly
    # n_buckets partitions. HashPartitioning's partition id and the
    # bucket id are the same expression (pmod(murmur3(keys), n)), so each
    # write task holds exactly one bucket's rows and emits one file.
    # Without this, every one of the W upstream tasks writes its own file
    # per bucket (W x n_buckets files): per-file open cost on every scan,
    # and Spark drops the per-file sortBy metadata when a bucket has more
    # than one file — downstream sort-merge joins re-sort both sides.
    # With it, scans report the bucket sort order and co-bucketed SMJs
    # plan with ZERO Sort and ZERO Exchange (guide §6 file sizing + §2.4).
    df = df.repartition(n_buckets, *keys)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(*(sort_by or keys))
    )
    writer.saveAsTable(name)
    return spark.table(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Scan of a bucketed table; the bucket spec rides along in the plan
    (``SELECT`` on it reports ``Bucketed: true`` in the formatted scan)."""
    return spark.table(name)


def colocated_join(
    left: DataFrame, right: DataFrame, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys.

    This is an ordinary ``join`` — the point is what Catalyst does with
    it: both scans already satisfy the join's required distribution, so
    the plan contains no Exchange (asserted by tests/test_plans.py).
    Broadcast would defeat the purpose for fact⋈fact sizes, so call this
    with fact tables; dimension joins should keep broadcasting.
    """
    return left.join(right, on=on, how=how)
