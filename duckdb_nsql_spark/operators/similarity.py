"""Similarity search over an embedding column (ARRAY<FLOAT>).

- brute_force_topk: exact cosine top-k. One map over the table + a
  TakeOrderedAndProject — the correct baseline at any scale (top-k is
  per-partition then merged on the driver; no global sort materialized).
- lsh_partition / lsh_topk: random-hyperplane LSH bucketing — the scale
  path. Buckets are computed with deterministic seeded hyperplanes so
  repeated runs (and tests) agree; query probes its own bucket plus
  optional multi-probe neighbors, turning a full scan into a
  partition-pruned scan when the table is written partitioned by bucket.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def dec_quantize(vec: Column) -> Column:
    """Quantize vector elements to DECIMAL(12,6) — the first step of the
    bit-exact cosine discipline (see dec_cosine)."""
    return F.transform(vec, lambda x: x.cast("double").cast("decimal(12,6)"))


def _dec_sum(arr: Column) -> Column:
    from decimal import Decimal

    return F.aggregate(
        arr,
        F.lit(Decimal(0)).cast("decimal(38,12)"),
        # re-cast per step: (38,12)+(25,12) would widen past 38 and
        # shave scale; the cast back is exact at these magnitudes
        lambda acc, x: (acc + x).cast("decimal(38,12)"),
    ).cast("double")


def dec_cosine(aq: Column, bq: Column) -> Column:
    """Bit-exact 4-dp cosine over dec_quantize'd vectors: dot and squared
    norms are EXACT decimal sums (order-independent — the semantic_dedup
    discipline), so round(dot/(√na·√nb), 4) is computed from identical
    doubles on every engine and a half-way rounding boundary can never
    split Spark from a DuckDB oracle replay."""
    dot = _dec_sum(F.zip_with(aq, bq, lambda x, y: x * y))
    na2 = _dec_sum(F.transform(aq, lambda x: x * x))
    nb2 = _dec_sum(F.transform(bq, lambda x: x * x))
    return F.round(dot / (F.sqrt(na2) * F.sqrt(nb2)), 4)


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector is a plan literal (broadcast by construction);
    ordering ties break on id so results are deterministic.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def _hyperplane(seed: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (splitmix64-style mix);
    reproducible across runs/engines without any RNG state."""
    vals = []
    for d in range(dim):
        x = (seed * 0x9E3779B97F4A7C15 + plane * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        # map to (-1, 1)
        vals.append((x / 2**63) - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_bucket(
    vec: Column, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """Random-hyperplane LSH bucket id in [0, 2^n_planes)."""
    out = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(seed, p, dim)])
        bit = F.when(_dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        out = out + (bit * F.lit(1 << p))
    return out


def lsh_partition(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Assign every vector its LSH bucket. At 100 TB this column is the
    table's partition key (``write.partitionBy('bucket')``), making
    queries partition-pruned scans of ~1/2^n_planes of the data."""
    return df.withColumn("bucket", lsh_bucket(F.col(vec_col), dim, n_planes, seed))


def _probe_buckets(query_vec: list[float], n_planes: int, seed: int, multiprobe: int) -> list[int]:
    dim = len(query_vec)
    bits = []
    for p in range(n_planes):
        plane = _hyperplane(seed, p, dim)
        bits.append(1 if sum(a * b for a, b in zip(query_vec, plane)) >= 0 else 0)
    base = sum(b << i for i, b in enumerate(bits))
    buckets = [base]
    if multiprobe > 0:
        # probe hamming-1 neighbors (flip each bit) — standard multi-probe
        buckets += [base ^ (1 << i) for i in range(min(multiprobe, n_planes))]
    return buckets


def ivf_centroids(
    df: DataFrame,
    dim: int,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic mini-kmeans for IVF coarse quantization.

    Init = the first ``k`` vectors by id (deterministic, no RNG); each
    Lloyd iteration is a distributed assign (map) + per-centroid/dim mean
    (one shuffle of k×dim partial sums); only the k×dim centroid matrix
    ever reaches the driver — the pattern scales to any table size.
    """
    from pyspark.sql import functions as F

    cents = [
        list(r[vec_col])
        for r in df.orderBy(id_col).limit(k).select(vec_col).collect()
    ]
    for _ in range(iters):
        assigned = df.select(
            F.col(vec_col).alias("v"),
            _nearest_centroid(F.col(vec_col), cents).alias("c"),
        )
        sums = (
            assigned.select("c", F.posexplode("v").alias("pos", "val"))
            .groupBy("c", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = [[0.0] * dim for _ in range(len(cents))]
        counts = [0] * len(cents)
        for r in sums:
            new[r["c"]][r["pos"]] = r["s"] / r["n"]
            counts[r["c"]] = r["n"]
        cents = [
            new[i] if counts[i] else cents[i] for i in range(len(cents))
        ]
    return cents


def _nearest_centroid(vec, cents: list[list[float]]):
    from pyspark.sql import functions as F

    best_idx = F.lit(0)
    best_d = _sqdist(vec, cents[0])
    for i, c in enumerate(cents[1:], start=1):
        d = _sqdist(vec, c)
        cond = d < best_d
        best_idx = F.when(cond, F.lit(i)).otherwise(best_idx)
        best_d = F.when(cond, d).otherwise(best_d)
    return best_idx


def _sqdist(vec, cent: list[float]):
    from pyspark.sql import functions as F

    c = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: score only vectors whose nearest centroid is among the
    query's ``nprobe`` closest centroids. With the table written
    partitioned by centroid id, this is a partition-pruned scan."""
    from pyspark.sql import functions as F

    def dist(c):
        return sum((a - b) ** 2 for a, b in zip(query_vec, c))

    probes = sorted(range(len(centroids)), key=lambda i: dist(centroids[i]))[:nprobe]
    assigned = df.withColumn(
        "__cent", _nearest_centroid(F.col(vec_col), centroids)
    )
    cand = assigned.filter(F.col("__cent").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def write_lsh_index(
    df: DataFrame,
    path: str,
    dim: int,
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 6,
    seed: int = 42,
) -> None:
    """Materialize the multi-table LSH index AT REST: one partitioned
    copy of the table per hash table (``<path>/table_<t>/bucket=<b>/``),
    the standard LSH-forest layout.

    A single copy with L bucket columns cannot help at scale — the query
    predicate is an OR across tables, which defeats partition pruning.
    L copies cost L× storage but turn every probe into a TRUE
    partition-pruned scan: the query touches ~L·(1+multiprobe)/2^planes
    of the data and nothing else (plan-asserted in tests). Write once,
    query forever — the right trade for a read-mostly 100 TB corpus.
    """
    for t in range(n_tables):
        st = seed + 7919 * t
        (
            df.withColumn("bucket", lsh_bucket(F.col(vec_col), dim, n_planes, st))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{path}/table_{t}")
        )


def lsh_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    n_tables: int = 6,
    seed: int = 42,
    multiprobe: int = 3,
) -> DataFrame:
    """Approximate top-k over a :func:`write_lsh_index` layout.

    Each hash table contributes only its probe partitions (partition
    pruning does the skipping — no full scan anywhere); candidates union,
    dedup on id, then exact cosine top-k. Same hyperplanes as
    :func:`lsh_topk`, so the candidate set matches the in-memory
    multi-table scan exactly.
    """
    cand = None
    for t in range(n_tables):
        st = seed + 7919 * t
        probes = _probe_buckets(query_vec, n_planes, st, multiprobe)
        part = spark.read.parquet(f"{path}/table_{t}").filter(
            F.col("bucket").isin(probes)
        )
        cand = part if cand is None else cand.unionByName(part)
    dedup = cand.dropDuplicates([id_col]).drop("bucket")
    return brute_force_topk(dedup, query_vec, k, vec_col, id_col)


def write_ivf_index(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF coarse index AT REST: the table partitioned by
    nearest-centroid id (``<path>/cent=<c>/``). One copy (unlike the LSH
    forest) — IVF probes are a plain IN-list over one partition column,
    so a single partitioned layout prunes perfectly."""
    (
        df.withColumn("cent", _nearest_centroid(F.col(vec_col), centroids))
        .write.mode("overwrite")
        .partitionBy("cent")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search over a :func:`write_ivf_index` layout: reads ONLY the
    ``nprobe`` nearest-centroid partitions (partition pruning, no full
    scan), then exact cosine top-k over the candidates."""

    def dist(c):
        return sum((a - b) ** 2 for a, b in zip(query_vec, c))

    probes = sorted(range(len(centroids)), key=lambda i: dist(centroids[i]))[:nprobe]
    cand = spark.read.parquet(path).filter(F.col("cent").isin(probes))
    return brute_force_topk(cand.drop("cent"), query_vec, k, vec_col, id_col)


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 42,
    multiprobe: int = 3,
    n_tables: int = 6,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    Single-table LSH caps recall when true neighbors sit at wide angles
    (cosine ~0.3 → each plane disagrees with p≈0.4), so this runs ``L =
    n_tables`` independent hash tables (re-seeded hyperplanes) and takes
    the union of their probe buckets — the standard LSH-forest recall
    fix. The union is ONE OR-of-memberships predicate, so the plan stays
    a single map-only scan with no shuffle or self-union; at rest, store
    the L bucket columns and partition by table-0's bucket (partition
    prunes table 0; the other memberships evaluate as cheap codegen'd
    filters or data-skipping stats).
    """
    dim = len(query_vec)
    cond = None
    for t in range(n_tables):
        st = seed + 7919 * t
        bucket = lsh_bucket(F.col(vec_col), dim, n_planes, st)
        probes = _probe_buckets(query_vec, n_planes, st, multiprobe)
        member = bucket.isin(probes)
        cond = member if cond is None else (cond | member)
    candidates = df.filter(cond)
    return brute_force_topk(candidates, query_vec, k, vec_col, id_col)


def brute_force_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of query vectors — the serving /
    eval-set shape (thousands of queries against one corpus).

    Plan: broadcast the (small) query set, one corpus scan scores every
    (query, candidate) pair, then a per-query window top-k. The corpus
    is read ONCE regardless of query count — the property that matters
    when the corpus is 100 TB and the query batch is kilobytes. Skewed
    query batches don't exist by construction (every query scores every
    row); the window partitions on query_id, cardinality = |queries|.
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.col(query_vec_col).alias("__qvec"),
        )
    )
    scored = df.crossJoin(q).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    w = (
        Window.partitionBy(query_id_col)
        .orderBy(F.desc("cosine"), F.col(id_col))
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column —
    the standard 4x storage/bandwidth shrink before building an ANN
    index over a trillion-vector corpus (scale = max|v|/127, q_i =
    round(v_i/scale)).

    Emits per-vector audit metrics rather than the (opaque) quantized
    array so the operator is hash-checkable cross-engine: the quantized
    integer aggregates (sum/min/max) are EXACT in both engines, and the
    reconstruction error folds left-to-right within one row so the
    double arithmetic is bit-identical. Map-only, zero shuffles; all
    arithmetic is promoted to double before any op so float32 reads
    agree across engines.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = df.select(id_col, v.alias("__v"))
    scale = F.greatest(
        F.array_max(F.transform(F.col("__v"), F.abs)) / F.lit(127.0),
        F.lit(1e-12),
    )
    df = df.withColumn("__s", scale).withColumn(
        "__q",
        F.transform(
            F.col("__v"), lambda x: F.round(x / F.col("__s")).cast("int")
        ),
    )
    err2 = F.aggregate(
        F.zip_with(
            F.col("__v"),
            F.col("__q"),
            lambda a, b: (a - b.cast("double") * F.col("__s"))
            * (a - b.cast("double") * F.col("__s")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.select(
        id_col,
        F.round(F.col("__s"), 8).alias("scale_r"),
        F.aggregate(
            F.col("__q"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).cast("int").alias("q_sum"),
        F.array_min(F.col("__q")).cast("int").alias("q_min"),
        F.array_max(F.col("__q")).cast("int").alias("q_max"),
        F.round(
            F.sqrt(err2 / F.size(F.col("__v"))), 8
        ).alias("err_rms"),
    )


def pq_quantize(
    df: DataFrame,
    m_sub: int = 4,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product quantization (Jégou et al., "Product Quantization for
    Nearest Neighbor Search"): split each vector into ``m_sub``
    subvectors and k-means-quantize each subspace independently; a
    vector compresses to ``m_sub`` small codes (here 4×3 bits instead
    of 64 floats) — the codebook trick under IVF-PQ indexes at
    billion-vector scale. Returns ``(vec_id, code_str, err)`` — the
    per-subspace code word joined '-' and the total squared
    reconstruction error against the learned codebooks.

    Deterministic and oracle-replayable with the same contract as
    :func:`~..dedup.semantic_dedup`'s k-means: seeds are the first
    ``k`` vectors by ``(md5(vec_id), vec_id)`` order (each seed sliced
    per subspace), Lloyd iterations are FIXED, assignment distances are
    exact DECIMAL over 6-dp-quantized vectors (ties -> lower code),
    centroid means re-quantize to DECIMAL(12,6). ``err`` is the exact
    DECIMAL distance cast to DOUBLE — no intermediate float rounding.

    Scale shape: assignment is map-only against m_sub×k×sub_dim literal
    centroids; each Lloyd update is ONE bounded (subspace, code, dim)
    partial-sum shuffle collecting m_sub×k×sub_dim rows regardless of
    corpus size; the output is one map-only pass. A production variant
    trains the codebook on a sample and broadcasts it — same algebra.
    """
    from decimal import Decimal

    DEC = "decimal(12,6)"
    e = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col), lambda x: x.cast("double").cast(DEC)
        ).alias("vq"),
    )
    from .dedup import _persist_small

    e = _persist_small(e)
    seed_rows = (
        e.select("vec_id", "vq")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(k)
        .collect()
    )
    dim = len(seed_rows[0]["vq"])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible into {m_sub} subspaces")
    sd = dim // m_sub
    # cents[(s, cid)] = sub_dim decimals
    cents: dict[tuple[int, int], list] = {
        (s, i): list(r["vq"])[s * sd : (s + 1) * sd]
        for i, r in enumerate(seed_rows)
        for s in range(m_sub)
    }

    def assign(cent_map: dict[tuple[int, int], list]) -> DataFrame:
        """Map-only per-subspace nearest-code assignment; exact-decimal
        distances, argmin via struct array_min (ties -> lower code)."""
        cols = []
        for s in range(m_sub):
            sub = F.slice(F.col("vq"), s * sd + 1, sd)
            cands = []
            for (cs, cid), cv in sorted(cent_map.items()):
                if cs != s:
                    continue
                cq = F.array(*[F.lit(x).cast(DEC) for x in cv])
                dist = F.aggregate(
                    F.zip_with(sub, cq, lambda x, y: (x - y) * (x - y)),
                    F.lit(Decimal(0)).cast("decimal(38,12)"),
                    lambda acc, x: (acc + x).cast("decimal(38,12)"),
                )
                cands.append(
                    F.struct(dist.alias("d"), F.lit(cid).alias("cid"))
                )
            best = F.array_min(F.array(*cands))
            cols.append(best.alias(f"__b{s}"))
        return e.select("vec_id", "vq", *cols)

    assigned = assign(cents)
    for _ in range(iters - 1):
        upd = (
            assigned.select(
                *[F.col(f"__b{s}")["cid"].alias(f"__c{s}")
                  for s in range(m_sub)],
                F.posexplode("vq").alias("dim", "x"),
            )
            .select(
                (F.col("dim") / sd).cast("int").alias("s"),
                F.coalesce(
                    *[F.when(
                        (F.col("dim") / sd).cast("int") == s,
                        F.col(f"__c{s}"),
                    ) for s in range(m_sub)]
                ).alias("cid"),
                (F.col("dim") % sd).alias("ld"),
                F.col("x"),
            )
            .groupBy("s", "cid", "ld")
            .agg(
                (F.sum("x").cast("double") / F.count(F.lit(1)))
                .cast(DEC)
                .alias("m")
            )
            .collect()
        )
        by_key: dict[tuple[int, int], dict[int, object]] = {}
        for r in upd:
            by_key.setdefault((int(r["s"]), int(r["cid"])), {})[
                int(r["ld"])
            ] = r["m"]
        cents = {
            key: [lds[i] for i in range(sd)] for key, lds in by_key.items()
        }
        assigned = assign(cents)

    code_str = F.concat_ws(
        "-", *[F.col(f"__b{s}")["cid"].cast("string") for s in range(m_sub)]
    )
    err = F.lit(Decimal(0)).cast("decimal(38,12)")
    for s in range(m_sub):
        err = (err + F.col(f"__b{s}")["d"]).cast("decimal(38,12)")
    return assigned.select(
        "vec_id",
        code_str.alias("code_str"),
        err.cast("double").alias("err"),
    )


def pq_codebooks(
    df: DataFrame,
    dim: int,
    m_sub: int = 4,
    k: int = 8,
    iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Per-subspace PQ codebooks via the same deterministic mini-kmeans
    as :func:`ivf_centroids` (init = first ``k`` vectors by id, each
    sliced per subspace; fixed Lloyd iterations; only m_sub×k×sub_dim
    floats ever reach the driver). Returns ``books[s][cid][local_dim]``."""
    from pyspark.sql import functions as F

    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible into {m_sub} subspaces")
    sd = dim // m_sub
    seeds = [
        list(r[vec_col])
        for r in df.orderBy(id_col).limit(k).select(vec_col).collect()
    ]
    books = [
        [seeds[c][s * sd : (s + 1) * sd] for c in range(k)]
        for s in range(m_sub)
    ]
    for _ in range(iters):
        codes = df.select(
            F.col(vec_col).alias("v"),
            *[
                _nearest_centroid(
                    F.slice(F.col(vec_col), s * sd + 1, sd), books[s]
                ).alias(f"__c{s}")
                for s in range(m_sub)
            ],
        )
        sums = (
            codes.select(
                *[F.col(f"__c{s}") for s in range(m_sub)],
                F.posexplode("v").alias("pos", "val"),
            )
            .select(
                (F.col("pos") / sd).cast("int").alias("s"),
                F.coalesce(
                    *[F.when(
                        (F.col("pos") / sd).cast("int") == s,
                        F.col(f"__c{s}"),
                    ) for s in range(m_sub)]
                ).alias("cid"),
                (F.col("pos") % sd).alias("ld"),
                F.col("val"),
            )
            .groupBy("s", "cid", "ld")
            .agg(F.sum("val").alias("sv"), F.count("*").alias("n"))
            .collect()
        )
        for r in sums:
            books[int(r["s"])][int(r["cid"])][int(r["ld"])] = (
                r["sv"] / r["n"]
            )
    return books


def ivfpq_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    books: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    refine: int = 30,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ search (Jégou et al.) — the billion-vector composition:
    (1) IVF coarse quantizer prunes to the query's ``nprobe`` nearest
    cells (a partition-pruned scan over an at-rest layout); (2) PQ
    asymmetric-distance lookup scores every candidate with m_sub ARRAY
    LOOKUPS instead of a dim-length float loop — the per-subspace
    query→code distances are a tiny driver-computed literal table;
    (3) the ``refine`` best by PQ distance re-rank with exact cosine.
    Map-only until the final top-k; no shuffle touches the corpus.
    """
    from pyspark.sql import functions as F

    m_sub = len(books)
    sd = len(books[0][0])

    def dist(c):
        return sum((a - b) ** 2 for a, b in zip(query_vec, c))

    probes = sorted(
        range(len(centroids)), key=lambda i: dist(centroids[i])
    )[:nprobe]
    cand = df.withColumn(
        "__cent", _nearest_centroid(F.col(vec_col), centroids)
    ).filter(F.col("__cent").isin(probes))
    # asymmetric distance: LUT[s][cid] = ||query_sub_s - book[s][cid]||^2
    approx = F.lit(0.0)
    for s in range(m_sub):
        qs = query_vec[s * sd : (s + 1) * sd]
        lut = [
            sum((a - b) ** 2 for a, b in zip(qs, books[s][c]))
            for c in range(len(books[s]))
        ]
        code = _nearest_centroid(
            F.slice(F.col(vec_col), s * sd + 1, sd), books[s]
        )
        approx = approx + F.element_at(
            F.array(*[F.lit(float(x)) for x in lut]), code + 1
        )
    shortlist = (
        cand.withColumn("__adc", approx)
        .orderBy(F.col("__adc").asc(), F.col(id_col))
        .limit(refine)
    )
    return brute_force_topk(shortlist, query_vec, k, vec_col, id_col)


def knn_graph(
    df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
) -> DataFrame:
    """k-nearest-neighbor GRAPH over an embedding corpus — every vector's
    top-``k`` neighbors by cosine, the building block for graph-based
    curation (SemDeDup cluster seeding, density-based quality scoring,
    label propagation over near-neighbor edges).

    ``block_col=None`` computes the exact graph (quadratic self-join —
    the ground-truth/test-scale path). At 100 TB pass a block key
    (k-means cell or LSH bucket, e.g. similarity.lsh_partition's
    ``bucket``): the self-join stays within blocks and the shuffle is
    one exchange keyed by the block — identical algebra to
    dedup.embedding_cosine_pairs, plus the per-node top-k window.

    Deterministic to the BIT, not just to a rounding guard: elements
    quantize to DECIMAL(12,6) and the dot products / squared norms are
    exact decimal sums (order-independent — the semantic_dedup
    discipline), so cosine = round(dot / (√na·√nb), 4) is computed from
    identical doubles on both engines and a half-way rounding boundary
    can never split them. Ties break on neighbor id ascending.
    """
    from pyspark.sql import Window

    vq = dec_quantize(F.col(vec_col))
    cols = [F.col(id_col).alias("id"), vq.alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") != F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    cos = dec_cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias(id_col),
            F.col("b.id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(
            Window.partitionBy(id_col).orderBy(
                F.desc("cosine"), F.asc("neighbor_id")
            )
        ).cast("int"))
        .filter(F.col("rank") <= k)
    )


def embedding_outliers(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    norm_lo: float = 0.25,
    norm_hi: float = 4.0,
    cos_lo: float = -0.25,
) -> DataFrame:
    """Embedding-table QUALITY AUDIT — the sanity gate an embedding
    pipeline runs before trusting vectors for dedup/search: per-vector
    L2 norm (degenerate encoders emit near-zero or exploding vectors)
    and cosine to the corpus centroid (a vector anti-aligned with the
    corpus mode is a decode/ingest bug more often than signal). Flags
    rows outside [norm_lo, norm_hi] or below ``cos_lo``.

    Scale shape: the centroid is ONE (dim)-row aggregate (posexplode →
    per-dimension mean — bounded by dim regardless of corpus size, the
    k-means-update pattern) collected and re-broadcast as a literal;
    scoring is map-only. Determinism: per-dim means round to 6 dp
    (guards the distributed-vs-sequential summation ulp), norms and
    cosines round to 4 dp — the DuckDB oracle replays bit-identically.
    """
    e = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    mean_rows = (
        e.select(F.posexplode("v").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .collect()
    )  # dim rows — bounded driver state
    cent = [r["m"] for r in sorted(mean_rows, key=lambda r: r["dim"])]
    cvec = F.array(*[F.lit(float(x)) for x in cent])
    norm = F.round(F.sqrt(_dot(F.col("v"), F.col("v"))), 4)
    cosc = F.round(cosine(F.col("v"), cvec), 4)
    return e.select(
        F.col("vid").alias(id_col),
        norm.alias("l2_norm"),
        cosc.alias("cos_centroid"),
        (
            (norm < norm_lo) | (norm > norm_hi) | (cosc < cos_lo)
        ).alias("is_outlier"),
    )
