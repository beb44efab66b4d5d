"""Deterministic sampling / splitting / shuffling for training-data
pipelines.

Everything here is a pure map-side column expression over a
content-derived md5 bucket — no RNG state, no shuffle (except the
within-shard ordering window in :func:`shuffle_shards`), and bit-for-bit
reproducible across engines and runs. That determinism is the point for
training data:

- the same document always lands in the same split (no train/val leak
  when the corpus is re-ingested or backfilled),
- per-source mixing rates are auditable SQL arithmetic, not RNG draws,
- the DuckDB oracle can replay the exact construction
  (``('0x' || substr(md5(k),1,15))::BIGINT`` equals Spark's
  ``conv(substring(md5(k),1,8),16,10)`` — pinned by the driver gate).

Scale: ``hash_bucket``/``stratified_sample``/``train_val_split`` are
embarrassingly parallel (whole-stage codegen, zero exchanges);
``shuffle_shards`` costs exactly one hash shuffle on the shard key plus
a per-shard sort — the standard "global shuffle" for writing training
shards, with parallelism = ``n_shards``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 10_000


def hash_bucket(
    key: Column, n_buckets: int = DEFAULT_BUCKETS, seed: str = ""
) -> Column:
    """Deterministic bucket in ``[0, n_buckets)`` from md5 of the key.

    15 hex digits = 60 bits, comfortably inside BIGINT in both Spark and
    DuckDB, so the modulo is exact cross-engine (no sign wraparound).
    """
    h = F.md5(F.concat(F.lit(seed), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % n_buckets
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = "strat",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically by key.

    ``rates`` maps stratum value -> sampling fraction (e.g. per-language
    mixing weights). A row survives iff its hash bucket falls under
    ``rate * n_buckets``, so re-running the pipeline — or running it in
    DuckDB — keeps exactly the same rows.
    """
    bucket = hash_bucket(F.col(key_col), n_buckets, seed)
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(
            F.col(strata_col) == F.lit(value), F.lit(float(r))
        ).otherwise(rate)
    return df.where(bucket < F.round(rate * n_buckets).cast("bigint"))


def train_val_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = "split",
) -> DataFrame:
    """Tag rows ``train``/``val`` by content hash — leak-proof under
    re-ingestion: a document's split never changes when the corpus grows.
    """
    bucket = hash_bucket(F.col(key_col), n_buckets, seed)
    cut = int(round(val_fraction * n_buckets))
    return df.withColumn(
        "split", F.when(bucket < cut, F.lit("val")).otherwise(F.lit("train"))
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 32,
    seed: str = "shuf",
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` ordered shards.

    Training wants examples in pseudo-random order but reproducibly so.
    Rows route to a shard by hash and are ordered inside the shard by
    their full md5 — a fixed permutation of the corpus. One hash shuffle
    + per-shard sort; at 100 TB set ``n_shards`` to the writer
    parallelism and follow with ``write.partitionBy('shard')``.
    """
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    out = df.withColumn("_shufkey", h).withColumn(
        "shard",
        (F.conv(F.substring("_shufkey", 1, 15), 16, 10).cast("bigint")
         % n_shards).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("_shufkey")
    return out.withColumn(
        "pos", F.row_number().over(w).cast("int")
    ).drop("_shufkey")


def domain_mix(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    total: int,
    key_col: str,
    default_weight: float = 0.0,
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = "mix",
) -> DataFrame:
    """Deterministic domain-weighted corpus mixing (the Pile/DoReMi
    recipe): pick ~``total`` documents so the selected mixture follows
    ``weights`` over ``domain_col``, subject to availability.

    Per-domain acceptance rate = ``min(1, total * w_d / count_d)`` —
    a domain with fewer documents than its target contributes everything
    it has (rate capped at 1; no repetition). Selection is the same
    content-derived md5 bucket as :func:`stratified_sample`, so the
    chosen set is bit-reproducible across runs, engines, and backfills,
    and adding documents to one domain never reshuffles another's picks.

    Scale: one tiny aggregation (|domains| rows) broadcast back onto a
    map-only filter — the corpus itself is never shuffled. The rate
    arithmetic happens inside the plan (no driver collect), and the
    DuckDB oracle replays the float ops in the same order, making the
    mix auditable SQL rather than RNG state.
    """
    cnt = df.groupBy(domain_col).agg(F.count("*").alias("__dom_n"))
    w = F.lit(float(default_weight))
    for value, wt in sorted(weights.items()):
        w = F.when(
            F.col(domain_col) == F.lit(value), F.lit(float(wt))
        ).otherwise(w)
    rate = F.least(
        F.lit(1.0), F.lit(float(total)) * w / F.col("__dom_n")
    )
    bucket = hash_bucket(F.col(key_col), n_buckets, seed)
    out_cols = df.columns
    return (
        df.join(F.broadcast(cnt), domain_col)
        .where(bucket < F.floor(rate * n_buckets).cast("bigint"))
        .select(*out_cols)
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    k: int,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): each row gets sort key ln(u)/w with u a
    content-derived uniform in (0,1); the k LARGEST keys are the sample.
    Rows with weight w are included with the exact A-Res probabilities,
    and because u comes from md5 (not RNG state) the draw is
    bit-reproducible across runs, engines and backfills — the property
    that makes quality-weighted corpus sampling auditable.

    Scale: the key is a map-side codegen'd expression; selection is one
    TakeOrderedAndProject (top-k, no full sort, no shuffle of the
    corpus). Keys round to 8 digits with a doc-id tiebreak so libm-vs-
    StrictMath 1-ulp ln/pow differences cannot flip the k-boundary."""
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    u = (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") + 1
    ) / F.lit(1152921504606846977.0)  # 2^60 + 1: u in (0, 1]
    skey = F.round(F.log(u) / weight, 8)
    return (
        df.select(
            F.col(key_col),
            F.round(weight, 4).alias("weight"),
            skey.alias("skey"),
        )
        .orderBy(F.col("skey").desc(), F.col(key_col))
        .limit(k)
    )


def dsir_weights(
    df: DataFrame,
    target_filter: Column,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 50,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus
    document by how target-like its hashed n-gram profile is, then keep
    the top-weighted docs.

    Features are word bigrams hashed into ``n_buckets`` buckets (md5 —
    cross-engine identical). Bucket distributions are fit for the
    target subset (``target_filter``) and the whole corpus with add-one
    smoothing; a document's importance weight is
    ``sum_b count_b(doc) * (log p_target(b) - log p_corpus(b))``.
    Log-ratios round to 6 digits and accumulate as DECIMAL(14,6) —
    exact order-independent addition, so the distributed partial sums
    hash-match DuckDB's sequential fold.

    Scale design: the bucket ratio table is ``n_buckets`` rows —
    broadcast; (doc, bucket) counts shuffle once on the doc-dominated
    composite key; the final per-doc reduce reuses the doc key. The
    heavy text never shuffles — only 16-byte hashes and counts do.
    Selection is a deterministic TakeOrderedAndProject (rounded weight,
    then doc_id).
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    grams = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = df.select(
        id_col,
        target_filter.alias("__is_target"),
        F.explode(grams).alias("__g"),
    ).select(
        id_col,
        "__is_target",
        (
            F.conv(F.substring(F.md5(F.col("__g")), 1, 15), 16, 10)
            .cast("bigint")
            % n_buckets
        ).alias("__b"),
    )
    doc_b = feats.groupBy(id_col, "__b").agg(
        F.count("*").alias("__c"), F.first("__is_target").alias("__t")
    )
    # bucket totals: corpus-wide and target-only, add-one smoothed
    bucket = doc_b.groupBy("__b").agg(
        F.sum("__c").alias("__corpus_c"),
        F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(F.lit(0))).alias(
            "__target_c"
        ),
    )
    totals = bucket.agg(
        F.sum("__corpus_c").alias("__corpus_n"),
        F.sum("__target_c").alias("__target_n"),
    )
    ratio = bucket.crossJoin(F.broadcast(totals)).select(
        "__b",
        F.round(
            F.log(
                (F.col("__target_c") + 1)
                / (F.col("__target_n") + F.lit(n_buckets))
            )
            - F.log(
                (F.col("__corpus_c") + 1)
                / (F.col("__corpus_n") + F.lit(n_buckets))
            ),
            6,
        )
        .cast("decimal(14,6)")
        .alias("__lr"),
    )
    weights = (
        doc_b.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("__c") * F.col("__lr")).cast("double"), 4
            ).alias("log_weight"),
            F.sum("__c").cast("int").alias("n_grams"),
        )
    )
    return (
        weights.orderBy(F.desc("log_weight"), F.col(id_col))
        .limit(top_k)
        .select(id_col, "log_weight", "n_grams")
    )


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    temperature: float,
    total: int,
    key_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = "tmix",
) -> DataFrame:
    """Temperature-scaled domain sampling (the mC4/XLM-R multilingual
    recipe): target mixture q_d ∝ p_d^τ where p_d is the domain's
    natural share — τ=1 keeps natural proportions, τ→0 approaches
    uniform, upsampling the tail domains. Acceptance rate per domain =
    min(1, total · q_d / count_d), selected by the same content-derived
    md5 bucket as :func:`stratified_sample` (bit-reproducible, no RNG).

    Cross-engine determinism around ``pow`` (the one libm call): the
    unnormalized q_d rounds to 6 dp and is CAST to DECIMAL before the
    normalizing sum, so a last-ulp pow() difference between the JVM and
    DuckDB cannot propagate; every later step is exact-DECIMAL or
    identically-ordered double arithmetic rounded again at 6 dp.

    Scale: two tiny aggregations (|domains| rows, then 1 row) broadcast
    back onto a map-only filter — the corpus is never shuffled.
    """
    cnt = df.groupBy(domain_col).agg(F.count("*").alias("__dom_n"))
    n_tot = cnt.agg(F.sum("__dom_n").alias("__N"))
    q = (
        cnt.crossJoin(F.broadcast(n_tot))
        .withColumn(
            "__q",
            F.round(
                F.pow(
                    F.col("__dom_n").cast("double") / F.col("__N"),
                    F.lit(float(temperature)),
                ),
                6,
            ).cast("decimal(10,6)"),
        )
    )
    z = q.agg(F.sum("__q").alias("__Z"))
    rates = (
        q.crossJoin(F.broadcast(z))
        .withColumn(
            "__rate",
            F.least(
                F.lit(1.0),
                F.round(
                    F.lit(float(total))
                    * (F.col("__q").cast("double") / F.col("__Z").cast("double"))
                    / F.col("__dom_n"),
                    6,
                ),
            ),
        )
        .select(domain_col, "__rate")
    )
    bucket = hash_bucket(F.col(key_col), n_buckets, seed)
    out_cols = df.columns
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(bucket < F.floor(F.col("__rate") * n_buckets).cast("bigint"))
        .select(*out_cols)
    )


def curriculum_interleave(
    df: DataFrame,
    score_col: str,
    domain_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-interleaved curriculum ORDER for training: rank documents
    by quality within each domain (descending ``score_col``), then
    round-robin the domains so every training window sees a domain mix
    — the standard ordering recipe when a run cannot shuffle the whole
    corpus but must avoid long single-domain stretches (curriculum /
    anti-clumping, cf. the data-ordering discussion in Gopher app. A).

    Output: ``(id, domain, round, slot)`` — the training order is
    (round, slot): round r serves the r-th best document of every
    domain that still has one, slot = the domain's position within the
    round. A closed-form GLOBAL sequence number is deliberately NOT
    materialized: it would need a single-partition window; (round,
    slot) is already a total order and each component is a KEYED window
    (partition by domain, then by round) — two bounded shuffles, no
    global sort, scales to any corpus.

    Deterministic: ties inside a domain break on id ascending; slot
    order inside a round is (domain, id) — both engines replay
    identically.
    """
    by_domain = Window.partitionBy(domain_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    ranked = df.select(
        id_col, domain_col, score_col
    ).withColumn("round", F.row_number().over(by_domain))
    in_round = Window.partitionBy("round").orderBy(
        F.asc(domain_col), F.asc(id_col)
    )
    return ranked.select(
        id_col,
        F.col(domain_col).alias("domain"),
        F.col("round").cast("int").alias("round"),
        F.row_number().over(in_round).cast("int").alias("slot"),
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic shard MANIFEST — the integrity record a training
    ingest writes next to its shards: every document hash-buckets into
    a shard (md5 of the id — reshuffling or re-running the pipeline can
    never move a document), and each shard row carries its row count,
    total characters, id range, and a CONTENT CHECKSUM (md5 over the
    lexicographically sorted per-doc content fingerprints). Two
    manifests with equal checksums hold byte-identical shard content
    regardless of row order — the property resumable ingest and
    train-job provenance checks rely on.

    One shuffle keyed by the shard id (n_shards groups out); the
    checksum concatenates md5 fingerprints (16 B/doc), never document
    text. sort_array inside the aggregate makes the checksum
    order-independent without a global sort.
    """
    from .text import fingerprint

    per_doc = df.select(
        hash_bucket(F.col(id_col), n_shards, seed="shard:").alias("shard"),
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).alias("nc"),
        fingerprint(F.col(text_col)).alias("fp"),
    )
    return per_doc.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nc").cast("long").alias("n_chars"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list("fp")), "")
        ).alias("content_md5"),
    )


def dp_histogram(
    df: DataFrame,
    group_col: str = "lang",
    epsilon: float = 1.0,
    seed: str = "dp:",
) -> DataFrame:
    """Differentially-private histogram release: per-group counts with
    Laplace(1/ε) noise — the ε-DP mechanism a corpus release applies to
    its published statistics (counting queries have sensitivity 1, so
    scale b = 1/ε). Complements kanon_release: k-anonymity gates the
    rows, DP noise protects the aggregate counts themselves.

    The Laplace draw uses the inverse CDF over a DETERMINISTIC
    md5-derived uniform (52 bits of the group's hash → u ∈ (0,1)):
    X = b·ln(2u) for u < 0.5, −b·ln(2−2u) otherwise. Deterministic
    noise exists for REPLAY — tests and the cross-engine oracle pin the
    mechanism's algebra exactly; a production release swaps the hash
    for a real RNG (the privacy accounting depends on the distribution,
    which is identical). ln rounds to 6 dp before scaling so a last-ulp
    libm difference cannot cross the rounding boundary.

    One bounded aggregate (|groups| rows); noise is computed per output
    row — no per-input-row math, no extra shuffle.
    """
    counts = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(group_col).cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    b = 1.0 / epsilon
    noise = F.when(
        u < 0.5, F.lit(b) * F.round(F.log(2.0 * u), 6)
    ).otherwise(-F.lit(b) * F.round(F.log(2.0 - 2.0 * u), 6))
    return counts.select(
        group_col,
        "n",
        F.round(noise, 4).alias("noise"),
        F.round(F.col("n") + noise, 4).alias("noisy_n"),
    )


def fixed_size_stratified(
    df: DataFrame,
    k: int = 20,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "fks",
) -> DataFrame:
    """Fixed-SIZE stratified sample: exactly ``min(k, |group|)`` rows per
    group, chosen by deterministic md5 hash order — the other standard
    stratification shape next to the rate-based ``stratified_sample``
    (equal representation per class for eval sets, few-shot pools,
    annotation batches). Replays identically on any engine and any run:
    the "random" order is a pure function of (seed, id).

    One group-keyed window shuffle; no skew (each group's rows hash to
    its own partition range), no collect.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, id_col)
    return (
        df.select(id_col, group_col, F.row_number().over(w).alias("__rn"))
        .where(F.col("__rn") <= k)
        .select(id_col, group_col, F.col("__rn").cast("int").alias("draw_rank"))
    )
