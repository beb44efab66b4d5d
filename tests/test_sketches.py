"""Property tests for the deterministic sketch family
(operators/sketches.py), the winnowing fingerprint, and blocked record
linkage — semantics the hash-parity gate can't see (accuracy bounds,
one-sided error, the winnowing coverage guarantee, blocking behavior).
"""

import pytest
from pyspark.sql import functions as F

from duckdb_nsql_spark.operators import dedup, sketches
from duckdb_nsql_spark.operators import text as text_ops

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hll_estimate_accuracy(spark, docs):
    """HLL with m=64 registers has ~13% standard error; every language's
    estimate should land well inside 3 sigma of the exact count."""
    rows = sketches.hll_distinct(docs).collect()
    assert rows, "no languages"
    for r in rows:
        assert r.registers_hit <= sketches.HLL_M
        assert abs(r.rel_error) < 0.4, (r.lang, r.rel_error)
        # rel_error column is derived from the same two outputs
        assert r.hll_estimate > 0


def test_hll_insensitive_to_duplication(spark, docs):
    """Cardinality sketch property: doubling every row (union with
    itself) must leave registers — and the estimate — unchanged."""
    doubled = docs.unionAll(docs)
    a = {
        r.lang: (r.exact_distinct, r.hll_estimate)
        for r in sketches.hll_distinct(docs).collect()
    }
    b = {
        r.lang: (r.exact_distinct, r.hll_estimate)
        for r in sketches.hll_distinct(doubled).collect()
    }
    assert a == b


def test_cms_one_sided_error(spark, docs):
    """Count-Min never underestimates: estimate >= exact on every probe."""
    rows = sketches.cms_heavy_hitters(docs).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_n >= r.exact_n, (r.word, r.cms_n, r.exact_n)
        assert r.overestimate == r.cms_n - r.exact_n


def test_quantile_sketch_bounds(spark, docs):
    """The histogram median estimate must land inside the group's
    [lo, hi] value range and near the exact median (64 bins => within
    ~2 bin widths on any distribution)."""
    rows = sketches.quantile_sketch(docs).collect()
    assert rows
    for r in rows:
        assert r.rel_error < 0.1, (r.lang, r.est_q, r.exact_q)


def test_winnow_coverage_guarantee(spark):
    """Winnowing's defining property: two documents sharing a run of
    k + w - 1 = 8 words share at least one selected fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, f"one two three four five six seven {shared} tail1 tail2"),
            (2, f"{shared} completely different suffix words here nine"),
        ],
        ["doc_id", "text"],
    )
    # recompute the selected fingerprint SETS (not just counts)
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                    lambda x: x != "")
    base = df.select("doc_id", toks.alias("toks"))
    grams = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 4),
                lambda i: F.md5(F.array_join(F.slice("toks", i, 5), " ")),
            )
        ).alias("pos", "h"),
    )
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    sel = (
        grams.withColumn("m", F.min("h").over(win))
        .where(F.col("pos") >= 3)
        .select("doc_id", "m")
        .distinct()
        .collect()
    )
    s1 = {r.m for r in sel if r.doc_id == 1}
    s2 = {r.m for r in sel if r.doc_id == 2}
    assert s1 & s2, "shared 8-word run must share a fingerprint"
    # and the operator's density is genuinely sub-1 (it thins the set)
    out = {r.doc_id: r for r in text_ops.winnow_fingerprints(df).collect()}
    assert out[1].density < 1.0 and out[2].density < 1.0


def test_winnow_excludes_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "only seven words here not enough okay"),
         (2, "this document has exactly eight words in it")],
        ["doc_id", "text"],
    )
    ids = {r.doc_id for r in text_ops.winnow_fingerprints(df).collect()}
    assert ids == {2}


def test_record_linkage_links_exact_dups(spark, docs):
    """Planted exact duplicates normalize to identical keys => a dist-0
    pair must exist; every pair stays within one blocking group."""
    rows = dedup.record_linkage(docs).collect()
    assert rows, "corpus has planted duplicates; linkage must find pairs"
    assert any(r.dist == 0 for r in rows)
    for r in rows:
        assert r.id_a < r.id_b
        assert r.dist <= 6


def test_record_linkage_no_cartesian(spark, docs):
    plan = dedup.record_linkage(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_doc_retrieval_returns_relevant_chunks(spark, docs):
    out = text_ops.doc_retrieval(docs, ["window", "merge", "scan"], k=5)
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        low = r.chunk_text.lower()
        assert any(t in low for t in ("window", "merge", "scan"))
        assert r.chunk_id >= 1 and r.bm25 > 0


def test_orc_roundtrip_preserves_counts(spark, docs):
    from duckdb_nsql_spark import workload

    out = workload.op_orc_roundtrip(spark, SF_DIR)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    assert total == docs.count()


def test_linkage_entities_transitive(spark, docs):
    """Entity ids are canonical minima and every entity has >= 2
    members (singletons never enter the pair graph)."""
    from duckdb_nsql_spark import workload

    rows = workload.op_linkage_entities(spark, SF_DIR).collect()
    assert rows
    by_ent = {}
    for r in rows:
        by_ent.setdefault(r.entity_id, []).append(r)
    for eid, members in by_ent.items():
        ids = {m.doc_id for m in members}
        assert eid == min(ids)
        assert all(m.n_members == len(members) for m in members)
        assert len(members) >= 2


def test_column_ndv_profile_accuracy(spark):
    from duckdb_nsql_spark import workload

    rows = workload.op_column_ndv_profile(spark, SF_DIR).collect()
    got = {r.col_name: r for r in rows}
    assert set(got) == {"l_returnflag", "l_linestatus", "l_partkey",
                        "l_orderkey", "l_suppkey"}
    assert got["l_returnflag"].exact_ndv == 3
    assert got["l_linestatus"].exact_ndv == 2
    for r in rows:
        assert abs(r.rel_error) < 0.4, (r.col_name, r.rel_error)


def test_funnel_monotone_and_retention_week0(spark):
    """Funnel survivor counts never increase step to step; every
    retention cohort is 100% active at week offset 0."""
    from duckdb_nsql_spark import workload

    funnel = sorted(
        workload.op_funnel_analysis(spark, SF_DIR).collect(),
        key=lambda r: r.step,
    )
    assert [r.step_name for r in funnel] == ["view", "click", "purchase"]
    assert funnel[0].conversion == 1.0
    for a, b in zip(funnel, funnel[1:]):
        assert b.n_users <= a.n_users

    ret = workload.op_retention_cohorts(spark, SF_DIR).collect()
    assert ret
    for r in ret:
        if r.week_offset == 0:
            assert r.retention == 1.0
        assert 0 < r.n_active <= r.cohort_n


def test_oov_rate_and_attribution_semantics(spark):
    """OOV rates are valid fractions; attribution channels partition the
    purchase set exactly (counts sum to the number of purchases)."""
    from duckdb_nsql_spark import workload

    oov = workload.op_oov_rate(spark, SF_DIR).collect()
    assert oov
    for r in oov:
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0.0 <= r.oov_rate < 1.0

    att = workload.op_attribution(spark, SF_DIR).collect()
    purchases = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where("event_type = 'purchase'")
        .count()
    )
    assert sum(r.n_conversions for r in att) == purchases
    assert {r.channel for r in att} <= {"view", "click", "unattributed"}


def test_pagerank_mass_and_isolation(spark, docs):
    """PageRank sanity: total rank mass stays ~1 (floor bias only ever
    shrinks it, bounded by iters * n * 1e-12), and a higher-degree hub
    outranks a leaf in a star graph."""
    from duckdb_nsql_spark.operators import graph

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (5, 6)], ["id_a", "id_b"]
    )
    rows = {r.doc_id: r for r in graph.pagerank(pairs).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    total = sum(r.pr_scaled for r in rows.values())
    assert 0.98 * graph.PR_SCALE < total <= graph.PR_SCALE
    assert rows[1].pr_scaled > rows[2].pr_scaled  # hub beats leaf
    assert rows[5].pr_scaled == rows[6].pr_scaled  # symmetric pair


def test_hll_registers_merge_across_shards(spark, docs):
    """Mergeability — the property that makes sketches distributed:
    max-merging the register tables of two disjoint corpus shards must
    equal the whole-corpus register table (hence the same estimate)."""
    from duckdb_nsql_spark.operators import sketches

    en = docs.where("lang = 'en'")
    rest = docs.where("lang <> 'en' OR lang IS NULL")
    regs = lambda df: (
        sketches.hll_cells(
            sketches.hll_words(df.selectExpr("'all' AS g", "text"), "g", "text"),
            "g",
        )
        .groupBy("g", "idx")
        .agg(F.max("rho").alias("m"))
    )
    merged = (
        regs(en)
        .unionAll(regs(rest))
        .groupBy("g", "idx")
        .agg(F.max("m").alias("m"))
    )
    whole = regs(docs.selectExpr("doc_id", "text"))
    a = sketches.hll_finalize(merged, "g").collect()[0]
    b = sketches.hll_finalize(whole, "g").collect()[0]
    assert (a.registers_hit, a.hll_estimate) == (b.registers_hit, b.hll_estimate)


def test_fixed_stratified_and_dataset_card(spark, docs):
    """Fixed-size sample draws exactly min(k, |group|) per group and is
    replay-stable; dataset card dup share is consistent with the exact
    dedup operator's pair count."""
    from duckdb_nsql_spark.operators import sampling
    from duckdb_nsql_spark.operators import text as text_ops

    a = sampling.fixed_size_stratified(docs, k=20).collect()
    b = sampling.fixed_size_stratified(docs, k=20).collect()
    assert sorted((r.doc_id, r.lang) for r in a) == sorted(
        (r.doc_id, r.lang) for r in b
    )
    sizes = {}
    for r in a:
        sizes[r.lang] = sizes.get(r.lang, 0) + 1
    group_n = {
        r.lang: r.n_docs for r in text_ops.dataset_card(docs).collect()
    }
    for lang, n in sizes.items():
        assert n == min(20, group_n[lang])

    card = text_ops.dataset_card(docs).collect()
    assert sum(r.n_docs for r in card) == docs.count()
    # corpus near-dups aren't byte-identical; inject an exact dup and
    # check the card counts BOTH copies as duplicates
    seeded = spark.createDataFrame(
        [(1, "same text here", "en"), (2, "same  TEXT here", "en"),
         (3, "unique words entirely", "en")],
        ["doc_id", "text", "lang"],
    )
    row = text_ops.dataset_card(seeded).collect()[0]
    assert row.n_docs == 3 and row.n_dup_docs == 2
    assert row.dup_rate == round(2 / 3, 4)


def test_embedding_pca_matches_numpy_replay(spark):
    """Independent check of the distributed linear algebra: a numpy
    float64 replay of the SAME power iteration (mean -> covariance ->
    3x max-abs-normalized C.v -> projections) must agree almost
    perfectly. (The synthetic corpus is near-isotropic — top singular
    values 3.71 vs 3.69 — so comparing against SVD's PC1 would test the
    spectral gap of random data, not the operator; on data with real
    structure 3 iterations converge to PC1.) The decimal quantization
    is the only difference vs float64, bounded at ~1e-6 per element."""
    import numpy as np

    from duckdb_nsql_spark.operators import pca

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {r.vec_id: r.pc1 for r in pca.embedding_pca(df).collect()}
    pdf = df.toPandas()
    X = np.round(np.stack(pdf["embedding"].to_numpy()).astype(np.float64), 6)
    Xc = X - np.round(X.mean(axis=0), 6)
    C = np.round(Xc.T @ Xc, 6)
    v = np.ones(X.shape[1])
    for _ in range(pca.PCA_ITERS):
        v = C @ v
        v = np.round(v / np.abs(v).max(), 6)
    ref = Xc @ v
    mine = np.array([got[k] for k in pdf["vec_id"]])
    corr = np.corrcoef(mine, ref)[0, 1]
    assert corr > 0.9999, corr


def test_contamination_and_confusion_semantics(spark, docs):
    """Contamination report covers EVERY eval doc (even gram-less) with
    valid shares; confusion-matrix shares sum to 1 per true language."""
    from duckdb_nsql_spark import workload

    rep = workload.op_contamination_report(spark, SF_DIR).collect()
    n_eval = docs.where("doc_id % 17 = 3").count()
    assert len(rep) == n_eval
    assert any(r.n_hit_grams > 0 for r in rep), "planted dups must leak"
    for r in rep:
        assert 0 <= r.n_hit_grams <= r.n_grams
        assert 0.0 <= r.leak_share <= 1.0

    conf = workload.op_langid_confusion(spark, SF_DIR).collect()
    by_true = {}
    for r in conf:
        by_true.setdefault(r.true_lang, 0.0)
        by_true[r.true_lang] += r.share
    for lang, total in by_true.items():
        assert abs(total - 1.0) < 0.01, (lang, total)


def test_containment_asymmetry_detects_subset(spark):
    """A short doc quoted inside a long one: Jaccard is low but
    containment is ~1 in the subset direction — the signal this
    operator exists for."""
    long_words = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(20))  # strict subset run
    df = spark.createDataFrame(
        [(1, long_words), (2, quote)], ["doc_id", "text"]
    )
    rows = dedup.shingle_containment(df, threshold=0.8).collect()
    assert rows, "subset pair must surface via the inverted index"
    r = {(x.id_a, x.id_b): x for x in rows}[(1, 2)]
    assert r.c_ba == 1.0          # every quote shingle is in the long doc
    assert r.c_ab < 0.5           # the long doc is NOT contained


def test_corpus_statistics_ops(spark, docs):
    """Zipf slope is negative (frequencies decay with rank) and the
    Heaps curve is monotone in both tokens and vocabulary; winnow
    matching finds the planted near-dup pairs with high shares."""
    from duckdb_nsql_spark import workload
    from duckdb_nsql_spark.operators import text as text_ops

    vocab = (
        docs.selectExpr(
            "explode(filter(split(lower(text), '[^a-z0-9]+'),"
            " x -> x <> '')) AS w"
        )
        .distinct()
        .count()
    )
    z = text_ops.zipf_fit(docs).collect()[0]
    # synthetic corpus draws from a tiny word pool; the fit runs over
    # min(top_k, vocab) points and the slope is negative regardless
    assert z.n_points == min(1000, vocab)
    assert z.zipf_slope < 0, z.zipf_slope

    h = sorted(text_ops.heaps_curve(docs).collect(), key=lambda r: r.step)
    assert [r.step for r in h] == [1, 2, 3, 4, 5]
    for a, b in zip(h, h[1:]):
        assert b.n_tokens >= a.n_tokens and b.vocab >= a.vocab

    m = workload.op_winnow_matches(spark, SF_DIR).collect()
    assert m, "planted near-dups must share fingerprints"
    assert any(r.share_a > 0.5 or r.share_b > 0.5 for r in m)


def test_lateness_audit_matches_sequential_replay(spark):
    """The distributed two-level prefix scan must agree with a plain
    sequential replay, and drops are monotone non-increasing in the
    watermark delay."""
    from duckdb_nsql_spark.operators import behavior

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = {
        r.watermark_s: r
        for r in behavior.lateness_audit(ev).collect()
    }
    assert list(sorted(rows)) == [0, 300, 1800, 7200]
    drops = [rows[w].n_dropped for w in sorted(rows)]
    for a, b in zip(drops, drops[1:]):
        assert b <= a

    pdf = ev.select("event_id", "ts").toPandas().sort_values("event_id")
    run_max = pdf["ts"].cummax()
    late_s = (run_max - pdf["ts"]).dt.total_seconds()
    for w in (0, 300, 7200):
        assert rows[w].n_dropped == int((late_s > w).sum()), w


def test_linear_attribution_conserves_credits(spark):
    """Every purchase contributes credits: n_credits across channels ==
    total pair credits + unattributed conversions; revenue never exceeds
    total purchase value (floor-biased splitting)."""
    from duckdb_nsql_spark import workload

    rows = workload.op_linear_attribution(spark, SF_DIR).collect()
    assert {r.channel for r in rows} <= {"view", "click", "unattributed"}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total_value = (
        ev.where("event_type = 'purchase'")
        .selectExpr("sum(cast(round(value, 4) as decimal(14,4)))")
        .collect()[0][0]
    )
    rev = sum(r.revenue for r in rows)
    assert rev <= float(total_value) + 1e-6
    assert rev > 0.95 * float(total_value)  # floor bias is tiny
