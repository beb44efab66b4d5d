"""Unit semantics for the sampling / clustering / packing pipeline
operators (cross-engine value parity is separately enforced by
tests/test_oracle_parity.py via the registry oracles)."""

import pytest
from pyspark.sql import functions as F

from duckdb_nsql_spark.operators import dedup, packing, sampling


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------- clusters


def test_connected_components_chain_and_island(spark):
    # chain 1-2-3 (1 and 3 never pair directly) + island pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_connected_components_long_chain_converges(spark):
    # a 12-hop path exercises multi-round propagation to one cluster
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    rows = dedup.connected_components(pairs).collect()
    assert len(rows) == 13
    assert {r["cluster_id"] for r in rows} == {0}


def test_dedup_clusters_cover_all_pair_members(docs):
    pairs = dedup.minhash_lsh_candidates(docs)
    members = {
        r["id"]
        for r in pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select("id_b"))
        .distinct()
        .collect()
    }
    clustered = dedup.dedup_clusters(docs).collect()
    assert {r["doc_id"] for r in clustered} == members
    # every cluster id is itself a member of the cluster
    by_cluster = {}
    for r in clustered:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    for cid, ids in by_cluster.items():
        assert cid == min(ids)


# ---------------------------------------------------------------- sampling


def test_train_val_split_deterministic_and_disjoint(docs):
    a = sampling.train_val_split(docs.select("doc_id"), "doc_id", 0.2)
    b = sampling.train_val_split(docs.select("doc_id"), "doc_id", 0.2)
    ra = sorted((r["doc_id"], r["split"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["split"]) for r in b.collect())
    assert ra == rb
    n_val = sum(1 for _, s in ra if s == "val")
    assert 0 < n_val < len(ra)
    # a grown corpus never reassigns an existing doc's split
    half = sampling.train_val_split(
        docs.select("doc_id").where("doc_id % 2 = 0"), "doc_id", 0.2
    )
    full = dict(ra)
    for r in half.collect():
        assert full[r["doc_id"]] == r["split"]


def test_stratified_sample_is_subset_with_rate_order(docs):
    out = sampling.stratified_sample(
        docs.select("doc_id", "lang"),
        "lang",
        {"en": 1.0, "zh": 0.0},
        "doc_id",
        default_rate=0.3,
    )
    rows = out.collect()
    langs = {r["lang"] for r in rows}
    assert "zh" not in langs
    n_en_all = docs.where("lang = 'en'").count()
    n_en_kept = sum(1 for r in rows if r["lang"] == "en")
    assert n_en_kept == n_en_all  # rate 1.0 keeps everything
    assert len(rows) < docs.count()


def test_shuffle_shards_is_permutation(docs):
    out = sampling.shuffle_shards(docs.select("doc_id"), "doc_id", 4)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert {r["shard"] for r in rows} <= set(range(4))
    # positions are 1..n within each shard, no gaps
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


# ----------------------------------------------------------------- packing


BUDGET = 512


def test_pack_first_fit_invariants(docs):
    rows = packing.pack_first_fit(docs, BUDGET).collect()
    assert len(rows) == docs.count()
    by_shard_bin = {}
    for r in rows:
        key = (r["shard"], r["bin"])
        by_shard_bin.setdefault(key, []).append(r)
    for (shard, b), members in by_shard_bin.items():
        total = sum(r["n_tokens"] for r in members)
        # a bin only exceeds budget if a single oversized doc owns it
        assert total <= BUDGET or len(members) == 1
        # recorded fill matches the running content of the bin
        assert max(r["fill"] for r in members) == total
    # bins are contiguous from 0 per shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], set()).add(r["bin"])
    for bins in by_shard.values():
        assert bins == set(range(max(bins) + 1))


def test_pack_concat_chunks_offsets_consistent(docs):
    rows = packing.pack_concat_chunks(docs, BUDGET).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r["offset"] < BUDGET
    # per shard: starts (chunk*BUDGET + offset) are the exact running sum
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for members in by_shard.values():
        members.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in members:
            assert r["chunk"] * BUDGET + r["offset"] == run
            run += r["n_tokens"]


# ------------------------------------------------------- round-8 ops


def test_canonicalize_url_rules(spark):
    """Every canonicalization rule pinned on hand-built URLs: case,
    default ports (scheme-aware), www, trailing slash, fragment,
    tracking params, param sort."""
    from duckdb_nsql_spark.operators.text import canonicalize_url

    cases = [
        ("HTTP://WWW.Ex.COM:80/A/?utm_source=x&b=2&a=1#f",
         "http://ex.com/A?a=1&b=2"),
        ("https://ex.com:443/path///", "https://ex.com/path"),
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),
        # :80 is NOT default for https — kept
        ("https://ex.com:80/p", "https://ex.com:80/p"),
        ("http://ex.com", "http://ex.com/"),
        ("http://ex.com/?ref=home&fbclid=1&gclid=2&utm_x=3",
         "http://ex.com/"),
        ("http://ex.com/p?z=1&a=2", "http://ex.com/p?a=2&z=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_groups_variants(spark):
    from duckdb_nsql_spark.operators.text import url_dedup

    df = spark.createDataFrame(
        [
            (1, "HTTP://WWW.Ex.COM:80/a?utm_s=1"),
            (2, "http://ex.com/a"),
            (3, "http://ex.com/a/"),
            (4, "http://ex.com/b"),
        ],
        "doc_id long, url string",
    )
    rows = {r["canon_url"]: r for r in url_dedup(df).collect()}
    a = rows["http://ex.com/a"]
    assert (a["n_urls"], a["n_variants"], a["keep_doc"]) == (3, 3, 1)
    b = rows["http://ex.com/b"]
    assert (b["n_urls"], b["n_variants"], b["keep_doc"]) == (1, 1, 4)


def test_c4_clean_rules_and_doc_gate(spark):
    from duckdb_nsql_spark.operators.text import c4_clean

    good = "this line is long enough to survive."
    doc1 = "\n".join(
        [
            good,
            "no terminal punctuation here at all",   # fails punct
            "too short.",                             # fails words
            "a line with { brace } inside it okay.",  # fails brace
            "please enable JavaScript to continue.",  # fails boiler
            "Lorem Ipsum dolor sit amet filler text.",  # fails boiler
            good.replace("this", "that"),
            good.replace("this", "third"),
        ]
    )
    df = spark.createDataFrame([(1, doc1)], "doc_id long, text string")
    r = c4_clean(df).collect()[0]
    assert r["n_lines"] == 8
    assert r["fail_punct"] == 1
    assert r["fail_short"] == 1
    assert r["fail_brace"] == 1
    assert r["fail_boiler"] == 2
    assert r["kept_lines"] == 3 and r["keep_doc"] is True
    # two kept lines -> document dropped
    df2 = spark.createDataFrame(
        [(2, good + "\n" + good.replace("this", "that"))],
        "doc_id long, text string",
    )
    r2 = c4_clean(df2).collect()[0]
    assert r2["kept_lines"] == 2 and r2["keep_doc"] is False


def test_remove_duplicate_spans_keep_first(spark):
    """First occurrence (by doc_id, idx) of a 10-word chunk survives;
    every later occurrence — cross-doc AND within-doc — is removed."""
    span = "one two three four five six seven eight nine ten"
    tail = "unique alpha beta gamma delta epsilon zeta eta theta iota"
    df = spark.createDataFrame(
        [
            (1, span + " " + span),          # chunk 2 dups chunk 1
            (2, span + " " + tail),          # chunk 1 dups doc 1
            (3, tail.replace("unique", "other")),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.remove_duplicate_spans(df).collect()}
    assert (out[1]["n_chunks"], out[1]["removed_chunks"]) == (2, 1)
    assert (out[2]["n_chunks"], out[2]["removed_chunks"]) == (2, 1)
    assert (out[3]["n_chunks"], out[3]["removed_chunks"]) == (1, 0)
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[1]["clean_md5"] == md5(span)
    assert out[2]["clean_md5"] == md5(tail)
    # all chunks removed -> md5 of empty string
    df2 = spark.createDataFrame(
        [(1, span), (2, span)], "doc_id long, text string"
    )
    out2 = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_spans(df2).collect()
    }
    assert out2[2]["clean_md5"] == md5("")


def test_incremental_dedup_statuses(spark):
    """Reference hit beats batch position; within-batch keep-first by id;
    unseen fingerprints keep."""
    ref = spark.createDataFrame(
        [(100, "seen Before  text")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (1, "seen before TEXT"),     # normalizes to the ref doc
            (2, "fresh words here"),
            (3, "fresh  WORDS here"),    # same normalized fp as 2
            (4, "completely new"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["status"]
        for r in dedup.incremental_dedup(new, ref).collect()
    }
    assert out == {
        1: "dup_of_reference",
        2: "kept",
        3: "dup_in_batch",
        4: "kept",
    }


def test_temperature_mix_flattens_toward_uniform(docs):
    """τ→0 upsamples tail domains: the selected mixture's max/min lang
    share must be flatter than the natural corpus share."""
    from collections import Counter

    base = docs.select("doc_id", "lang")
    natural = Counter(r["lang"] for r in base.collect())
    picked = Counter(
        r["lang"]
        for r in sampling.temperature_mix(
            base, "lang", temperature=0.1, total=150, key_col="doc_id"
        ).collect()
    )
    def spread(c):
        return max(c.values()) / max(min(c.values()), 1)

    assert set(picked) == set(natural)   # every language survives
    assert spread(picked) < spread(natural)
    # τ=1 keeps natural proportions: per-domain rate is ~constant
    nat = sampling.temperature_mix(
        base, "lang", temperature=1.0, total=150, key_col="doc_id"
    ).collect()
    picked1 = Counter(r["lang"] for r in nat)
    rates = {k: picked1[k] / natural[k] for k in natural}
    assert max(rates.values()) - min(rates.values()) < 0.15


def test_pq_quantize_shapes_and_error(spark, sf_dir):
    from duckdb_nsql_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    out = similarity.pq_quantize(emb, m_sub=4, k=8, iters=2).collect()
    assert len(out) == 64
    for r in out:
        parts = r["code_str"].split("-")
        assert len(parts) == 4 and all(0 <= int(p) < 8 for p in parts)
        assert r["err"] >= 0.0
    # seeds quantize to themselves reasonably: total error is finite and
    # strictly positive for a non-degenerate corpus
    assert sum(r["err"] for r in out) > 0.0


# ------------------------------------------------------ semantic hot cells


def test_semantic_dedup_hot_cell_subsplit(spark):
    """Degenerate embedding distribution: far more vectors than k-means
    cells, so every cell blows past the cap and the within-cell
    self-join goes quadratic in the corpus. hot_cell_cap must sub-split
    hot cells with the LSH bucket so per-block join inputs stay
    bounded, while exact duplicates (identical vectors — identical
    hyperplane signs by construction) are still caught. (A cell whose
    members also share one DIRECTION is unsplittable by hyperplane LSH
    by design — same signs everywhere — so the degenerate fixture
    keeps angular spread, which is what real embedding collapse looks
    like: many docs, few k-means modes.)"""
    import math

    n, dim = 240, 8
    rows = []
    for i in range(n):
        # deterministic angular jitter; ids 0/1 exact duplicates
        base = [1.0] + [0.0] * (dim - 1)
        if i > 1:
            base = [
                1.0 if d == 0 else math.sin(i * 31 + d * 7)
                for d in range(dim)
            ]
        rows.append((i, [float(x) for x in base]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    cap = 32
    out = dedup.semantic_dedup(
        df, k=4, iters=2, threshold=0.999, hot_cell_cap=cap
    )
    res = {r["vec_id"]: r for r in out.collect()}
    assert len(res) == n
    # the exact duplicate pair survived the sub-split (same bucket always)
    assert res[1]["is_dup"] and res[1]["dup_of"] == 0
    assert not res[0]["is_dup"]

    # per-block join inputs are bounded: replay the block key and check
    # the largest block shrank from ~n to the cap's scale
    from duckdb_nsql_spark.operators.similarity import lsh_bucket

    assigned = out.join(df, "vec_id").select(
        "vec_id", "cluster_id", "embedding"
    )
    sizes = {
        int(r["cluster_id"]): int(r["n"])
        for r in assigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    max_cell = max(sizes.values())
    assert max_cell > cap  # the distribution IS degenerate
    planes = max(1, math.ceil(math.log2(max_cell / cap)))
    split_sizes = [
        int(r["n"])
        for r in assigned.withColumn(
            "b", lsh_bucket(F.col("embedding"), dim, n_planes=planes)
        )
        .groupBy("cluster_id", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(split_sizes) > len(sizes)  # the hot cell actually split
    assert max(split_sizes) < max_cell  # bounded per-block join input

    # cap=None (default) keeps the pure per-cell algebra byte-identical
    base_out = dedup.semantic_dedup(df, k=4, iters=2, threshold=0.999)
    base = {r["vec_id"]: r["cluster_id"] for r in base_out.collect()}
    assert {v: r["cluster_id"] for v, r in res.items()} == base


# ----------------------------------------------------------- round-9 ops


def test_knn_graph_exact_and_blocked(spark):
    from duckdb_nsql_spark.operators import similarity

    rows = [
        (0, [1.0, 0.0], "x"),
        (1, [0.9, 0.1], "x"),
        (2, [0.0, 1.0], "x"),
        (3, [0.1, 0.9], "y"),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "grp"])
    g = {
        (r["vec_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.knn_graph(df, k=1).collect()
    }
    # nearest neighbors by cosine: 0<->1, 2<->3
    assert g[(0, 1)] == 1 and g[(1, 1)] == 0
    assert g[(2, 1)] == 3 and g[(3, 1)] == 2
    # blocking restricts candidates to the block
    gb = {
        (r["vec_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.knn_graph(df, k=1, block_col="grp").collect()
    }
    assert gb[(2, 1)] != 3  # 3 is in block y, invisible to 2
    assert (3, 1) not in gb or gb[(3, 1)] == 3 or True  # y has only one row
    assert all(
        r["rank"] == 1 for r in similarity.knn_graph(df, k=1).collect()
    )


def test_embedding_outliers_flags_degenerate_vectors(spark):
    from duckdb_nsql_spark.operators import similarity

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.01, 0.0]),      # near-zero norm -> outlier
        (3, [100.0, 0.0]),     # exploding norm -> outlier
        (4, [-1.0, -0.2]),     # anti-aligned with the corpus mode
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in similarity.embedding_outliers(df).collect()}
    assert out[2]["is_outlier"] and out[3]["is_outlier"]
    assert out[4]["is_outlier"]  # cos_centroid < -0.25
    assert not out[0]["is_outlier"] and not out[1]["is_outlier"]
    assert abs(out[0]["l2_norm"] - 1.0) < 1e-9


def test_bigram_lm_penalizes_word_salad(spark):
    from duckdb_nsql_spark.operators import text as text_ops

    natural = "the cat sat on the mat and the cat sat on the mat again"
    salad = "mat the on cat the sat and mat on the again sat cat the"
    corpus = [(i, natural) for i in range(8)] + [(100, salad)]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["avg_bigram_logprob"]
        for r in text_ops.bigram_logprob(df).collect()
    }
    # the salad shares the unigram distribution but not the transitions
    assert got[100] < got[0]


def test_curriculum_interleave_order(spark):
    from duckdb_nsql_spark.operators import sampling

    rows = [
        (1, "en", 100), (2, "en", 90), (3, "en", 80),
        (4, "de", 95), (5, "de", 85),
        (6, "fr", 99),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
    out = sampling.curriculum_interleave(
        df, score_col="score", domain_col="lang"
    ).collect()
    by_key = {(r["round"], r["slot"]): (r["doc_id"], r["domain"]) for r in out}
    # round 1 serves each domain's best, slots ordered by domain name
    assert by_key[(1, 1)] == (4, "de")
    assert by_key[(1, 2)] == (1, "en")
    assert by_key[(1, 3)] == (6, "fr")
    # round 2: fr exhausted; de then en
    assert by_key[(2, 1)] == (5, "de")
    assert by_key[(2, 2)] == (2, "en")
    # round 3: only en left
    assert by_key[(3, 1)] == (3, "en")
    assert len(out) == 6


def test_zorder_value_and_locality(spark):
    from duckdb_nsql_spark.operators import layout

    # zvalue == reference morton interleave
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 170, 255) for b in (0, 3, 128, 255)],
        ["a", "b"],
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b",
            layout.zvalue(F.col("a"), F.col("b")).alias("z"),
        ).collect()
    }

    def morton(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b, z)

    # z-sorted layout: every output partition covers a small RECTANGLE —
    # per-partition spans on BOTH columns are far below the global span
    import itertools

    n = 64
    grid = spark.createDataFrame(
        [(x, y) for x, y in itertools.product(range(n), range(n))],
        ["x", "y"],
    )
    parts = (
        layout.zorder_repartition(grid, "x", "y", n_partitions=16)
        .select(
            F.spark_partition_id().alias("pid"), "x", "y"
        )
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count("*").alias("cnt"),
        )
        .collect()
    )
    assert sum(r["cnt"] for r in parts) == n * n
    # 16 partitions of a 64x64 z-curve: each covers about a quadrant-of-
    # quadrant; both spans must be well under the global span of 63 —
    # the property that keeps parquet min/max stats selective on BOTH
    # filter columns
    for r in parts:
        assert r["sx"] <= 32 and r["sy"] <= 32, dict(r.asDict())


def test_gopher_rules_each_gate_fires(spark):
    from duckdb_nsql_spark.operators import text as text_ops

    good = ("the quick brown fox jumps over the lazy dog and then "
            "we have a perfectly normal document to keep with words")
    rows = [
        (0, good),                                      # passes all
        (1, "too short."),                              # fails words
        (2, good + " ##### ### # # # # ... ... ..."),   # fails symbols
        (3, ("9 8 7 6 5 4 3 2 1 0 9 8 7 6 5 4 3 2 1 0 the and of "
             "to be that have with")),                  # fails alpha ratio
        (4, ("lorem ipsum dolor sit amet consectetur adipiscing elit "
             "sed do eiusmod tempor incididunt ut labore")),  # fails stops
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in text_ops.gopher_rules(df).collect()}
    assert got[0]["keep"], got[0]
    assert not got[1]["pass_words"] and not got[1]["keep"]
    assert not got[2]["pass_symbols"] and not got[2]["keep"]
    assert not got[3]["pass_alpha"] and not got[3]["keep"]
    assert not got[4]["pass_stops"] and not got[4]["keep"]


def test_tokenizer_fertility_counts(spark):
    from duckdb_nsql_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (0, "ab cd", "en"),       # 2 words, 2 tokens
            (1, "a-b c3d", "de"),     # 2 words, 3+3=6 tokens? a,-,b,c,3,d
        ],
        ["doc_id", "text", "lang"],
    )
    got = {r["lang"]: r for r in text_ops.tokenizer_fertility(df).collect()}
    assert got["en"]["n_words"] == 2 and got["en"]["n_tokens"] == 2
    assert got["en"]["fertility"] == 1.0
    assert got["de"]["n_words"] == 2 and got["de"]["n_tokens"] == 6
    assert got["de"]["fertility"] == 3.0


def test_shard_manifest_checksum_order_independent(spark):
    from duckdb_nsql_spark.operators import sampling

    rows = [(i, f"document number {i} with content") for i in range(40)]
    df1 = spark.createDataFrame(rows, ["doc_id", "text"])
    df2 = spark.createDataFrame(list(reversed(rows)), ["doc_id", "text"])
    m1 = {r["shard"]: r for r in sampling.shard_manifest(df1, 4).collect()}
    m2 = {r["shard"]: r for r in sampling.shard_manifest(df2, 4).collect()}
    assert set(m1) == set(m2)
    for s in m1:
        assert m1[s]["content_md5"] == m2[s]["content_md5"]
        assert m1[s]["n_docs"] == m2[s]["n_docs"]
    assert sum(r["n_docs"] for r in m1.values()) == 40
    # a content change flips exactly its shard's checksum
    rows3 = list(rows)
    rows3[7] = (7, "MUTATED")
    m3 = {
        r["shard"]: r
        for r in sampling.shard_manifest(
            spark.createDataFrame(rows3, ["doc_id", "text"]), 4
        ).collect()
    }
    changed = [s for s in m1 if m1[s]["content_md5"] != m3[s]["content_md5"]]
    assert len(changed) == 1


def test_crossmodal_dedup_confirms_and_refutes(spark):
    from duckdb_nsql_spark.operators import dedup

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi")
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " rho"),   # lexical near-dup of 0
            (2, "totally different words entirely here now friends"),
        ],
        ["doc_id", "text"],
    )
    embeds = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),  # semantically ORTHOGONAL to 0
            (2, [0.0, 0.0, 1.0]),
        ],
        ["vec_id", "embedding"],
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.crossmodal_dedup(docs, embeds).collect()
    }
    assert (0, 1) in got            # lexical candidate proposed
    assert not got[(0, 1)]["confirmed"]  # embedding check refutes it
    # aligned embeddings confirm
    embeds2 = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.99, 0.01, 0.0]), (2, [0.0, 0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    got2 = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.crossmodal_dedup(docs, embeds2).collect()
    }
    assert got2[(0, 1)]["confirmed"]


def test_tfidf_keywords_rank_common_terms_low(spark):
    from duckdb_nsql_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (0, "common common apple apple apple"),
            (1, "common banana banana"),
            (2, "common cherry"),
        ],
        ["doc_id", "text"],
    )
    out = text_ops.tfidf_keywords(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' appears in every doc -> idf ln(1)=0 -> never the top term
    assert top == {0: "apple", 1: "banana", 2: "cherry"}
    assert all(r["rank"] == 1 for r in out)


def test_ngram_novelty_keep_first_semantics(spark):
    from duckdb_nsql_spark.operators import text as text_ops

    a = "one two three four five six"
    df = spark.createDataFrame(
        [(0, a), (1, a), (2, "seven eight nine ten eleven twelve")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in text_ops.ngram_novelty(df).collect()}
    assert got[0]["novelty"] == 1.0   # first owner of all its grams
    assert got[1]["novelty"] == 0.0   # verbatim repeat, zero novel
    assert got[2]["novelty"] == 1.0
    assert got[1]["n_grams"] == got[0]["n_grams"]


def test_kanon_release_gate(spark):
    from duckdb_nsql_spark.operators import text as text_ops

    rows = [(i, "en", "big") for i in range(6)] + [(100, "zh", "rare")]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source"])
    got = {r["doc_id"]: r for r in text_ops.kanon_release(df, k=5).collect()}
    assert all(got[i]["released"] for i in range(6))
    assert got[0]["group_n"] == 6
    assert not got[100]["released"] and got[100]["group_n"] == 1
    assert len(got) == 7  # suppressed rows stay auditable


def test_sessionize_gap_splits(spark):
    from datetime import datetime

    from duckdb_nsql_spark.operators import asof as asof_ops

    T = datetime
    rows = [
        # user 1: two events 10 min apart, then a 31-min gap
        (1, 1, T(2024, 1, 1, 10, 0, 0)),
        (2, 1, T(2024, 1, 1, 10, 10, 0)),
        (3, 1, T(2024, 1, 1, 10, 41, 0, 500)),   # 31m0.0005s later
        # user 2: single event
        (4, 2, T(2024, 1, 1, 9, 0, 0)),
        # user 3: exactly 30:00.000000 gap is NOT a split (> rule)
        (5, 3, T(2024, 1, 1, 8, 0, 0)),
        (6, 3, T(2024, 1, 1, 8, 30, 0)),
        # user 3 again: 30:00.000001 IS a split (sub-second exactness)
        (7, 3, T(2024, 1, 1, 9, 0, 0, 1)),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in asof_ops.sessionize(df, gap_minutes=30).collect()
    }
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 2)]["n_events"] == 1
    assert out[(2, 1)]["n_events"] == 1
    assert out[(3, 1)]["n_events"] == 2      # exact 30:00 gap stays
    assert out[(3, 2)]["n_events"] == 1      # +1 microsecond splits
    assert out[(1, 1)]["duration_us"] == 600_000_000


def test_dp_histogram_mechanism(spark):
    from duckdb_nsql_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(90)],
        ["doc_id", "lang"],
    )
    a = {r["lang"]: r for r in sampling.dp_histogram(df).collect()}
    b = {r["lang"]: r for r in sampling.dp_histogram(df).collect()}
    assert a.keys() == {"en", "de"}
    for lang in a:
        assert a[lang]["noise"] == b[lang]["noise"]  # replay-stable
        assert abs(a[lang]["noisy_n"] - (a[lang]["n"] + a[lang]["noise"])) < 1e-9
        assert a[lang]["noise"] != 0.0
    # epsilon scales the noise linearly (same uniform draw; the output
    # rounds to 4dp AFTER scaling, so allow one output-rounding ulp)
    half = {r["lang"]: r for r in sampling.dp_histogram(df, epsilon=0.5).collect()}
    for lang in a:
        assert abs(half[lang]["noise"] - 2 * a[lang]["noise"]) < 2e-4


# ------------------------------------------------- hot-shingle guards


def test_ngram_jaccard_hot_shingle_guard_default_on(spark):
    """Degenerate corpus: every document shares the same stop-shingle
    run, so the inverted-index join would go quadratic in that bucket
    at scale. The max_df guard is DEFAULT-ON (r9 verdict: the guard
    existed but default-off protects nobody); this pins (a) the default,
    (b) that hot shingles are dropped from the join input (bounded
    per-bucket fan-in), and (c) that genuinely-similar pairs whose
    overlap is NOT stop-shingles still come out with their true
    pre-drop Jaccard denominators."""
    import inspect

    assert inspect.signature(dedup.ngram_jaccard_pairs).parameters[
        "max_df"
    ].default == 1000
    assert inspect.signature(dedup.shingle_containment).parameters[
        "max_df"
    ].default == 1000

    stop = "of the and in all cases"  # 4 hot shingles per doc
    rows = [(i, f"{stop} unique tail number {i} content") for i in range(20)]
    # one true near-dup pair whose overlap is its OWN text, not the run
    rows += [
        (100, "quantum flux capacitor panel alpha beta gamma delta"),
        (101, "quantum flux capacitor panel alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    cap = 5
    out = dedup.ngram_jaccard_pairs(df, threshold=0.5, max_df=cap).collect()
    found = {(r.id_a, r.id_b): r.jaccard for r in out}
    # the 20 stop-run docs pair only through hot shingles -> suppressed
    assert all(p == (100, 101) for p in found)
    # the true duplicate survives at jaccard 1.0 (sizes are pre-drop)
    assert found[(100, 101)] == 1.0

    # bounded per-bucket join input: replay the guard's surviving
    # (doc, shingle) rows and check no shingle exceeds the cap
    base = df.select(
        F.col("doc_id"), dedup.shingles(F.col("text")).alias("shs")
    )
    sh = base.select("doc_id", F.explode("shs").alias("shingle"))
    dfreq = sh.groupBy("shingle").count()
    surviving = dfreq.filter(F.col("count") <= cap)
    hot = dfreq.filter(F.col("count") > cap)
    assert hot.count() >= 4  # the fixture IS degenerate
    assert surviving.agg(F.max("count")).first()[0] <= cap


def test_shingle_containment_hot_shingle_guard(spark):
    """Same degeneracy for the containment pass: the quote-in-document
    pair (low Jaccard, high one-way containment) must survive the
    default-on guard while stop-shingle-only pairs are suppressed, and
    surviving scores keep their full-size denominators."""
    stop = "of the and in all cases"
    rows = [(i, f"{stop} unique tail number {i} content") for i in range(20)]
    quote = "quantum flux capacitor panel alpha beta"
    rows += [
        (200, quote),
        (201, quote + " embedded inside a much longer host document body"
                      " with plenty of additional surrounding prose"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    out = dedup.shingle_containment(df, threshold=0.8, max_df=5).collect()
    found = {(r.id_a, r.id_b): r for r in out}
    assert all(p == (200, 201) for p in found)
    r = found[(200, 201)]
    # containment of the quote in the host is 1.0; n_a is the quote's
    # FULL shingle count (pre-drop denominator)
    assert r.c_ab == 1.0
    assert r.n_a == 4  # 6 words -> 4 word-3-gram shingles


# ------------------------------------------------------- minhash hash modes


def test_minhash_xxhash_mode_matches_md5_on_clear_structure(spark):
    """The documented scale seam, now a flag: hash='xxhash64' runs the
    all-JVM signature (no Python workers) and must find the SAME
    candidate pairs as the replayable md5 UDF wherever the duplicate
    structure is clear — exact duplicates and one-word edits pair, and
    unrelated documents never do, under either hash family."""
    rows = []
    # 5 groups of 3 near-identical docs (id, id+1 exact dup, id+2 one
    # word changed) with DISJOINT per-group vocabulary (so no true
    # cross-group similarity exists), plus 5 unrelated documents
    for g in range(5):
        words = [f"g{g}w{i}" for i in range(40)]
        text = (" ".join(words) + " ") * 4 + f"marker{g} tail{g}"
        rows.append((g * 10, text))
        rows.append((g * 10 + 1, text))
        rows.append(
            (g * 10 + 2, text.replace(f"g{g}w7", f"g{g}edit", 1))
        )
    vocab = [
        "ostrich quantum flannel borough zealot crimson",
        "marble twelve hexagon umbra violet saxophone",
        "pepper gadget yonder krypton dune saffron",
        "walnut cipher gorge thimble ragged monsoon",
        "beacon fjord lattice oxbow parka zephyr",
    ]
    for i, words in enumerate(vocab):
        rows.append((100 + i, (words + " ") * 30 + f"solo {i}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def pairset(mode):
        return {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_candidates(docs, hash_mode=mode).collect()
        }

    md5_pairs = pairset("md5")
    xx_pairs = pairset("xxhash64")
    expected = {
        (g * 10 + a, g * 10 + b)
        for g in range(5)
        for a, b in [(0, 1), (0, 2), (1, 2)]
    }
    assert md5_pairs == expected
    assert xx_pairs == expected


def test_minhash_xxhash_mode_is_all_jvm(docs):
    # the scale mode must not schedule Python workers: no pythonUDF /
    # ArrowEvalPython in the executed plan
    df = dedup.minhash_lsh_candidates(docs, hash_mode="xxhash64")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "pythonUDF" not in plan, plan


def test_minhash_unknown_hash_mode_rejected(docs):
    with pytest.raises(ValueError, match="md5 | xxhash64"):
        dedup.minhash_lsh_candidates(docs, hash_mode="sha1")


def test_minhash_band_digest_is_unhex_of_oracle_hex(spark):
    """Round-12 store compaction: the band UDF emits raw md5 digest()
    bytes. Pin the bijection the oracle relies on — for each document
    the stored bandsig must be byte-for-byte bytes.fromhex() of the md5
    HEX the DuckDB oracle computes over the same '|'-joined signature
    slice (so candidate-pair equality is untouched by the compaction)."""
    import hashlib

    from duckdb_nsql_spark.operators.dedup import (
        DEFAULT_BANDS,
        DEFAULT_NUM_PERM,
        _py_shingles,
        minhash_bands_udf,
    )
    from duckdb_nsql_spark.operators.text import normalize_text

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "short",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id",
            minhash_bands_udf()(normalize_text(F.col("text"))).alias("b"),
        ).collect()
    }
    # python twin of the construction, ending in HEX like the oracle SQL
    norm = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    rws = DEFAULT_NUM_PERM // DEFAULT_BANDS
    for i in rows:
        sh = _py_shingles(norm[i])
        sig = [
            min(hashlib.md5(f"{p}:{s}".encode()).hexdigest() for s in sh)
            for p in range(DEFAULT_NUM_PERM)
        ]
        expect_hex = [
            hashlib.md5(
                "|".join(sig[b * rws : (b + 1) * rws]).encode()
            ).hexdigest()
            for b in range(DEFAULT_BANDS)
        ]
        got = [bytes(x) for x in rows[i]]
        assert got == [bytes.fromhex(h) for h in expect_hex]


def test_minhash_md5_banded_plan_single_projection(docs):
    """Round-12 optimization (assertion tightened per round-12 advice):
    the md5 banded signature table builds in ONE select — the generator
    takes the UDF call directly and digest-width signatures need no
    unhex re-projection — so its OWN pre-persistence physical plan
    contains exactly one ArrowEvalPython node and no unhex call."""
    import re

    banded = dedup._banded_signatures(docs, "text", "doc_id", 16, 4, "md5")
    plan = banded._sc._jvm.PythonSQLUtils.explainString(
        banded._jdf.queryExecution(), "formatted"
    )
    # one numbered operator entry == one ArrowEvalPython node
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1, plan
    assert "BatchEvalPython" not in plan, plan
    assert "unhex" not in plan.lower(), plan
