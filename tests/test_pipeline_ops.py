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
