"""Embedding near-dup operator: planted duplicates must be found; cluster
blocking must bound block sizes and still catch the plants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.dedup import (
    embedding_near_dup_by_cluster,
    embedding_near_dup_by_column,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """2000 random vectors + 20 planted near-duplicate pairs."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(2000, 32)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(2000):
        rows.append((i, base[i].tolist(), i % 4))
    planted = []
    for j in range(20):
        src = j * 50
        dup = base[src] + rng.normal(scale=0.01, size=32).astype(np.float32)
        dup /= np.linalg.norm(dup)
        rows.append((10_000 + j, dup.tolist(), src % 4))
        planted.append((src, 10_000 + j))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, grp int")
    return df.localCheckpoint(eager=True), planted


def test_column_blocking_finds_planted_pairs(corpus):
    df, planted = corpus
    found = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in embedding_near_dup_by_column(df, 0.98, "grp").collect()
    }
    assert set(planted) <= found
    # random 32-dim pairs essentially never reach cos >= 0.98
    assert len(found) <= len(planted) + 5


def test_column_blocking_with_string_ids(spark):
    """Round-2 verdict: the pair kernel's output schema must follow the id
    column's type — VectorStore ids are strings/uuids, not longs."""
    rng = np.random.default_rng(3)
    v = rng.normal(size=32)
    v /= np.linalg.norm(v)
    w = v + rng.normal(scale=0.005, size=32)
    w /= np.linalg.norm(w)
    u = rng.normal(size=32)
    u /= np.linalg.norm(u)
    df = spark.createDataFrame(
        [("doc-a", v.tolist(), "g"), ("doc-b", w.tolist(), "g"),
         ("doc-c", u.tolist(), "g")],
        "id string, embedding array<float>, grp string",
    )
    out = embedding_near_dup_by_column(df, 0.98, "grp", id_col="id").collect()
    assert {(r.id_a, r.id_b) for r in out} == {("doc-a", "doc-b")}
    assert all(isinstance(r.id_a, str) for r in out)


def test_cluster_blocking_bounds_blocks_and_finds_pairs(corpus):
    df, planted = corpus
    out = embedding_near_dup_by_cluster(df, 0.98, target_block_size=128, seed=42)
    found = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in out.collect()
    }
    # IVF recall caveat: a plant can straddle a Voronoi boundary; demand
    # the vast majority are caught
    caught = len(found & set(planted))
    assert caught >= len(planted) * 0.8, f"caught only {caught}/{len(planted)}"


def test_cluster_block_sizes_are_bounded(spark, corpus):
    from mlvectordb_spark.operators.ann import IVFIndex

    df, _ = corpus
    n = df.count()
    idx = IVFIndex(n_clusters=max(2, n // 128), seed=42)
    clustered = idx.build(df)
    sizes = [
        r.n for r in clustered.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    ]
    assert max(sizes) < 128 * 6  # KMeans blocks track the target within a small factor


def test_multi_probe_closes_boundary_recall(corpus):
    """probes=2 blocks each vector under its 2 nearest clusters, so a
    planted pair split by a Voronoi boundary still shares a block: recall
    must cover every plant, strictly dominating single-probe, and pairs
    found in both probe blocks must be deduped to one row."""
    df, planted = corpus
    single = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in embedding_near_dup_by_cluster(
            df, 0.98, target_block_size=128, seed=42
        ).collect()
    }
    out = embedding_near_dup_by_cluster(
        df, 0.98, target_block_size=128, seed=42, probes=2
    ).collect()
    multi = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in out}
    assert single & set(planted) <= multi
    assert multi >= set(planted), f"missing {set(planted) - multi}"
    assert len(out) == len(multi)  # cross-block duplicates collapsed


def test_minhash_hot_band_bucket_is_capped(spark):
    """Round-4 verdict #3: 500 exact-identical docs collide in every LSH
    band; the uncapped band join would emit C(500,2)=124 750 pairs. The
    per-band-salted sub-buckets must bound pair work well below quadratic
    while keeping the duplicate group CONNECTED (what min-id-survivor /
    connected-components actually consume)."""
    from mlvectordb_spark.operators.minhash import (
        MINHASH_BAND_CAP,
        band_candidate_pairs,
        bands_from_shingles,
        shingle_table,
    )

    text = "the same exact document text repeated across the whole hot bucket"
    docs = spark.createDataFrame(
        [(i, text) for i in range(500)], "doc_id long, text string"
    )
    banded = bands_from_shingles(shingle_table(docs))
    pairs = band_candidate_pairs(banded).collect()
    n_pairs = len(pairs)
    # bound: per band, ceil(500/64)=8 sub-buckets of ~63 docs -> <= 8*C(63,2)
    # pairs; 4 bands with distinct salts union to < 4x that, far below C(500,2)
    assert n_pairs < 124_750 / 2, n_pairs
    import math
    nb = math.ceil(500 / MINHASH_BAND_CAP)
    per_band_bound = nb * math.comb(2 * MINHASH_BAND_CAP, 2)
    assert n_pairs <= 4 * per_band_bound
    # connectivity: union-find over surviving edges joins all 500 docs
    parent = list(range(500))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(int(r.doc_a)), find(int(r.doc_b))
        if ra != rb:
            parent[ra] = rb
    assert len({find(i) for i in range(500)}) == 1
