"""SemDeDup-style semantic dedup (r4 verdict task #6): determinism,
planted-duplicate recovery on a constructed corpus, and the subset
relationship to the exact all-pairs cosine operator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.operators import ann, curation, dedup
from ydb_vector_search_demo_spark.sources.tables import load_table

DIM = 16
N_BASE = 40
N_DUPS = 12  # planted near-duplicates of the first N_DUPS base vectors


@pytest.fixture(scope="module")
def planted(spark):
    """Seeded corpus: N_BASE well-separated base vectors (ids 0..39)
    plus N_DUPS planted near-duplicates (ids 1000+i, a copy of base i
    with relative noise ~1e-3 — far inside eps, and far from any other
    base vector)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(N_BASE)]
    for i in range(N_DUPS):
        noisy = base[i] + rng.normal(scale=1e-3, size=DIM)
        rows.append((1000 + i, noisy.tolist()))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


@pytest.fixture(scope="module")
def planted_index(planted):
    index = ann.build_ivf_index(planted, k_clusters=4)
    yield index
    index.assigned.unpersist()


def test_planted_duplicates_recovered(planted, planted_index):
    decision = curation.semantic_dedup(
        planted, planted_index.centroids, eps=0.01
    ).collect()
    by_id = {r.vec_id: r for r in decision}
    assert len(by_id) == N_BASE + N_DUPS
    for i in range(N_DUPS):
        dup = by_id[1000 + i]
        src = by_id[i]
        # every planted dup clusters with its source; the source (min
        # id) is the kept representative, the dup drops
        assert dup.cluster_id == src.cluster_id == i, (i, dup, src)
        assert not dup.is_canonical and src.is_canonical
        assert dup.cluster_size == 2
    # untouched base vectors all survive as singletons
    for i in range(N_DUPS, N_BASE):
        assert by_id[i].is_canonical and by_id[i].cluster_size == 1


def test_semantic_dedup_deterministic(planted, planted_index):
    a = sorted(
        map(tuple, curation.semantic_dedup(
            planted, planted_index.centroids, eps=0.01
        ).collect())
    )
    b = sorted(
        map(tuple, curation.semantic_dedup(
            planted, planted_index.centroids, eps=0.01
        ).collect())
    )
    assert a == b


def test_semantic_pairs_subset_of_exact_pairs(spark):
    """Cell bucketing can only MISS pairs (boundary straddlers), never
    invent them: the bucketed pair list is a subset of the exact
    all-pairs cosine operator at the same threshold, with identical
    similarity values on shared pairs."""
    embs = load_table(spark, SF_SMOKE, "embeddings")
    index = ann.build_ivf_index(embs, k_clusters=4)
    try:
        eps = 0.3
        semantic = {
            (r.a, r.b): r.cos_sim
            for r in dedup.semantic_near_dup_pairs(
                embs, index.centroids, eps=eps
            ).collect()
        }
        exact = {
            (r.a, r.b): r.cos_sim
            for r in dedup.cosine_near_dup_pairs(
                embs, threshold=1.0 - eps
            ).collect()
        }
        assert set(semantic) <= set(exact)
        for k, v in semantic.items():
            assert v == exact[k]
    finally:
        index.assigned.unpersist()


def test_catalog_stats_row(spark):
    from ydb_vector_search_demo_spark.plans.catalog import QUERIES

    row = QUERIES["dedup_semantic_stats"](spark, SF_SMOKE).collect()
    assert len(row) == 1
    r = row[0]
    n = load_table(spark, SF_SMOKE, "embeddings").count()
    assert r.n_vectors == n
    assert 0 <= r.n_dropped < n
    assert r.max_cluster_size >= 1


def test_bucketed_components_equal_star_method(spark, sf_smoke):
    """The one-shuffle bucket-wise union-find must produce the exact
    decision table the global large-star/small-star method does on the
    cell-local SemDeDup graph."""
    from ydb_vector_search_demo_spark.operators import ann, curation, dedup
    from ydb_vector_search_demo_spark.sources.tables import load_table

    embs = load_table(spark, sf_smoke, "embeddings")
    index = ann.build_ivf_index(embs, k_clusters=8)
    try:
        eps = 0.8  # loose threshold → non-trivial clusters on testdata
        bucketed_pairs = dedup.semantic_near_dup_pairs_bucketed(
            embs, index.centroids, eps=eps
        )
        flat_pairs = dedup.semantic_near_dup_pairs(embs, index.centroids, eps=eps)
        fast = curation.dedup_clusters_bucketed(
            embs.select("vec_id"), bucketed_pairs, id_col="vec_id"
        )
        star = curation.dedup_clusters(
            embs.select("vec_id"), flat_pairs, id_col="vec_id"
        )
        f = sorted(tuple(r) for r in fast.collect())
        s = sorted(tuple(r) for r in star.collect())
        assert f == s
        # sanity: threshold actually formed clusters
        assert any(r[2] > 1 for r in f)
    finally:
        index.assigned.unpersist()


def test_bucketed_components_chain_within_bucket(spark):
    """Transitive chains inside a bucket collapse to the min id even
    when the endpoints are not directly paired."""
    from ydb_vector_search_demo_spark.operators import curation

    pairs = spark.createDataFrame(
        [(0, 5, 6), (0, 6, 7), (0, 7, 8), (1, 20, 30)],
        "centroid_id INT, a LONG, b LONG",
    )
    comp = {
        r["node"]: r["cluster_id"]
        for r in curation.bucketed_components(pairs).collect()
    }
    assert comp == {5: 5, 6: 5, 7: 5, 8: 5, 20: 20, 30: 20}


def _vec(base, jitter, dim=8):
    v = [0.0] * dim
    v[base] = 1.0
    v[(base + 1) % dim] = jitter
    return v


def test_incremental_semantic_dedup_planted(spark):
    """Constructed corpus: batch rows that duplicate corpus rows drop
    with matched_corpus and the corpus id; batch-internal duplicates
    collapse to min-id; novel rows survive as canonical."""
    from ydb_vector_search_demo_spark.operators import dedup

    # centroids at axes 0 and 4 -> two cells
    centroids = [_vec(0, 0.0), _vec(4, 0.0)]
    corpus = spark.createDataFrame(
        [(0, _vec(0, 0.0)), (1, _vec(4, 0.0))],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (10, _vec(0, 0.05)),   # near corpus 0 -> drop, matched
            (11, _vec(4, 0.05)),   # near corpus 1 -> drop, matched
            (12, _vec(0, 0.9)),    # novel in cell 0
            (13, _vec(0, 0.91)),   # near 12 -> in-batch dup of 12
            (14, _vec(4, 0.9)),    # novel in cell 1
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in dedup.incremental_semantic_dedup(
            batch, corpus, centroids, eps=0.05
        ).collect()
    }
    assert len(out) == 5
    assert out[10]["matched_corpus"] and out[10]["cluster_id"] == 0
    assert not out[10]["is_canonical"]
    assert out[11]["matched_corpus"] and out[11]["cluster_id"] == 1
    assert out[12]["is_canonical"] and out[12]["cluster_id"] == 12
    assert not out[13]["is_canonical"] and out[13]["cluster_id"] == 12
    assert not out[13]["matched_corpus"]
    assert out[14]["is_canonical"] and out[14]["cluster_id"] == 14


def test_incremental_semantic_matches_batch_when_no_bridges(spark, sf_smoke):
    """On the natural testdata at a tight eps (no cross-cluster
    bridges, corpus itself dup-free at that eps), the incremental kept
    set over a split corpus equals the batch decision over the union."""
    from ydb_vector_search_demo_spark.operators import ann, curation, dedup
    from ydb_vector_search_demo_spark.sources.tables import load_table

    embs = load_table(spark, sf_smoke, "embeddings")
    index = ann.build_ivf_index(embs, k_clusters=8)
    try:
        eps = 0.35
        full = curation.semantic_dedup(embs, index.centroids, eps=eps)
        corpus = embs.filter(F.col("vec_id") < 250)
        # precondition for equivalence: the corpus half must be
        # internally duplicate-free at this eps
        corpus_dec = curation.semantic_dedup(corpus, index.centroids, eps=eps)
        assert corpus_dec.filter(~F.col("is_canonical")).count() == 0
        batch = embs.filter(F.col("vec_id") >= 250)
        inc = dedup.incremental_semantic_dedup(
            batch, corpus, index.centroids, eps=eps
        )
        kept_inc = {r["vec_id"] for r in inc.filter("is_canonical").collect()} | {
            r["vec_id"] for r in corpus.select("vec_id").collect()
        }
        kept_full = {
            r["vec_id"] for r in full.filter("is_canonical").collect()
        }
        assert kept_inc == kept_full
    finally:
        index.assigned.unpersist()


def test_cross_shard_semantic_dedup_laws(spark):
    """dedup.cross_shard_semantic_dedup on a planted 3-d corpus
    (centroids (1,0,0)/(0,1,0), eps=0.05): (a) a cross-shard chain
    A(s0)-B(s1)-C(s2) with A~B, B~C but A!~C merges transitively to
    the (shard, id)-minimum canonical; (b) a SAME-shard near-dup pair
    never merges (frozen shard decisions); (c) a near-dup pair split
    across CELLS never merges (the SemDeDup cell contract); (d)
    precedence: the lower (shard, id) wins even when its plain id is
    larger; (e) append monotonicity: re-running with shard 2 added
    never re-points a shard-0/1 row's canonical at shard 2."""
    import math

    from ydb_vector_search_demo_spark.operators.dedup import (
        cross_shard_semantic_dedup,
    )

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    a17, a34 = math.radians(17), math.radians(34)
    rows = [
        # (a) chain in cell 0: A=0 deg, B=17 deg, C=34 deg
        (0, 1, [1.0, 0.0, 0.0]),
        (1, 11, [math.cos(a17), math.sin(a17), 0.0]),
        (2, 21, [math.cos(a34), math.sin(a34), 0.0]),
        # (b) same-shard near-dups in cell 1
        (1, 2, [0.001, 1.0, 0.0]),
        (1, 3, [0.002, 1.0, 0.0]),
        # (c) near-dups straddling the cell boundary (z-heavy so
        # neither is within eps of the chain or precedence vectors)
        (0, 5, [0.6, 0.58, 0.55]),
        (1, 6, [0.58, 0.6, 0.55]),
        # (d) precedence pair in cell 1, z-leaning: (1,9) < (2,4)
        (2, 4, [0.0, 0.6, 0.8]),
        (1, 9, [0.0, 0.61, 0.79]),
    ]
    df = spark.createDataFrame(
        rows, "shard_id LONG, vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    got = {
        (r["shard_id"], r["vec_id"]): (
            r["global_shard_id"], r["global_id"], r["is_global_canonical"]
        )
        for r in cross_shard_semantic_dedup(df, cents, eps=0.05).collect()
    }
    assert len(got) == len(rows)
    # (a) transitive chain -> (0, 1) canonical for all three
    assert got[(0, 1)] == (0, 1, True)
    assert got[(1, 11)] == (0, 1, False)
    assert got[(2, 21)] == (0, 1, False)
    # (b) same-shard pair untouched
    assert got[(1, 2)] == (1, 2, True)
    assert got[(1, 3)] == (1, 3, True)
    # (c) cross-cell pair untouched
    assert got[(0, 5)] == (0, 5, True)
    assert got[(1, 6)] == (1, 6, True)
    # (d) lower (shard, id) wins despite the larger plain id
    assert got[(1, 9)] == (1, 9, True)
    assert got[(2, 4)] == (1, 9, False)

    # (e) append monotonicity: without shard 2, then with it — no
    # shard-0/1 row may ever point at a shard-2 canonical
    first = {
        (r["shard_id"], r["vec_id"]): (r["global_shard_id"], r["global_id"])
        for r in cross_shard_semantic_dedup(
            df.filter("shard_id < 2"), cents, eps=0.05
        ).collect()
    }
    for (sh, vid), (gsh, gid, _) in got.items():
        if sh < 2:
            assert gsh < 2, "appended shard stole a canonical"
            assert first[(sh, vid)] == (gsh, gid), (
                "appending a shard changed an existing decision"
            )
