"""Flat-IVF drift maintenance + atomic store publication (r4 verdict
tasks #2 and #4): the tree layout's skewed-append → detect → rebalance
loop replayed on the flat centroid-partitioned store, and the
manifest/current-pointer protocol that makes the rebuild swap atomic
for concurrent readers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark import stores
from ydb_vector_search_demo_spark.operators import ann
from ydb_vector_search_demo_spark.sources.tables import load_table


def test_ivf_drift_detection_and_rebalance(spark, tmp_path):
    """The tree maintenance contract on the flat layout: skewed appends
    trip the drift report at the shared skew_ratio-4.0 threshold;
    rebalance_ivf rebuilds with zero row loss and lower skew."""
    embs = load_table(spark, SF_SMOKE, "embeddings")
    index = ann.build_ivf_index(embs, k_clusters=8)
    path = str(tmp_path / "ivf_drift")
    ann.write_ivf_partitioned(index, path)
    balanced = ann.ivf_drift_report(spark, path).collect()[0]

    # skewed append: clone ONE cell's vectors 6x with fresh ids — they
    # route back to the same cell by construction
    cell = spark.read.parquet(path).limit(1).collect()[0]
    one_cell = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id") == cell.centroid_id)
        .select("vec_id", "embedding")
    )
    for i in range(6):
        clones = one_cell.select(
            (F.col("vec_id") + 100000 * (i + 1)).alias("vec_id"), "embedding"
        )
        ann.ivf_append(index.centroids, clones, path)

    drifted = ann.ivf_drift_report(spark, path).collect()[0]
    assert drifted.skew_ratio > balanced.skew_ratio
    assert drifted.needs_rebalance, drifted

    # stats carry real byte counts per cell
    stats = ann.ivf_leaf_stats(spark, path).collect()
    assert all(r.leaf_bytes > 0 for r in stats)
    assert sum(r.n_rows for r in stats) == drifted.total_rows

    # balanced store: no-op (returns None, store untouched)
    pre = ann.rebalance_ivf(
        spark, path, str(tmp_path / "never"),
        skew_threshold=drifted.skew_ratio + 1,
    )
    assert pre is None

    out = str(tmp_path / "ivf_rebalanced")
    new_index = ann.rebalance_ivf(spark, path, out, k_clusters=8)
    assert new_index is not None
    after = ann.ivf_drift_report(spark, out).collect()[0]
    assert after.total_rows == drifted.total_rows  # nothing lost
    assert after.skew_ratio < drifted.skew_ratio
    new_index.assigned.unpersist()
    index.assigned.unpersist()


def test_publish_store_roundtrip_and_history(spark, tmp_path):
    root = str(tmp_path / "store_root")
    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.range(10).write.parquet(v1)
    spark.range(20).write.parquet(v2)

    assert stores.current_store_path(spark, root) is None
    assert stores.publish_store(spark, root, v1) == 1
    assert stores.current_store_path(spark, root) == v1
    assert stores.read_current_store(spark, root).count() == 10

    assert stores.publish_store(spark, root, v2) == 2
    assert stores.read_current_store(spark, root).count() == 20
    assert stores.store_history(spark, root) == [(1, v1), (2, v2)]

    # rollback = republish the old path
    assert stores.publish_store(spark, root, v1) == 3
    assert stores.read_current_store(spark, root).count() == 10


def test_reader_resolving_mid_swap_sees_old_or_new(spark, tmp_path):
    """The r4-verdict 'done' bar: a reader resolving the store while a
    publish is in flight sees the previous complete version (manifest
    not yet renamed) or the new one — never a partial state. Simulated
    by interleaving resolutions with the publish's own steps: the temp
    manifest is invisible to resolution by construction (prefix
    filter), so the only observable states are seq N and seq N+1."""
    root = str(tmp_path / "swap_root")
    v1 = str(tmp_path / "sv1")
    v2 = str(tmp_path / "sv2")
    spark.range(5).write.parquet(v1)
    spark.range(6).write.parquet(v2)
    stores.publish_store(spark, root, v1)

    # mid-swap state: the new manifest exists only under its temp name
    jvm, root_hpath, fs = stores._fs(spark, root)
    tmp_manifest = jvm.org.apache.hadoop.fs.Path(
        root, "_tmp-" + stores._manifest_name(2) + ".12345"
    )
    stores._write_file(
        jvm, fs, tmp_manifest, b'{"path": "%s"}' % v2.encode()
    )
    assert stores.current_store_path(spark, root) == v1, (
        "temp manifest must be invisible to readers"
    )
    # the swap completes (atomic rename) — readers now see v2
    final = jvm.org.apache.hadoop.fs.Path(root, stores._manifest_name(2))
    assert fs.rename(tmp_manifest, final)
    assert stores.current_store_path(spark, root) == v2


def test_publish_collision_retries_next_seq(spark, tmp_path):
    """Two publishers racing the same sequence number: the loser's
    rename fails (destination exists) and it retries at the next
    number — publishes serialize without a lock service."""
    root = str(tmp_path / "race_root")
    v1 = str(tmp_path / "rv1")
    v2 = str(tmp_path / "rv2")
    spark.range(3).write.parquet(v1)
    spark.range(4).write.parquet(v2)
    stores.publish_store(spark, root, v1)

    # pre-plant manifest-2 (the "other publisher" winning the race),
    # then publish: it must land at seq 3, not clobber seq 2
    jvm, root_hpath, fs = stores._fs(spark, root)
    planted = jvm.org.apache.hadoop.fs.Path(root, stores._manifest_name(2))
    stores._write_file(jvm, fs, planted, b'{"path": "%s"}' % v1.encode())

    seq = stores.publish_store(spark, root, v2)
    assert seq == 3
    assert stores.current_store_path(spark, root) == v2
    assert [s for s, _ in stores.store_history(spark, root)] == [1, 2, 3]


def test_rebalance_publish_end_to_end(spark, tmp_path):
    """The full maintenance loop the verdict asked for: build → publish
    → skewed append → drift detected → rebalance to a NEW path →
    publish → readers see the rebalanced store, zero row loss."""
    embs = load_table(spark, SF_SMOKE, "embeddings")
    index = ann.build_ivf_index(embs, k_clusters=8)
    root = str(tmp_path / "ivf_root")
    v1 = str(tmp_path / "ivf_v1")
    ann.write_ivf_partitioned(index, v1)
    stores.publish_store(spark, root, v1)
    n0 = stores.read_current_store(spark, root).count()

    cell = spark.read.parquet(v1).limit(1).collect()[0]
    one_cell = (
        spark.read.parquet(v1)
        .filter(F.col("centroid_id") == cell.centroid_id)
        .select("vec_id", "embedding")
    )
    for i in range(6):
        ann.ivf_append(
            index.centroids,
            one_cell.select(
                (F.col("vec_id") + 100000 * (i + 1)).alias("vec_id"), "embedding"
            ),
            v1,
        )
    total = stores.read_current_store(spark, root).count()

    v2 = str(tmp_path / "ivf_v2")
    new_index = ann.rebalance_ivf(spark, v1, v2, k_clusters=8)
    assert new_index is not None
    stores.publish_store(spark, root, v2)
    assert stores.read_current_store(spark, root).count() == total
    assert total > n0
    new_index.assigned.unpersist()
    index.assigned.unpersist()


def test_snapshot_read_and_rollback(spark, tmp_path):
    """Time-travel surface (r5): read_store_at pins an exact published
    version; rollback_store publishes FORWARD to an old path (history
    append-only)."""
    root = str(tmp_path / "tt_root")
    v1 = str(tmp_path / "tt_v1")
    v2 = str(tmp_path / "tt_v2")
    spark.range(10).write.parquet(v1)
    spark.range(20).write.parquet(v2)
    stores.publish_store(spark, root, v1)
    stores.publish_store(spark, root, v2)

    assert stores.read_store_at(spark, root, 1).count() == 10
    assert stores.read_store_at(spark, root, 2).count() == 20
    with pytest.raises(ValueError, match="no manifest 7"):
        stores.store_path_at(spark, root, 7)

    new_seq = stores.rollback_store(spark, root, 1)
    assert new_seq == 3
    assert stores.current_store_path(spark, root) == v1
    # forensics intact: the rolled-back-over version is still readable
    assert stores.read_store_at(spark, root, 2).count() == 20


def test_vacuum_drops_unreferenced_keeps_referenced_and_external(spark, tmp_path):
    """vacuum_store deletes only data dirs under the root that no
    retained manifest references; a path kept live by a later rollback
    survives, and external dirs are never deleted."""
    import os

    root = str(tmp_path / "vac_root")
    os.makedirs(root, exist_ok=True)
    in1 = os.path.join(root, "v1")
    in2 = os.path.join(root, "v2")
    in3 = os.path.join(root, "v3")
    ext = str(tmp_path / "external_v")
    spark.range(5).write.parquet(in1)
    spark.range(6).write.parquet(in2)
    spark.range(7).write.parquet(in3)
    spark.range(8).write.parquet(ext)

    stores.publish_store(spark, root, in1)   # seq 1
    stores.publish_store(spark, root, ext)   # seq 2 (external)
    stores.publish_store(spark, root, in2)   # seq 3
    stores.rollback_store(spark, root, 1)    # seq 4 -> in1 again
    stores.publish_store(spark, root, in3)   # seq 5

    out = stores.vacuum_store(spark, root, keep_last=2)  # keep seq 4, 5
    # in1 is referenced by retained seq 4 → kept; ext external → kept;
    # in2 unreferenced and under root → removed
    assert out["removed"] == [in2]
    assert in1 in out["kept"] and ext in out["kept"]
    assert not os.path.exists(in2)
    assert os.path.exists(in1) and os.path.exists(ext)
    # history now starts at seq 4
    assert [s for s, _ in stores.store_history(spark, root)] == [4, 5]
    assert stores.read_store_at(spark, root, 4).count() == 5
    with pytest.raises(ValueError):
        stores.read_store_at(spark, root, 2)
    # current store untouched throughout
    assert stores.read_current_store(spark, root).count() == 7


def test_vacuum_keep_last_validation(spark, tmp_path):
    root = str(tmp_path / "vac_val")
    with pytest.raises(ValueError, match="keep_last"):
        stores.vacuum_store(spark, root, keep_last=0)


def test_compaction_publish_roundtrip_is_content_invisible(spark, tmp_path):
    """r11 wave 9: the compaction lifecycle (16 small files -> publish
    v0 -> compact to 1 -> publish v1) preserves CONTENT exactly through
    the manifest pointer — and time travel back to v0 still reads the
    pre-compaction data (old readers are never broken mid-swap)."""
    import os

    from ydb_vector_search_demo_spark import stores
    from ydb_vector_search_demo_spark.sources.tables import compact_parquet

    df = spark.range(0, 500).selectExpr(
        "id", "concat('text-', id) AS text"
    )
    root = str(tmp_path / "store")
    v0, v1 = os.path.join(root, "v0"), os.path.join(root, "v1")
    os.makedirs(root, exist_ok=True)
    df.repartition(16).write.parquet(v0)
    stores.publish_store(spark, root, v0)
    n_out = compact_parquet(spark, v0, v1, target_file_bytes=1 << 40)
    assert n_out == 1
    stores.publish_store(spark, root, v1)

    nf = lambda p: sum(
        1 for f in os.listdir(p)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    assert nf(v0) == 16 and nf(v1) == 1

    want = sorted(tuple(r) for r in df.collect())
    cur = sorted(
        tuple(r) for r in stores.read_current_store(spark, root).collect()
    )
    assert cur == want
    seqs = [s for s, _ in stores.store_history(spark, root)]
    assert len(seqs) == 2
    old = sorted(
        tuple(r)
        for r in stores.read_store_at(spark, root, seqs[0]).collect()
    )
    assert old == want
