"""Atomic store publication: a manifest/current-pointer protocol so
concurrent readers of a rebuilt store see old-or-new, never a
half-swapped directory (r4 verdict task #4).

Every rebuild-style maintenance job in this engine (``ann.rebalance_ivf``
/ ``ann.rebalance_tree``, ``tables.compact_parquet`` /
``compact_partitioned_store``, ``pipeline.rag.compact_store``) writes its
output to a NEW path and leaves the swap to the caller. This module is
that swap, done the way table formats do it (Iceberg/Delta-style
sequence-numbered manifests, simplified to a single pointer):

* a store ROOT directory holds versioned data directories (any names —
  ``v1``, ``rebuild-2024-…``) plus ``manifest-<seq>.json`` files;
* ``publish_store`` writes the next manifest to a temp name and RENAMES
  it into place — rename-to-a-fresh-name is atomic on local FS and
  HDFS, and on stores without atomic rename the manifest still appears
  as a whole file or not at all (it is never written in place);
* readers resolve the HIGHEST sequence number present — a reader racing
  a publish sees either the previous manifest (new one not yet renamed)
  or the new one, both pointing at complete data directories;
* concurrent publishers race on the rename of the same sequence number;
  the loser retries at the next number, so publishes serialize without
  a lock service.

Everything goes through the Hadoop FileSystem API (same contract as
``tables.fs_file_bytes``): metadata-only, works on any Hadoop FS.

Reference analogue: the store-swap step of the reference's (external)
vector store lifecycle — drop/recreate of the YDB table behind
/root/reference/app.py:29-42 — re-expressed as the storage-level
publish a Spark-native store needs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_PREFIX = "manifest-"
_SEQ_DIGITS = 10


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath, hpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )


def _manifest_name(seq: int) -> str:
    return f"{_MANIFEST_PREFIX}{seq:0{_SEQ_DIGITS}d}.json"


def _list_manifest_seqs(jvm, fs, root_path) -> list[int]:
    if not fs.exists(root_path):
        return []
    seqs = []
    for status in fs.listStatus(root_path):
        name = status.getPath().getName()
        if name.startswith(_MANIFEST_PREFIX) and name.endswith(".json"):
            try:
                seqs.append(int(name[len(_MANIFEST_PREFIX) : -len(".json")]))
            except ValueError:
                continue
    return sorted(seqs)


def _write_file(jvm, fs, path, payload: bytes) -> None:
    out = fs.create(path, False)
    try:
        out.write(payload)
    finally:
        out.close()


def _read_file(jvm, fs, path) -> str:
    stream = fs.open(path)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def publish_store(spark: SparkSession, root: str, version_path: str) -> int:
    """Atomically point ``root``'s current-store pointer at
    ``version_path`` (a complete, already-written data directory).
    Returns the published sequence number. Safe against concurrent
    readers (they resolve old-or-new) and concurrent publishers (rename
    collisions retry at the next sequence number)."""
    jvm, root_hpath, fs = _fs(spark, root)
    fs.mkdirs(root_hpath)
    payload = json.dumps({"path": version_path}).encode("utf-8")
    seqs = _list_manifest_seqs(jvm, fs, root_hpath)
    seq = (seqs[-1] + 1) if seqs else 1
    while True:
        tmp = jvm.org.apache.hadoop.fs.Path(
            root, f"_tmp-{_manifest_name(seq)}.{os.getpid()}"
        )
        final = jvm.org.apache.hadoop.fs.Path(root, _manifest_name(seq))
        _write_file(jvm, fs, tmp, payload)
        if fs.rename(tmp, final):
            return seq
        # another publisher won this sequence number: clean up, retry next
        fs.delete(tmp, False)
        seq += 1


def current_store_path(spark: SparkSession, root: str) -> str | None:
    """Resolve the current data directory for ``root``, or None if
    nothing has been published yet. One listing + one small-file read —
    the whole read path is metadata-scale."""
    jvm, root_hpath, fs = _fs(spark, root)
    seqs = _list_manifest_seqs(jvm, fs, root_hpath)
    if not seqs:
        return None
    manifest = jvm.org.apache.hadoop.fs.Path(root, _manifest_name(seqs[-1]))
    return json.loads(_read_file(jvm, fs, manifest))["path"]


def read_current_store(spark: SparkSession, root: str) -> DataFrame:
    """Read the currently-published store as a DataFrame. A reader that
    resolves mid-publish reads the previous complete version; the next
    resolution picks up the new one."""
    path = current_store_path(spark, root)
    if path is None:
        raise ValueError(f"no store published under {root!r}")
    return spark.read.parquet(path)


def store_history(spark: SparkSession, root: str) -> list[tuple[int, str]]:
    """(seq, path) for every retained manifest, oldest first — the
    rollback surface: republish any previous path to roll back, and
    old data directories stay valid until explicitly vacuumed."""
    jvm, root_hpath, fs = _fs(spark, root)
    out = []
    for seq in _list_manifest_seqs(jvm, fs, root_hpath):
        manifest = jvm.org.apache.hadoop.fs.Path(root, _manifest_name(seq))
        out.append((seq, json.loads(_read_file(jvm, fs, manifest))["path"]))
    return out


def store_path_at(spark: SparkSession, root: str, seq: int) -> str:
    """Resolve the data directory a specific published sequence number
    points at — the snapshot-read surface (Iceberg-style time travel,
    simplified to sequence numbers)."""
    jvm, root_hpath, fs = _fs(spark, root)
    if seq not in _list_manifest_seqs(jvm, fs, root_hpath):
        raise ValueError(
            f"no manifest {seq} under {root!r} (vacuumed or never published)"
        )
    manifest = jvm.org.apache.hadoop.fs.Path(root, _manifest_name(seq))
    return json.loads(_read_file(jvm, fs, manifest))["path"]


def read_store_at(spark: SparkSession, root: str, seq: int) -> DataFrame:
    """Read the store as of a specific published version: reproducible
    pipeline re-runs against the exact snapshot an earlier job saw,
    as long as that version has not been vacuumed."""
    return spark.read.parquet(store_path_at(spark, root, seq))


def rollback_store(spark: SparkSession, root: str, to_seq: int) -> int:
    """Roll back by PUBLISHING FORWARD: a new manifest pointing at the
    old version's data directory. History is append-only — the bad
    version's manifest stays for forensics, concurrent readers switch
    with the same old-or-new guarantee as any publish. Returns the new
    sequence number."""
    return publish_store(spark, root, store_path_at(spark, root, to_seq))


def vacuum_store(
    spark: SparkSession, root: str, keep_last: int = 2
) -> dict[str, list[str]]:
    """Drop all but the last ``keep_last`` manifests and delete data
    directories no retained manifest references (a path republished by
    a rollback stays live however old its first manifest is). Only
    directories UNDER ``root`` are ever deleted — externally-located
    version paths are reported but left alone. Returns
    ``{"removed": [...], "kept": [...]}`` of data paths."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the current version stays)")
    jvm, root_hpath, fs = _fs(spark, root)
    seqs = _list_manifest_seqs(jvm, fs, root_hpath)
    history = dict(store_history(spark, root))
    drop_seqs = seqs[:-keep_last]
    keep_paths = {history[s] for s in seqs[-keep_last:]}
    root_prefix = root.rstrip("/") + "/"
    removed, kept = [], []
    for path in sorted({history[s] for s in drop_seqs}):
        if path in keep_paths:
            kept.append(path)
            continue
        if not path.startswith(root_prefix):
            kept.append(path)  # external dir: report, never delete
            continue
        fs.delete(jvm.org.apache.hadoop.fs.Path(path), True)
        removed.append(path)
    # manifests go last: if vacuum dies mid-delete, stale manifests may
    # reference removed dirs, but the CURRENT version (highest seq) is
    # always in keep_paths and intact
    for s in drop_seqs:
        fs.delete(jvm.org.apache.hadoop.fs.Path(root, _manifest_name(s)), False)
    return {"removed": removed, "kept": sorted(kept)}
