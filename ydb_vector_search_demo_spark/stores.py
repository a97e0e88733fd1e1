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
