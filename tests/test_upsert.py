"""V5 upsert semantics (SURVEY.md §2.2): incoming rows replace same-key
rows, others survive, and the result round-trips through the Parquet
store unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from ydb_vector_search_demo_spark.pipeline.rag import embed_texts_udf, upsert_store


def test_upsert_replaces_and_appends(spark, tmp_path):
    existing = spark.createDataFrame(
        [(1, "old one"), (2, "old two"), (3, "old three")],
        "doc_id BIGINT, text STRING",
    )
    incoming = spark.createDataFrame(
        [(2, "NEW two"), (4, "NEW four")], "doc_id BIGINT, text STRING"
    )
    merged = upsert_store(existing, incoming)
    got = {r["doc_id"]: r["text"] for r in merged.collect()}
    assert got == {1: "old one", 2: "NEW two", 3: "old three", 4: "NEW four"}


def test_upsert_embed_write_roundtrip(spark, tmp_path):
    store_path = str(tmp_path / "store")
    embed = embed_texts_udf()
    v1 = spark.createDataFrame(
        [(1, "первый документ"), (2, "второй документ")],
        "doc_id BIGINT, text STRING",
    ).withColumn("embedding", embed("text"))
    v1.write.parquet(store_path)

    incoming = spark.createDataFrame(
        [(2, "второй документ исправленный"), (3, "третий документ")],
        "doc_id BIGINT, text STRING",
    ).withColumn("embedding", embed("text"))

    merged = upsert_store(spark.read.parquet(store_path), incoming)
    out_path = str(tmp_path / "store_v2")
    merged.write.parquet(out_path)
    back = spark.read.parquet(out_path)

    assert back.count() == 3
    texts = {r["doc_id"]: r["text"] for r in back.collect()}
    assert texts[2] == "второй документ исправленный"
    dims = back.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64]


def test_delete_docs_removes_by_key(spark):
    from ydb_vector_search_demo_spark.pipeline.rag import delete_docs

    store = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three"), (4, "four")],
        "doc_id BIGINT, text STRING",
    )
    # iterable form and one-column-DataFrame form must agree
    got_iter = {r["doc_id"] for r in delete_docs(store, [2, 4, 99]).collect()}
    keys_df = spark.createDataFrame([(2,), (4,), (99,)], "k BIGINT")
    got_df = {r["doc_id"] for r in delete_docs(store, keys_df).collect()}
    assert got_iter == got_df == {1, 3}


def test_read_store_merge_delete_resurrect(spark):
    """Merge-on-read semantics: latest upsert wins, a tombstone hides
    every version <= its own, and a LATER re-upsert resurrects the key."""
    from ydb_vector_search_demo_spark.pipeline.rag import read_store

    base = spark.createDataFrame(
        [(1, "base one"), (2, "base two"), (3, "base three")],
        "doc_id BIGINT, text STRING",
    )
    upserts = spark.createDataFrame(
        [
            (2, "v1 two", 1),     # update
            (4, "v1 four", 1),    # insert
            (3, "v3 three", 3),   # re-insert AFTER the v2 tombstone
        ],
        "doc_id BIGINT, text STRING, _v INT",
    )
    deletes = spark.createDataFrame(
        [(1, 2), (3, 2)], "doc_id BIGINT, _v INT"
    )  # 1: plain delete; 3: deleted then resurrected by the v3 upsert
    got = {r["doc_id"]: r["text"] for r in read_store(base, upserts, deletes).collect()}
    assert got == {2: "v1 two", 3: "v3 three", 4: "v1 four"}


def test_compact_store_roundtrip_idempotent(spark, tmp_path):
    """Compaction materializes the merged view; re-compacting the
    snapshot with empty logs is a no-op (idempotence)."""
    from ydb_vector_search_demo_spark.pipeline.rag import compact_store, read_store

    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "doc_id BIGINT, text STRING"
    )
    upserts = spark.createDataFrame(
        [(2, "TWO", 1), (5, "FIVE", 1)], "doc_id BIGINT, text STRING, _v INT"
    )
    deletes = spark.createDataFrame([(3, 2)], "doc_id BIGINT, _v INT")
    empty_ups = upserts.limit(0)
    empty_dels = deletes.limit(0)

    snap = compact_store(base, upserts, deletes, str(tmp_path / "snap"))
    got = {r["doc_id"]: r["text"] for r in snap.collect()}
    assert got == {1: "one", 2: "TWO", 5: "FIVE"}

    again = compact_store(snap, empty_ups, empty_dels, str(tmp_path / "snap2"))
    assert {r["doc_id"]: r["text"] for r in again.collect()} == got
    # and the merged view itself equals the snapshot (merge-on-read ==
    # compacted read)
    view = read_store(base, upserts, deletes)
    assert {r["doc_id"]: r["text"] for r in view.collect()} == got
