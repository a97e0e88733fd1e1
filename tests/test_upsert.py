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
