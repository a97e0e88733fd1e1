"""Streaming vector-store ingest: new embeddings arrive as files, get
routed to their index cell (and optionally int8-quantized) map-side,
and append to the partitioned store continuously — the streaming
completion of the batch ``ivf_append``/``tree_append`` story
(operators.ann) and the store-ingest half of the reference's
(disabled) index path [API-inferred, /root/reference/app.py:37].

Everything between source and sink is a stateless projection
(``tree_assign``/``ivf_assign``/``quantize_int8`` are pure Column
expressions), so this runs as a stateless streaming query: no
watermark, no state store, exactly-once file-sink semantics via the
checkpoint, and each micro-batch touches only the leaf directories
its rows route to. Index maintenance stays batch: the codebooks are
plan literals fixed at query start, and when drift accumulates
(`ann.tree_drift_report`) a batch `rebalance_tree` rewrites the store
— the classic streaming-ingest / batch-reorg split."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ydb_vector_search_demo_spark.functions.vector import l2_norm
from ydb_vector_search_demo_spark.operators.ann import ivf_assign, tree_assign
from ydb_vector_search_demo_spark.operators.pq import encode_expr
from ydb_vector_search_demo_spark.operators.quant import (
    int8_scale,
    mrl_prefix,
    quantize_expr,
)


def _with_companions(
    assigned: DataFrame,
    quantize: bool,
    pq_codebooks,
    vector_col: str = "embedding",
    mrl_dims: int | None = None,
    rotation=None,
    rotation_dims: int | None = None,
    pq_rotation=None,
) -> DataFrame:
    """Optional quantized companion columns, computed in the same
    map-only micro-batch pass as the cell routing: int8 (qvec, qscale),
    PQ (pq_codes, vnorm) with FROZEN codebooks travelling as plan
    literals, a Matryoshka ``mrl_dims``-prefix column, or a
    learned-rotation ``rotation_dims``-prefix (the fitted PCA/Hadamard
    basis is data-independent once fitted, so it freezes into plan
    literals exactly like the codebooks) — the ingest stays refit-free;
    codebook/basis refresh is the batch rebalance job's concern,
    exactly like the centroids. With the prefix column the streamed-in
    store serves MRL coarse searches (``quant.mrl_search_parquet`` /
    ``mrl_batch_search_parquet``) or rotated-prefix searches
    (``rotation.pca_search_parquet`` / ``pca_batch_search_parquet``)
    directly — every precision of the ladder is maintained
    incrementally. ``mrl_dims`` and ``rotation`` are mutually
    exclusive: both write the ``prefix`` column and a store can only
    serve one basis."""
    if mrl_dims is not None and rotation is not None:
        raise ValueError(
            "mrl_dims and rotation both write the 'prefix' companion; "
            "a store serves one basis — pick one"
        )
    if quantize:
        scale = int8_scale(vector_col)
        assigned = assigned.withColumns(
            {"qvec": quantize_expr(vector_col, scale),
             "qscale": scale.cast("float")}
        )
    if pq_codebooks is not None:
        # pq_rotation: the codebooks were OPQ-trained (pq.train_pq_
        # codebooks(rotation=...)); the frozen basis rotates each
        # streamed vector before encoding, materialized ONCE in its
        # own projection (pq._with_rotated rationale). The probe side
        # passes the same basis to pq_search/pq_batch_search.
        if pq_rotation is not None:
            from ydb_vector_search_demo_spark.operators.rotation import (
                rotate_expr,
            )

            assigned = assigned.withColumn(
                "_opq_rot", rotate_expr(vector_col, pq_rotation)
            ).withColumns(
                {"pq_codes": encode_expr("_opq_rot", pq_codebooks),
                 "vnorm": l2_norm(vector_col).cast("float")}
            ).drop("_opq_rot")
        else:
            assigned = assigned.withColumns(
                {"pq_codes": encode_expr(vector_col, pq_codebooks),
                 "vnorm": l2_norm(vector_col).cast("float")}
            )
    if mrl_dims is not None:
        assigned = assigned.withColumn(
            "prefix", mrl_prefix(vector_col, mrl_dims)
        )
    if rotation is not None:
        from ydb_vector_search_demo_spark.operators.rotation import rotate_expr

        assigned = assigned.withColumn(
            "prefix", rotate_expr(vector_col, rotation, rotation_dims)
        )
    return assigned


def read_embeddings_stream(
    spark: SparkSession, source_dir: str, dim_hint_df: DataFrame | None = None,
    schema=None,
) -> DataFrame:
    """File-source stream of (vec_id, embedding) parquet drops. The
    schema comes from ``schema`` or a batch ``dim_hint_df`` (file
    streams need an explicit schema — one batch-read of an existing
    file, never inference over the stream)."""
    if schema is None:
        schema = dim_hint_df.select("vec_id", "embedding").schema
    return spark.readStream.schema(schema).parquet(source_dir)


def stream_ivf_ingest(
    stream: DataFrame,
    centroids: list[list[float]],
    store_path: str,
    checkpoint_dir: str,
    quantize: bool = False,
    pq_codebooks=None,
    mrl_dims: int | None = None,
    rotation=None,
    rotation_dims: int | None = None,
    pq_rotation=None,
    available_now: bool = True,
):
    """Continuous IVF ingest: map-only centroid routing (+ optional
    int8 and/or PQ companion columns, frozen codebooks — see
    :func:`_with_companions`), appended to the centroid-partitioned
    store. Returns the started StreamingQuery (caller awaits). With
    ``pq_codebooks`` set, the best bytes/recall point of the r4
    quantization ladder is maintained incrementally — coarse searches
    (``pq.ivf_pq_companion_search_parquet``) run directly on the
    streamed-in store."""
    assigned = _with_companions(
        ivf_assign(centroids, stream), quantize, pq_codebooks,
        mrl_dims=mrl_dims, rotation=rotation, rotation_dims=rotation_dims,
        pq_rotation=pq_rotation,
    )
    writer = (
        assigned.writeStream.format("parquet")
        .option("path", store_path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("centroid_id")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_tree_ingest(
    stream: DataFrame,
    centroids_top: list[list[float]],
    centroids_sub: list[list[list[float]]],
    store_path: str,
    checkpoint_dir: str,
    quantize: bool = False,
    pq_codebooks=None,
    mrl_dims: int | None = None,
    rotation=None,
    rotation_dims: int | None = None,
    pq_rotation=None,
    available_now: bool = True,
):
    """Continuous two-level-tree ingest: (cell_top, cell_sub) routing
    map-side, appended to the two-level directory layout — with the
    same optional int8/PQ companion columns as the IVF path, so the
    tree store composes with the quantized coarse scans too."""
    assigned = _with_companions(
        tree_assign(centroids_top, centroids_sub, stream), quantize,
        pq_codebooks, mrl_dims=mrl_dims, rotation=rotation,
        rotation_dims=rotation_dims, pq_rotation=pq_rotation,
    )
    writer = (
        assigned.writeStream.format("parquet")
        .option("path", store_path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("cell_top", "cell_sub")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_bm25_ingest(
    docs_stream: DataFrame,
    root: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords=None,
    stem: bool = False,
):
    """Streaming LEXICAL ingest: each micro-batch of new documents is
    appended to the published BM25 inverted index via
    ``retrieval.append_bm25_index`` inside ``foreachBatch`` — tokenize
    the batch, merge df-free postings cores, recompute df/stats from
    postings (never re-tokenizing the corpus), publish a new atomic
    version. Probers resolve the current version between batches and
    always see a complete index equal to a full rebuild over
    everything ingested so far (the batch append's equality contract).

    Unlike the vector ingests above this is NOT a file-sink append —
    publishing a new version per micro-batch is a metadata swap, the
    streaming analogue of the continuous-aggregate refresh
    (events_rollup_serve). Exactly-once comes from the foreachBatch
    checkpoint: a replayed batch re-publishes an identical version.
    Empty micro-batches are skipped (no empty version churn)."""
    from ydb_vector_search_demo_spark.operators import retrieval as R

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        from ydb_vector_search_demo_spark import stores

        if stores.current_store_path(spark, root) is None:
            idx = R.build_bm25_index(
                batch_df, text_col=text_col, id_col=id_col,
                stopwords=stopwords, stem=stem,
            )
            try:
                R.publish_bm25_index(spark, root, idx)
            finally:
                idx.postings.unpersist()
        else:
            R.append_bm25_index(
                spark, root, batch_df, text_col=text_col, id_col=id_col,
                stopwords=stopwords, stem=stem,
            )

    return (
        docs_stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def stream_scd2_ingest(
    changes_stream: DataFrame,
    base: DataFrame,
    root: str,
    checkpoint: str,
    key_col: str = "doc_id",
    payload_col: str = "text",
    available_now: bool = True,
):
    """Streaming SCD2/CDC maintenance of the log-structured store —
    the lifecycle × streaming cell (the stream_bm25_ingest pattern
    applied to warehouse history): change rows
    ``(key, payload, _v, op)`` with ``op`` in {'upsert', 'delete'}
    arrive as a stream; each micro-batch (a) appends its slices to the
    upsert/tombstone logs under ``root/log/`` at a DETERMINISTIC
    per-batch path (``batch=<id>`` — a checkpoint-replayed batch
    overwrites itself with identical bytes, so exactly-once comes for
    free), and (b) rebuilds the SCD2 history view from ``base`` + all
    logs so far (:func:`pipeline.rag.scd2_history` — one union, one
    lead window keyed on the key) into a fresh versioned directory
    published via :func:`stores.publish_store`'s atomic manifest swap.
    Readers between batches always see a COMPLETE history equal to the
    batch ``scd2_history`` over everything ingested so far (the
    equality law in tests/test_streaming_semantics.py), and because
    the history window orders by ``_v``, out-of-order batch arrival
    converges to the same final history.

    Scale shape: the logs are churn-bound (never the store); the one
    full-``base`` pass per publish is the rebuild's cost — at 100 TB
    the publish cadence batches micro-batches (trigger interval), the
    same continuous-aggregate refresh economics as
    events_rollup_serve. Returns the writer (caller starts/awaits)."""
    from ydb_vector_search_demo_spark import stores
    from ydb_vector_search_demo_spark.pipeline import rag

    ups_schema = base.select(
        F.col(key_col), F.col(payload_col)
    ).withColumn("_v", F.lit(1).cast("int")).schema
    del_schema = base.select(F.col(key_col)).withColumn(
        "_v", F.lit(1).cast("int")
    ).schema

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ups = batch_df.filter(F.col("op") == "upsert").select(
            key_col, payload_col, F.col("_v").cast("int").alias("_v")
        )
        dels = batch_df.filter(F.col("op") == "delete").select(
            key_col, F.col("_v").cast("int").alias("_v")
        )
        ups.write.mode("overwrite").parquet(
            f"{root}/log/upserts/batch={batch_id}"
        )
        dels.write.mode("overwrite").parquet(
            f"{root}/log/deletes/batch={batch_id}"
        )
        # explicit schemas: a batch with no deletes writes a part-less
        # directory, which schema inference cannot read back
        ups_all = spark.read.schema(ups_schema).parquet(
            f"{root}/log/upserts"
        ).select(key_col, payload_col, "_v")
        dels_all = spark.read.schema(del_schema).parquet(
            f"{root}/log/deletes"
        ).select(key_col, "_v")
        hist = rag.scd2_history(
            base, ups_all, dels_all, key_col=key_col, payload_col=payload_col
        )
        out = f"{root}/history-b{batch_id}"
        hist.write.mode("overwrite").parquet(out)
        stores.publish_store(spark, root, out)

    writer = changes_stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer
