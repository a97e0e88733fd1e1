"""The full RAG search pipeline around the KNN core (SURVEY.md §3.1).

Reference dataflow (/root/reference/app.py:103-171):
  embed query → exact KNN top-5 with scores → format results (1-based id,
  content, metadata, float score) → top-3 context joined with "\\n\\n" →
  Russian prompt template → LLM summary → JSON envelope with per-stage
  timings.

External model calls (YandexGPTEmbeddings at app.py:118, YandexGPT at
app.py:95) are network services; here they are pluggable. The default
implementations are the deterministic seeded stubs required for oracle
checking (FIXTURES.md): query text → 64-dim unit vector from per-token
hashes, and summary → deterministic function of the prompt. Swap in real
services by passing a different ``embed_fn`` / ``llm_fn`` — both run as
Arrow-batched pandas UDFs when applied to columns, never row-at-a-time.
"""

from __future__ import annotations

import hashlib
import math
import random
from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StringType

from ydb_vector_search_demo_spark.operators.knn import knn_scores
from ydb_vector_search_demo_spark.sources.tables import load_table

EMBEDDING_DIM = 64
_STUB_SEED = 42

# Exact template of /root/reference/app.py:86-91 (Russian text preserved;
# SURVEY.md §7.4 requires UTF-8 golden fidelity).
PROMPT_TEMPLATE = (
    'На основе следующих документов ответь на вопрос: "%s"\n'
    "\n"
    "Документы:\n"
    "%s\n"
    "\n"
    "Дай краткий и информативный ответ на русском языке, основываясь только "
    "на предоставленной информации. Если информации недостаточно для ответа, "
    "укажи это."
)

CONTEXT_SEPARATOR = "\n\n"  # app.py:82
CONTEXT_TOP_N = 3  # app.py:82 — only the first 3 docs feed the LLM
DEFAULT_K = 5  # app.py:124


def embed_query_stub(text: str) -> list[float]:
    """Deterministic replacement for ``embeddings.embed_query`` (app.py:118).

    Per-token md5-seeded pseudo-random 64-dim contribution, summed and
    L2-normalized. Pure Python + stdlib so the identical literal vector
    can be inlined into DuckDB oracle SQL.
    """
    v = [0.0] * EMBEDDING_DIM
    for tok in text.split():
        seed = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
        seed ^= _STUB_SEED
        rng = random.Random(seed)
        for i in range(EMBEDDING_DIM):
            v[i] += rng.uniform(-1.0, 1.0)
    n = math.sqrt(sum(x * x for x in v))
    if n == 0.0:
        return v
    return [x / n for x in v]


def summarize_stub(prompt: str) -> str:
    """Deterministic replacement for ``yandex_gpt.invoke`` (app.py:95):
    echoes a fingerprint of the prompt. Stripped like app.py:97."""
    digest = hashlib.md5(prompt.encode("utf-8")).hexdigest()[:12]
    return f"[stub-summary {digest}]".strip()


def embed_texts_udf(embed_fn: Callable[[str], list[float]] = embed_query_stub):
    """Arrow-batched pandas UDF wrapping an embedding service (S3/V1).
    In production ``embed_fn`` calls the model API once per text (or in
    micro-batches); the UDF boundary is the only Python in the pipeline."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: embed_fn(t or ""))

    return _embed


def llm_udf(llm_fn: Callable[[str], str] = summarize_stub):
    """Arrow-batched pandas UDF wrapping the LLM call (S4, app.py:95)."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    @F.pandas_udf(StringType())
    def _invoke(prompts: pd.Series) -> pd.Series:
        return prompts.map(lambda p: llm_fn(p or ""))

    return _invoke


def validate_query(query: str) -> str:
    """Non-empty-after-trim filter (P1, app.py:108-111)."""
    query = (query or "").strip()
    if not query:
        raise ValueError("Запрос не может быть пустым")  # app.py:111
    return query


def format_results(scored_docs: DataFrame) -> DataFrame:
    """P2/P3/V6 (app.py:129-138): 1-based id ordered by ascending score,
    ``text`` renamed ``content``, score cast to double. The enumeration
    window runs over k rows only — this runs after the top-k, never on
    the full table."""
    from ydb_vector_search_demo_spark.operators.knn import enumerate_results

    return enumerate_results(scored_docs).select(
        "id",
        F.col("doc_id"),
        F.col("text").alias("content"),
        F.col("source"),
        F.col("score").cast("double").alias("score"),
    )


def assemble_context(formatted: DataFrame, top_n: int = CONTEXT_TOP_N) -> DataFrame:
    """P4 + F2 (app.py:82): first ``top_n`` contents joined with a blank
    line, order preserved via sort_array over (id, content) structs so the
    aggregation is deterministic regardless of partitioning."""
    return (
        formatted.filter(F.col("id") <= top_n)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("id", "content"))),
                    lambda s: s["content"],
                ),
                CONTEXT_SEPARATOR,
            ).alias("context"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def build_prompt(query: str, context_df: DataFrame) -> DataFrame:
    """F3 (app.py:86-91): the exact Russian prompt template."""
    return context_df.select(
        F.format_string(
            PROMPT_TEMPLATE, F.lit(query), F.col("context")
        ).alias("prompt"),
        F.col("n_docs"),
    )


def search(
    spark: SparkSession,
    sf_dir: str,
    query: str,
    k: int = DEFAULT_K,
    metric: str = "cosine",
    embed_fn: Callable[[str], Sequence[float]] = embed_query_stub,
) -> DataFrame:
    """End-to-end search stage (app.py:117-138): embed once, exact KNN
    top-k, formatted results. Returns the formatted-results DataFrame."""
    query = validate_query(query)
    qv = list(embed_fn(query))  # computed once, reused — app.py:118 CSE
    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    top = knn_scores(embs, qv, k=k, metric=metric)
    scored_docs = docs.join(F.broadcast(top), docs.doc_id == top.vec_id).drop("vec_id")
    return format_results(scored_docs)


def search_with_summary(
    spark: SparkSession,
    sf_dir: str,
    query: str,
    k: int = DEFAULT_K,
    metric: str = "cosine",
    embed_fn: Callable[[str], Sequence[float]] = embed_query_stub,
    llm_fn: Callable[[str], str] = summarize_stub,
) -> DataFrame:
    """Full pipeline including the summary stage (app.py:141-149):
    context → prompt → LLM UDF → stripped summary, single-row DataFrame
    with (prompt, summary, n_docs)."""
    formatted = search(spark, sf_dir, query, k=k, metric=metric, embed_fn=embed_fn)
    prompt_df = build_prompt(query, assemble_context(formatted))
    invoke = llm_udf(llm_fn)
    return prompt_df.select(
        "prompt",
        F.trim(invoke(F.col("prompt"))).alias("summary"),  # .strip(), app.py:97
        "n_docs",
    )


def response_envelope(
    query: str,
    formatted: DataFrame,
    summary_df: DataFrame,
    timings: dict[str, float] | None = None,
) -> DataFrame:
    """S5 (app.py:155-167): one-row envelope with results array, count,
    summary, and 3-dp performance struct. Timings come from the harness
    (wall-clock instrumentation is not a data operator, SURVEY.md §6)."""
    t = timings or {"embedding_time": 0.0, "search_time": 0.0, "gpt_time": 0.0}
    total = t.get("total_time", sum(t.values()))
    results_arr = formatted.agg(
        F.sort_array(
            F.collect_list(F.struct("id", "content", "source", "score"))
        ).alias("results"),
        F.count(F.lit(1)).alias("count"),
    )
    return (
        results_arr.crossJoin(summary_df.select("summary"))
        .select(
            F.lit(True).alias("success"),
            F.lit(query).alias("query"),
            F.col("results"),
            F.col("count"),
            # summary may be null when no results / LLM down (app.py:141-149)
            F.when(F.col("count") > 0, F.col("summary")).otherwise(F.lit(None)).alias("summary"),
            F.struct(
                F.round(F.lit(t.get("embedding_time", 0.0)), 3).alias("embedding_time"),
                F.round(F.lit(t.get("search_time", 0.0)), 3).alias("search_time"),
                F.round(F.lit(t.get("gpt_time", 0.0)), 3).alias("gpt_time"),
                F.round(F.lit(total), 3).alias("total_time"),
            ).alias("performance"),
        )
    )


def upsert_store(
    existing: DataFrame, incoming: DataFrame, key_col: str = "doc_id"
) -> DataFrame:
    """UPSERT semantics of the store's add_documents path (SURVEY.md
    §2.2 V5 [API-inferred]: embed + UPSERT): incoming rows replace
    existing rows with the same key, everything else is kept.

    Pure-DataFrame merge: incoming ∪ (existing ⟂ incoming) via a
    left-anti join on the key — one shuffle on the key (or zero with
    bucketed storage). On a table format with MERGE (Delta/Iceberg) this
    whole function is one `MERGE INTO`; on raw Parquet the caller
    rewrites the affected partitions with the returned frame."""
    survivors = existing.join(incoming, on=key_col, how="left_anti")
    return survivors.unionByName(incoming)


def delete_docs(
    existing: DataFrame, keys, key_col: str = "doc_id"
) -> DataFrame:
    """Store document REMOVAL — the delete half of the store lifecycle
    the reference's langchain-ydb store exposes alongside add/upsert
    [API-inferred behind /root/reference/app.py:29-42]; the
    takedown/refresh flow every real corpus pipeline hits.

    ``keys`` is an iterable of key values or a one-column DataFrame.
    Broadcast left-anti join: delete batches are tiny relative to the
    store, so the store side never shuffles."""
    if isinstance(keys, DataFrame):
        keys_df = keys.select(F.col(keys.columns[0]).alias(key_col))
    else:
        keys_df = existing.sparkSession.createDataFrame(
            [(k,) for k in keys], existing.select(key_col).schema
        )
    return existing.join(F.broadcast(keys_df), on=key_col, how="left_anti")


def read_store(
    base: DataFrame,
    upserts: DataFrame,
    deletes: DataFrame,
    key_col: str = "doc_id",
    version_col: str = "_v",
) -> DataFrame:
    """Log-structured store READ path: merge the base snapshot with an
    upsert log and a tombstone log — merge-on-read, exactly what a
    Delta/Iceberg table does between compactions, expressed as plain
    DataFrame ops on raw Parquet.

    ``base`` rows carry implicit version 0; ``upserts`` carries
    ``version_col`` (> 0, at most one row per (key, version));
    ``deletes`` is a (key, version) tombstone log. Latest version wins
    per key, and a tombstone hides every row version <= its own — so a
    later re-upsert RESURRECTS a deleted key, matching MERGE semantics.

    One shuffle on the key for the latest-wins window; the tombstone
    side broadcasts (delete logs are small). Compaction
    (:func:`compact_store`) rewrites this view to a plain snapshot."""
    allr = base.withColumn(version_col, F.lit(0)).unionByName(upserts)
    w = Window.partitionBy(key_col).orderBy(F.col(version_col).desc())
    latest = (
        allr.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    del_max = deletes.groupBy(key_col).agg(F.max(version_col).alias("_del_v"))
    return (
        latest.join(F.broadcast(del_max), on=key_col, how="left")
        .filter(F.col("_del_v").isNull() | (F.col(version_col) > F.col("_del_v")))
        .drop("_del_v", version_col)
    )


def compact_store(
    base: DataFrame,
    upserts: DataFrame,
    deletes: DataFrame,
    out_path: str,
    key_col: str = "doc_id",
    version_col: str = "_v",
) -> DataFrame:
    """Tombstone-aware compaction: materialize the merged store view to
    ``out_path`` and return the re-read snapshot — after this the logs
    can be dropped and the read path is a plain scan again. Never
    writes in place (the atomic swap is the caller's rename/metastore
    step, like sources.tables.compact_parquet)."""
    merged = read_store(base, upserts, deletes, key_col, version_col)
    merged.write.mode("overwrite").parquet(out_path)
    return base.sparkSession.read.parquet(out_path)


def health(spark: SparkSession) -> DataFrame:
    """GET /health analogue (app.py:173-180): static availability row."""
    return spark.range(1).select(
        F.lit("healthy").alias("status"),
        F.lit(True).alias("vector_store_available"),
        F.lit(True).alias("yandex_gpt_available"),
    )


def read_store_at(
    base: DataFrame,
    upserts: DataFrame,
    deletes: DataFrame,
    version: int,
    key_col: str = "doc_id",
    version_col: str = "_v",
) -> DataFrame:
    """TIME TRAVEL over the log-structured store: the merged view AS OF
    ``version`` — replay only log entries with version <= v, exactly
    the Delta/Iceberg ``VERSION AS OF`` read re-expressed on the raw
    logs. A version filter on the (already small) log sides is the
    only change vs :func:`read_store`, so the snapshot costs what the
    current view costs; no store rewrite, no copy."""
    v = int(version)
    return read_store(
        base,
        upserts.filter(F.col(version_col) <= v),
        deletes.filter(F.col(version_col) <= v),
        key_col,
        version_col,
    )


def store_changes_between(
    base: DataFrame,
    upserts: DataFrame,
    deletes: DataFrame,
    v_from: int,
    v_to: int,
    key_col: str = "doc_id",
    compare_col: str = "text",
) -> DataFrame:
    """CHANGE DATA FEED between two store versions: one row per key
    whose live value differs between the ``v_from`` and ``v_to``
    snapshots, tagged insert / update / delete (unchanged keys are
    absent — the Delta CDF contract). ``compare_col`` decides update
    detection (payload equality, null-safe).

    Scale shape: two snapshot views over the SAME base relation and a
    full outer join keyed on the key — all three shuffles share the
    key, so a co-partitioned (bucketed) store pays one exchange per
    log replay and none for the diff join; output is bounded by the
    churn between the versions, never the store size."""
    a = read_store_at(base, upserts, deletes, v_from, key_col)
    b = read_store_at(base, upserts, deletes, v_to, key_col)
    a_side = a.select(
        F.col(key_col),
        F.col(compare_col).alias("_before"),
        F.lit(1).alias("_in_a"),
    )
    b_side = b.select(
        F.col(key_col),
        F.col(compare_col).alias("_after"),
        F.lit(1).alias("_in_b"),
    )
    joined = a_side.join(b_side, key_col, "full_outer")
    change = (
        F.when(F.col("_in_a").isNull(), F.lit("insert"))
        .when(F.col("_in_b").isNull(), F.lit("delete"))
        .when(
            ~F.col("_before").eqNullSafe(F.col("_after")), F.lit("update")
        )
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(key_col, "change_type", "_before", "_after")
        .withColumnsRenamed({"_before": "before", "_after": "after"})
    )


def scd2_history(
    base: DataFrame,
    upserts: DataFrame,
    deletes: DataFrame,
    key_col: str = "doc_id",
    payload_col: str = "text",
) -> DataFrame:
    """Slowly-Changing-Dimension TYPE 2 view of the log-structured
    store: one row per (key, value version) with its validity interval
    — (key, payload, valid_from, valid_to, is_current) — the
    warehouse-history complement of :func:`read_store_at` (one
    version) and :func:`store_changes_between` (one diff). A value row
    opens at its own version and closes at the key's NEXT change of
    any kind (upsert or delete); the latest un-deleted value is
    ``is_current``. ``valid_to`` is -1 for open intervals so the
    column stays integer-typed in every engine (a NULL int lands as
    float64 in pandas on one side and not the other — the driver-hash
    dtype-kind rule). Assumes at most one change per (key, version),
    the upsert-log contract.

    Scale shape: one union of the three logs and ONE window keyed on
    the key (lead over version) — a single shuffle whose per-key state
    is that key's change count (bounded by churn, never store size);
    delete markers participate in the lead and are then dropped
    map-side."""
    ev = (
        base.select(
            F.col(key_col),
            F.col(payload_col).alias("_p"),
            F.lit(0).alias("_v"),
            F.lit(True).alias("_is_upsert"),
        )
        .unionByName(
            upserts.select(
                F.col(key_col),
                F.col(payload_col).alias("_p"),
                F.col("_v").cast("int").alias("_v"),
                F.lit(True).alias("_is_upsert"),
            )
        )
        .unionByName(
            deletes.select(
                F.col(key_col),
                F.lit(None).cast("string").alias("_p"),
                F.col("_v").cast("int").alias("_v"),
                F.lit(False).alias("_is_upsert"),
            )
        )
    )
    return scd2_from_events(ev, key_col=key_col, payload_col=payload_col)


def scd2_from_events(
    ev: DataFrame, key_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """The SCD2 window over an already-built event relation
    ``(key, _p, _v, _is_upsert)`` — the shared core of
    :func:`scd2_history` (full logs) and the incremental churn-merge
    publish (streaming.ingest.stream_scd2_ingest_incremental, which
    reconstructs events for the churn keys only). One window keyed on
    the key (lead over version); per-key state is that key's change
    count. Spelled as JVM-parsed expression strings: the incremental
    publish constructs this per micro-batch, and the Python Column
    API's py4j round-trips were a measurable slice of the per-batch
    driver latency (guide §5)."""
    k, p = f"`{key_col}`", f"`{payload_col}`"
    return (
        ev.selectExpr(
            "*",
            f"lead(_v) over (partition by {k} order by _v asc) as _next",
        )
        .filter("_is_upsert")
        .selectExpr(
            k,
            f"_p as {p}",
            "_v as valid_from",
            "cast(coalesce(_next, -1) as int) as valid_to",
            "(_next is null) as is_current",
        )
    )
