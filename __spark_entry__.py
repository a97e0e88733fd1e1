"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (exact KNN top-5 with RAG
formatting — the reference's POST /search core, /root/reference/
app.py:117-138) on sf0.001. ``queries()``/``oracle_sql()`` cover the
operator inventory of SURVEY.md §2; every oracle-checked query rounds
float scores to 6 dp and breaks ties on ids so the DuckDB comparison is
deterministic (SURVEY.md §7.4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ydb_vector_search_demo_spark.functions import strings as S
from ydb_vector_search_demo_spark.functions import textstats as T
from ydb_vector_search_demo_spark.operators.knn import batch_knn, knn_scores
from ydb_vector_search_demo_spark.pipeline import rag
from ydb_vector_search_demo_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Deterministic query fixtures (embed stub — FIXTURES.md)

FLAGSHIP_QUERY = "fast scan table row value"
BATCH_QUERIES = ["hash join spark", "window order data", "customer query line"]

QV = rag.embed_query_stub(FLAGSHIP_QUERY)
BATCH_QVS = [rag.embed_query_stub(q) for q in BATCH_QUERIES]


def _vec_sql(v: list[float]) -> str:
    return "[" + ",".join(repr(float(x)) for x in v) + "]::DOUBLE[]"


def _sql_str(s: str) -> str:
    """SQL E-string literal with escaped quotes/newlines (DuckDB + ANSI)."""
    return "e'" + s.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n") + "'"


def _docs_embs(spark: SparkSession, sf_dir: str):
    return load_table(spark, sf_dir, "documents"), load_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# Vector search core (SURVEY.md §2.2)


def _knn_metric_query(metric: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _, embs = _docs_embs(spark, sf_dir)
        return knn_scores(embs, QV, k=5, metric=metric).select(
            "vec_id", F.round("score", 6).alias("score")
        )

    return q


_METRIC_ORACLE_EXPR = {
    "cosine": "1.0 - list_cosine_similarity(embedding::DOUBLE[], {q})",
    "euclidean": "list_distance(embedding::DOUBLE[], {q})",
    "inner_product": "-list_inner_product(embedding::DOUBLE[], {q})",
    "manhattan": (
        "list_sum(list_transform(list_zip(embedding::DOUBLE[], {q}),"
        " s -> abs(s[1] - s[2])))"
    ),
}


def _knn_metric_oracle(metric: str) -> str:
    expr = _METRIC_ORACLE_EXPR[metric].format(q=_vec_sql(QV))
    return f"""
        SELECT vec_id, round(raw, 6) AS score
        FROM (SELECT vec_id, {expr} AS raw FROM embeddings)
        ORDER BY raw, vec_id LIMIT 5
    """


def q_knn_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: top-5 cosine KNN joined back to document payloads with
    1-based result ids (app.py:124 + 129-138)."""
    docs, embs = _docs_embs(spark, sf_dir)
    top = knn_scores(embs, QV, k=5, metric="cosine")
    scored = docs.join(F.broadcast(top), docs.doc_id == top.vec_id).drop("vec_id")
    return rag.format_results(scored).select(
        "id", "doc_id", "content", "source", F.round("score", 6).alias("score")
    )


def _oracle_knn_full() -> str:
    return f"""
        WITH scored AS (
          SELECT vec_id,
                 1.0 - list_cosine_similarity(embedding::DOUBLE[], {_vec_sql(QV)}) AS raw
          FROM embeddings ORDER BY raw, vec_id LIMIT 5
        )
        SELECT row_number() OVER (ORDER BY s.raw, d.doc_id)::INTEGER AS id,
               d.doc_id, d.text AS content, d.source, round(s.raw, 6) AS score
        FROM scored s JOIN documents d ON d.doc_id = s.vec_id
    """


def q_batch_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per query vector for a batch of queries in one scan
    (SURVEY.md §2.6)."""
    _, embs = _docs_embs(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(BATCH_QVS)], "query_id INT, query_vec ARRAY<DOUBLE>"
    )
    return batch_knn(qdf, embs, k=3, metric="cosine").select(
        "query_id", "rank", "vec_id", F.round("score", 6).alias("score")
    )


def _oracle_batch_knn() -> str:
    values = ", ".join(
        f"({i}, {_vec_sql(v)})" for i, v in enumerate(BATCH_QVS)
    )
    return f"""
        WITH q(query_id, qv) AS (VALUES {values}),
        scored AS (
          SELECT q.query_id::INTEGER AS query_id, e.vec_id,
                 1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS raw
          FROM embeddings e CROSS JOIN q
        ), ranked AS (
          SELECT query_id, vec_id, raw,
                 row_number() OVER (PARTITION BY query_id ORDER BY raw, vec_id)::INTEGER AS rank
          FROM scored
        )
        SELECT query_id, rank, vec_id, round(raw, 6) AS score
        FROM ranked WHERE rank <= 3
    """


def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math surface: L2/L1 norms per stored embedding (V3)."""
    from ydb_vector_search_demo_spark.functions import vector as V

    _, embs = _docs_embs(spark, sf_dir)
    return embs.select(
        "vec_id",
        F.round(V.l2_norm("embedding"), 6).alias("l2_norm"),
        F.round(V.l1_norm("embedding"), 6).alias("l1_norm"),
    )


_ORACLE_VECTOR_NORMS = """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) AS l2_norm,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS l1_norm
    FROM embeddings
"""


# ---------------------------------------------------------------------------
# RAG pipeline (SURVEY.md §3.1)


def q_rag_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 context assembly: contents joined with a blank line
    (app.py:82)."""
    formatted = rag.search(spark, sf_dir, FLAGSHIP_QUERY, k=5)
    return rag.assemble_context(formatted)


def _oracle_rag_context() -> str:
    return f"""
        WITH scored AS (
          SELECT vec_id,
                 1.0 - list_cosine_similarity(embedding::DOUBLE[], {_vec_sql(QV)}) AS raw
          FROM embeddings ORDER BY raw, vec_id LIMIT 5
        ), ranked AS (
          SELECT d.text, row_number() OVER (ORDER BY s.raw, d.doc_id) AS id
          FROM scored s JOIN documents d ON d.doc_id = s.vec_id
        )
        SELECT string_agg(text, e'\\n\\n' ORDER BY id) AS context,
               count(*) AS n_docs
        FROM ranked WHERE id <= 3
    """


def q_rag_prompt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Russian prompt template of app.py:86-91 over the top-3
    context."""
    formatted = rag.search(spark, sf_dir, FLAGSHIP_QUERY, k=5)
    return rag.build_prompt(FLAGSHIP_QUERY, rag.assemble_context(formatted))


def _oracle_rag_prompt() -> str:
    prefix = (
        f'На основе следующих документов ответь на вопрос: "{FLAGSHIP_QUERY}"\n'
        "\nДокументы:\n"
    )
    suffix = (
        "\n\nДай краткий и информативный ответ на русском языке, основываясь "
        "только на предоставленной информации. Если информации недостаточно "
        "для ответа, укажи это."
    )
    return f"""
        WITH scored AS (
          SELECT vec_id,
                 1.0 - list_cosine_similarity(embedding::DOUBLE[], {_vec_sql(QV)}) AS raw
          FROM embeddings ORDER BY raw, vec_id LIMIT 5
        ), ranked AS (
          SELECT d.text, row_number() OVER (ORDER BY s.raw, d.doc_id) AS id
          FROM scored s JOIN documents d ON d.doc_id = s.vec_id
        )
        SELECT {_sql_str(prefix)} || string_agg(text, e'\\n\\n' ORDER BY id)
                 || {_sql_str(suffix)} AS prompt,
               count(*) AS n_docs
        FROM ranked WHERE id <= 3
    """


# ---------------------------------------------------------------------------
# Driver contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_knn_full(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "knn_top5_cosine": _knn_metric_query("cosine"),
        "knn_top5_euclidean": _knn_metric_query("euclidean"),
        "knn_top5_manhattan": _knn_metric_query("manhattan"),
        "knn_top5_inner_product": _knn_metric_query("inner_product"),
        "knn_top5_full": q_knn_full,
        "batch_knn_cosine": q_batch_knn,
        "vector_norms": q_vector_norms,
        "rag_context_top3": q_rag_context,
        "rag_prompt": q_rag_prompt,
    }
    return qs


def oracle_sql() -> dict[str, str]:
    return {
        "knn_top5_cosine": _knn_metric_oracle("cosine"),
        "knn_top5_euclidean": _knn_metric_oracle("euclidean"),
        "knn_top5_manhattan": _knn_metric_oracle("manhattan"),
        "knn_top5_inner_product": _knn_metric_oracle("inner_product"),
        "knn_top5_full": _oracle_knn_full(),
        "batch_knn_cosine": _oracle_batch_knn(),
        "vector_norms": _ORACLE_VECTOR_NORMS,
        "rag_context_top3": _oracle_rag_context(),
        "rag_prompt": _oracle_rag_prompt(),
    }
