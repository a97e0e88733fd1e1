"""The engine is equally usable through plain SQL: register_views +
spark.sql must produce the same results as the DataFrame catalog
queries (Catalyst compiles both to the same plans)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.sources.tables import register_views


def _norm(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(str(r[c]) for c in cols) for r in df.collect()),
    )


def test_sql_equals_dataframe_tpch_q1(spark):
    from ydb_vector_search_demo_spark.plans.catalog import QUERIES

    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS base_cents,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = QUERIES["tpch_q1_pricing"](spark, SF_SMOKE).select(
        "l_returnflag", "l_linestatus", "sum_qty", "base_cents", "count_order"
    )
    assert _norm(sql) == _norm(df)


def test_sql_knn_with_higher_order_functions(spark):
    """The full KNN expression is writable as one SQL string — the
    distance math is plain Spark SQL (aggregate/zip_with), no UDFs."""
    from ydb_vector_search_demo_spark.operators.knn import knn_scores
    from ydb_vector_search_demo_spark.pipeline.rag import embed_query_stub

    register_views(spark, SF_SMOKE)
    qv = embed_query_stub("sql surface parity")
    vec = "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in qv) + ")"
    sql = spark.sql(
        f"""
        SELECT vec_id,
               1.0 - aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), {vec},
                                        (x, y) -> x * y),
                               CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
                     / (sqrt(aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x * x),
                                       CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))
                        * sqrt(aggregate(transform({vec}, x -> x * x),
                                         CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)))
                   AS score
        FROM embeddings
        ORDER BY score, vec_id LIMIT 5
        """
    )
    df = knn_scores(
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet"), qv, k=5
    )
    sql_ids = [r["vec_id"] for r in sql.collect()]
    df_ids = [r["vec_id"] for r in df.collect()]
    assert sql_ids == df_ids
