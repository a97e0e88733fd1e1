"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (exact KNN top-5 with RAG
formatting — the reference's POST /search core, /root/reference/
app.py:117-138) on sf0.001. ``queries()``/``oracle_sql()`` expose the
query catalog (ydb_vector_search_demo_spark/plans/catalog.py) covering
the operator inventory of SURVEY.md §2 plus the north-star extensions;
every oracle-checked query rounds float scores to 6 dp and breaks ties
on ids so the DuckDB comparison is deterministic (SURVEY.md §7.4).
Queries without an oracle entry are genuinely non-SQL-expressible
(MLlib KMeans/LSH, xxhash64-based signatures, mapInPandas stubs,
Structured Streaming) and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ydb_vector_search_demo_spark.plans.catalog import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["knn_top5_full"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
