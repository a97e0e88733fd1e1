from ydb_vector_search_demo_spark.plans.catalog import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
