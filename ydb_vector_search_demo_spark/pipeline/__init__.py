from ydb_vector_search_demo_spark.pipeline import rag

__all__ = ["rag"]
