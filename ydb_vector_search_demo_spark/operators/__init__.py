from ydb_vector_search_demo_spark.operators import knn

__all__ = ["knn"]
