from ydb_vector_search_demo_spark.operators import ann, dedup, knn

__all__ = ["knn", "dedup", "ann"]
