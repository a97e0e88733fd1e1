from ydb_vector_search_demo_spark.functions import strings, textstats, vector

__all__ = ["vector", "strings", "textstats"]
