from ydb_vector_search_demo_spark.streaming import events

__all__ = ["events"]
