from ydb_vector_search_demo_spark.multimodal import media

__all__ = ["media"]
