from iresearch_spark.build.indexer import build_index

__all__ = ["build_index"]
