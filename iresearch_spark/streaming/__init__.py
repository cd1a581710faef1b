from iresearch_spark.streaming.ingest import (
    index_microbatch,
    start_index_stream,
)

__all__ = ["index_microbatch", "start_index_stream"]
