from iresearch_spark.streaming.dedup import dedup_stream
from iresearch_spark.streaming.ingest import (
    index_microbatch,
    start_index_stream,
)

__all__ = ["dedup_stream", "index_microbatch", "start_index_stream"]
