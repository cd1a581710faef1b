from iresearch_spark.fixtures.corpus import (
    CHUNK_DOCS,
    gen_chunk,
    gen_corpus_pandas,
    gen_corpus_spark,
)
from iresearch_spark.fixtures.queries import gen_queries

__all__ = [
    "CHUNK_DOCS",
    "gen_chunk",
    "gen_corpus_pandas",
    "gen_corpus_spark",
    "gen_queries",
]
