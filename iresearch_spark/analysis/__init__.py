from iresearch_spark.analysis.tokenizer import (
    STOPWORDS,
    tokenize,
    tokenize_series,
    tokenize_with_positions,
)
from iresearch_spark.analysis.extract import extract_text, extract_series

__all__ = [
    "STOPWORDS",
    "tokenize",
    "tokenize_series",
    "tokenize_with_positions",
    "extract_text",
    "extract_series",
]
