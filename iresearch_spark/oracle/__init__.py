from iresearch_spark.oracle.model import OracleIndex, levenshtein, wildcard_to_regex

__all__ = ["OracleIndex", "levenshtein", "wildcard_to_regex"]
