"""Shared Spark Column helpers for textops — all JVM-side expressions.

Every helper here has a byte-identical DuckDB twin in sqlgen.py /
the *_sql() functions of the sibling modules; parity is enforced by
tests/test_entry_contract.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from iresearch_spark.analysis.tokenizer import STOPWORDS
from iresearch_spark.textops.sqlgen import TOKEN_SPLIT_RE

STOP_LIST = sorted(STOPWORDS)


def raw_tokens_col(c: Column) -> Column:
    """Lower + regex-split tokens, empties removed, stopwords KEPT."""
    arr = F.split(F.lower(F.coalesce(c, F.lit(""))), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: t != F.lit(""))


def tokens_col(c: Column) -> Column:
    """Frozen-spec tokens (stopwords removed), order-preserving.

    JVM twin of analysis.tokenizer.tokenize for ASCII input (NFKC is
    identity on ASCII; corpora are asserted ASCII in the contract tests).
    """
    arr = F.split(F.lower(F.coalesce(c, F.lit(""))), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: (t != F.lit("")) & ~t.isin(STOP_LIST))


def md5_long(c: Column) -> Column:
    """Deterministic 60-bit positive hash shared with DuckDB:
    first 15 hex digits of md5 as a bigint
    (DuckDB twin: ('0x' || substr(md5(x), 1, 15))::BIGINT)."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")


def shingles_col(toks: Column, n: int = 3) -> Column:
    """n-token shingles (space-joined), distinct, order-normalized by
    array_distinct's first-occurrence semantics (matches list_distinct
    cardinality; pair ops only use set cardinalities)."""
    def mk(i: Column) -> Column:
        pieces = [F.element_at(toks, i + j) for j in range(n)]
        return F.concat_ws(" ", *pieces)

    # Spark's sequence(1, x) is DESCENDING for x <= 0 (DuckDB's range is
    # empty) — guard short docs explicitly so both systems agree.
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), mk)),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(n: int = 3) -> str:
    """DuckDB twin of shingles_col (n=3 layout; range(1, len-n+2))."""
    joined = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, len(toks) - {n - 2}), "
        f"i -> {joined}))"
    )


MD5_LONG_SQL = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
