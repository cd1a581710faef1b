"""Corpus-shaping operators a large-scale training-data pipeline applies
after quality/dedup: deterministic sampling and per-source caps.

Both are pure JVM expression / window plans with byte-identical DuckDB
twins (driver entries `hash_sample`, `per_source_cap`); determinism comes
from content hashes and total orders, never RNG state, so reruns and
resumes produce identical corpora at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from iresearch_spark.textops.common import md5_long


def hash_sample(docs: DataFrame, rate_permille: int = 100) -> DataFrame:
    """Deterministic stable sampling: keep doc_id iff its md5 bucket
    (uniform in [0, 1000)) < rate_permille. The decision is a pure
    function of the doc key — stable across reruns, cluster sizes, and
    partial failures (unlike `df.sample`, whose RNG is partition-seeded)
    — and composable: a 100 permille corpus is a superset of the 50
    permille one. One narrow scan, no shuffle."""
    if not 0 <= rate_permille <= 1000:
        raise ValueError("rate_permille must be in [0, 1000]")
    bucket = md5_long(F.col("doc_id").cast("string")) % 1000
    return (
        docs.select("doc_id")
        .withColumn("bucket", bucket.cast("int"))
        .filter(F.col("bucket") < rate_permille)
        .orderBy("doc_id")
    )


def hash_sample_sql(rate_permille: int = 100) -> str:
    return f"""SELECT doc_id,
       (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000)::INT
         AS bucket
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000
      < {rate_permille}
ORDER BY doc_id"""


def per_source_cap(docs: DataFrame, cap: int = 3) -> DataFrame:
    """Domain balancing: keep at most `cap` docs per source (the
    per-domain cap every web-corpus recipe applies so no single host
    dominates), deterministic preference (n_chars desc, doc_id asc).

    One row_number window per source key: partition-local work after a
    single hash shuffle on source; skewed giant sources cost one fat
    partition — at 10^12 docs pre-aggregate with a per-partition head-cap
    (each partition only needs its own top `cap`) before the global
    window, the same two-phase trick the engine's top-k uses."""
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= cap)
        .select("doc_id", "source", "rn")
        .orderBy("source", "doc_id")
    )


def per_source_cap_sql(cap: int = 3) -> str:
    return f"""SELECT doc_id, source, rn FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
         )::INT AS rn
  FROM documents
)
WHERE rn <= {cap} ORDER BY source, doc_id"""
