"""Adapter from the driver's `documents` table (FIXTURES.md §5) to the
engine's corpus shape (url, warc_ts, html, text, lang).

url = zero-padded doc_id so the per-segment url sort is the numeric doc_id
order and outputs can be mapped back via CAST(url AS BIGINT)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def documents_as_corpus(
    spark, sf_dir: str, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
        *[F.col(c) for c in extra_cols],
    )
