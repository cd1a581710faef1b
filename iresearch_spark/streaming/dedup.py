"""Streaming exact dedup: first-occurrence-wins over a document stream.

The training-data companion to the batch dedup family (textops.dedup):
a crawler stream re-delivers identical pages (re-crawls, mirror hosts,
retry duplicates), and the pipeline wants each distinct content exactly
once BEFORE it pays tokenize/index/embed cost downstream.

Spark-first shape: this is a keyed-state streaming op, and Spark already
ships the right primitive — `dropDuplicatesWithinWatermark` backed by the
keyed state store — so the operator composes built-ins instead of a
custom applyInPandasWithState loop. The dedup key is the content hash
(md5 of the content column, the same key textops.dedup.exact_duplicates
groups on), and the event-time watermark BOUNDS THE STATE: a duplicate
arriving within `horizon` of the first occurrence is dropped; state for
older keys is evicted, so state size is O(docs per horizon), never
O(corpus) — the property that lets this run forever on a 10^12-doc
stream. A re-delivery later than the horizon passes through (and the
batch-side exact dedup, which sees the whole corpus, catches it at the
next compaction — the standard streaming/batch split of a kappa
pipeline).

Composes with the ingest path:

    dedup_stream(raw) -> start_index_stream(...)  # index distinct pages
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    stream_df: DataFrame,
    content_col: str = "text",
    ts_col: str = "warc_ts",
    horizon: str = "1 hour",
    extra_key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """First-occurrence-wins exact dedup on a streaming DataFrame.

    stream_df: a streaming DataFrame with `content_col` and an event-time
    `ts_col`. `horizon` is the dedup window AND the state bound: equal
    content re-arriving within it is dropped. `extra_key_cols` widens the
    key (e.g. ("lang",) to dedup per-language).

    Null-content rows never collapse into each other: md5(NULL) is NULL
    and `dropDuplicatesWithinWatermark` treats NULL keys as equal, so the
    key falls back to a row-identity surrogate (url if present, else a
    non-deterministic unique id) — a crawler row with no content is not a
    "duplicate" of another contentless row, and silently discarding
    documents on a null column would be data loss, not dedup.

    Returns the deduped streaming DataFrame with the original columns."""
    # coalesce inside the concat: Spark concat is null-propagating, so a
    # null-content row whose url is ALSO null must still get a unique
    # surrogate — otherwise all such rows share a NULL key and collapse.
    fallback = (
        F.concat(
            F.lit("\x00null:"),
            F.coalesce(F.col("url"), F.expr("uuid()")),
        )
        if "url" in stream_df.columns
        else F.concat(F.lit("\x00null:"), F.expr("uuid()"))
    )
    keyed = stream_df.withColumn(
        "_chash",
        F.coalesce(F.md5(F.col(content_col).cast("binary")), fallback),
    )
    return (
        keyed.withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["_chash", *extra_key_cols])
        .drop("_chash")
    )
