"""Structured Streaming ingest: near-real-time indexing as micro-batch
appends with exactly-once snapshot commits and policy-bounded segment
counts.

Plays the role of the reference's NRT writer loop ([up]
core/index/index_writer.cpp: a writer flushes small segments and commits
new index generations while background consolidation folds them; readers
`reopen()` pinned generations). The Spark-first shape is

    readStream -> foreachBatch( build_index(mode="append") )
               -> consolidate(policy)        [per batch, bounded rounds]

so each micro-batch becomes one (or a few) fresh segments appended to the
live generation, and the consolidation policy keeps the total segment
count bounded regardless of stream length — exactly the reference's
flush-small/merge-in-background regime.

Exactly-once semantics: Spark's foreachBatch is at-least-once under
failures/retries; idempotence comes from the snapshot manifest itself.
Every streaming commit records {stream_name: batch_id} in the manifest
(SnapshotStore.commit(streams=...), carried forward through every later
commit including maintenance merges), and a replayed batch whose id is
<= the committed watermark is skipped BEFORE any write. The watermark
and the data publish are ONE atomic manifest rename, so there is no
crash window between "data visible" and "batch recorded". A crash
mid-build resumes from the staged tokenize checkpoint: build_index's
staging key embeds the batch id via `source`, so the retried batch picks
up its own partial work and never mixes with another batch's.

Scale notes (100 TB / 10^12 docs): each micro-batch is an independent
bounded build (one wide tokenize, one per-segment encode shuffle) whose
cost is proportional to the BATCH, not the index; consolidation merges
are likewise bounded by the policy's byte budget. The driver-side work
per batch is O(segments) manifest JSON — no per-doc state. Stream state
(file-source listing, Kafka offsets) lives in Spark's own
checkpointLocation; index state lives in the store; the two commit
independently, which is safe BECAUSE the index side is idempotent.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from iresearch_spark.build.indexer import build_index
from iresearch_spark.store import SnapshotStore


def index_microbatch(
    batch_df: DataFrame,
    batch_id: int,
    store: SnapshotStore,
    *,
    name: str,
    n_segments: int = 1,
    fields=None,
    consolidate_policy: Callable | None = None,
    policy_kwargs: dict | None = None,
    parts: int | None = None,
    band_bits: int | None = None,
    stored_cols: tuple[str, ...] = (),
) -> int | None:
    """Index ONE micro-batch (the foreachBatch body). Returns the snapshot
    id committed for this batch, or None when the batch was skipped
    (already-committed replay, or empty).

    Safe to call from a foreachBatch replay: the watermark check makes a
    duplicate delivery a no-op, and `source` embeds the batch id so a
    half-finished retry resumes its own staged checkpoint."""
    spark = batch_df.sparkSession
    wm = store.stream_watermark(name)
    if wm is not None and batch_id <= wm:
        return None  # at-least-once replay of a committed batch
    # Empty batches advance no watermark and write nothing; replaying an
    # empty batch is harmless, so skipping keeps the manifest monotonic
    # without a noop commit per idle trigger.
    if not batch_df.take(1):
        return None
    sid = build_index(
        spark,
        batch_df,
        store,
        n_segments=n_segments,
        fields=fields,
        parts=parts,
        band_bits=band_bits,
        source=f"{name}#batch={batch_id}",
        mode="append" if store.current_snapshot_id() is not None else "replace",
        streams={name: int(batch_id)},
        stored_cols=stored_cols,
    )
    if consolidate_policy is not None:
        from iresearch_spark.build.policy import consolidate

        done = consolidate(
            spark, store, consolidate_policy, **(policy_kwargs or {})
        )
        if done:
            sid = done[-1]
    return sid


def start_index_stream(
    stream_df: DataFrame,
    store: SnapshotStore,
    *,
    name: str,
    checkpoint_dir: str,
    n_segments: int = 1,
    fields=None,
    consolidate_policy: Callable | None = None,
    policy_kwargs: dict | None = None,
    parts: int | None = None,
    band_bits: int | None = None,
    stored_cols: tuple[str, ...] = (),
    available_now: bool = False,
    processing_time: str | None = None,
):
    """Attach the micro-batch indexer to a streaming DataFrame and start
    it; returns the StreamingQuery.

    `stream_df` is any readStream source with (a superset of) the corpus
    shape (url, warc_ts, html, text, lang, ...). `checkpoint_dir` is
    Spark's own stream-progress checkpoint (source offsets); index
    durability and exactly-once live in the SnapshotStore manifest, not
    here. `available_now=True` drains everything currently available and
    stops (the batch-backfill trigger); `processing_time` e.g. "10
    seconds" runs continuously."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        index_microbatch(
            batch_df,
            batch_id,
            store,
            name=name,
            n_segments=n_segments,
            fields=fields,
            consolidate_policy=consolidate_policy,
            policy_kwargs=policy_kwargs,
            parts=parts,
            band_bits=band_bits,
            stored_cols=stored_cols,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_process)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
