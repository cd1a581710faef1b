"""Structured Streaming ingest (streaming/ingest.py): micro-batch appends
must be exactly-once, resumable, policy-bounded, and converge to the same
index a single batch build would produce ([up] index_writer.cpp NRT
flush/commit loop + background consolidation)."""

import glob
import os

import pytest

from iresearch_spark.build import build_index
from iresearch_spark.build.policy import consolidate_count
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher
from iresearch_spark.store import SnapshotStore
from iresearch_spark.streaming import index_microbatch, start_index_stream


def _drop_chunks(spark, corpus_pdf, src_dir, bounds, start=0):
    """Write corpus rows [lo, hi) as one parquet FILE per chunk (atomic
    drop into the watched dir, the way a crawler would land WARC rollups)."""
    import shutil

    os.makedirs(src_dir, exist_ok=True)
    for i, (lo, hi) in enumerate(bounds, start=start):
        stage = os.path.join(src_dir, f"_stage_{i}")
        (
            spark.createDataFrame(corpus_pdf.iloc[lo:hi])
            .coalesce(1)
            .write.parquet(stage, mode="overwrite")
        )
        part = glob.glob(os.path.join(stage, "*.parquet"))[0]
        os.rename(part, os.path.join(src_dir, f"chunk_{i}.parquet"))
        shutil.rmtree(stage)


def _stream_df(spark, src_dir):
    schema = spark.read.parquet(src_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def _topk(spark, store, k=10):
    s = IndexSearcher(spark, store)
    res = s.search_batch(
        {0: qf.Or(qf.Term("data"), qf.Term("table"))},
        k=k,
        with_urls=True,
        tie="url",
        score_round=6,
    )
    return [(r["url"], r["score"]) for r in res.orderBy("rank").collect()]


@pytest.fixture(scope="module")
def stream_setup(spark, unit_corpus, tmp_path_factory):
    """One drained availableNow stream over 3 parquet chunk drops."""
    root = tmp_path_factory.mktemp("streaming")
    src_dir = str(root / "src")
    _drop_chunks(spark, unit_corpus, src_dir, [(0, 350), (350, 700), (700, 1000)])
    store = SnapshotStore(str(root / "index"))
    q = start_index_stream(
        _stream_df(spark, src_dir),
        store,
        name="warc",
        checkpoint_dir=str(root / "ckpt"),
        n_segments=2,
        available_now=True,
    )
    q.awaitTermination(300)
    return store, src_dir, str(root / "ckpt"), root


def test_stream_equals_batch_build(spark, unit_corpus, stream_setup, tmp_path):
    store, _, _, _ = stream_setup
    assert store.stream_watermark("warc") == 2  # 3 files, 1 per trigger
    snap = store.snapshot()
    assert len(snap["segments"]) == 6  # 3 batches x 2 segments
    # per-batch lineage carries the stream source fingerprint
    assert any("warc#batch=" in ln["source"] for ln in snap["lineage"])

    fresh = SnapshotStore(str(tmp_path / "fresh"))
    build_index(
        spark, spark.createDataFrame(unit_corpus), fresh, n_segments=4,
        source="batch",
    )
    assert store.global_stats()["n_docs"] == fresh.global_stats()["n_docs"]
    assert store.global_stats()["sum_dl"] == fresh.global_stats()["sum_dl"]
    # rankings equal a single batch build (global stats + url tie-break
    # make scores independent of the segment layout)
    assert _topk(spark, store) == _topk(spark, fresh)


def test_replayed_batch_is_noop(spark, unit_corpus, stream_setup):
    store, src_dir, _, _ = stream_setup
    before = store.current_snapshot_id()
    batch0 = spark.read.parquet(os.path.join(src_dir, "chunk_0.parquet"))
    # at-least-once redelivery of every already-committed batch id
    for bid in (0, 1, 2):
        assert (
            index_microbatch(batch0, bid, store, name="warc", n_segments=2)
            is None
        )
    assert store.current_snapshot_id() == before
    assert store.global_stats()["n_docs"] == 1000


def test_restart_indexes_only_new_files(spark, unit_corpus, stream_setup):
    """A restarted stream (same Spark checkpoint) must index ONLY the file
    dropped after the first drain, as one new micro-batch."""
    store, src_dir, ckpt, root = stream_setup
    extra = unit_corpus.copy()
    extra = extra.iloc[0:100]
    extra["url"] = "restart-" + extra["url"].astype(str)
    _drop_chunks(spark, extra, src_dir, [(0, 100)], start=3)
    q = start_index_stream(
        _stream_df(spark, src_dir),
        store,
        name="warc",
        checkpoint_dir=ckpt,
        n_segments=2,
        available_now=True,
    )
    q.awaitTermination(300)
    assert store.stream_watermark("warc") == 3
    assert store.global_stats()["n_docs"] == 1100
    srcs = {ln["source"] for ln in store.snapshot()["lineage"]}
    assert srcs == {"warc#batch=3"}  # only the new batch in the last commit


def test_stream_with_consolidation_bounds_segments(
    spark, unit_corpus, tmp_path
):
    """consolidate_count in the batch loop keeps the live segment count
    bounded regardless of stream length, and the final index still matches
    a fresh batch build."""
    src_dir = str(tmp_path / "src")
    _drop_chunks(
        spark,
        unit_corpus,
        src_dir,
        [(0, 200), (200, 400), (400, 600), (600, 800), (800, 1000)],
    )
    store = SnapshotStore(str(tmp_path / "index"))
    q = start_index_stream(
        _stream_df(spark, src_dir),
        store,
        name="warc",
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_segments=2,
        consolidate_policy=consolidate_count,
        policy_kwargs={"max_segments": 3},
        available_now=True,
    )
    q.awaitTermination(300)
    snap = store.snapshot()
    assert len(snap["segments"]) <= 3
    assert store.stream_watermark("warc") == 4
    assert store.global_stats()["n_docs"] == 1000

    fresh = SnapshotStore(str(tmp_path / "fresh"))
    build_index(
        spark, spark.createDataFrame(unit_corpus), fresh, n_segments=4,
        source="batch",
    )
    assert _topk(spark, store) == _topk(spark, fresh)


def test_dedup_stream_drops_within_horizon(spark, unit_corpus, tmp_path):
    """dedup_stream: identical content re-delivered within the watermark
    horizon is dropped (first occurrence wins); distinct content passes.
    The indexed result must equal a batch build over the DISTINCT docs."""
    import pandas as pd

    from iresearch_spark.streaming import dedup_stream

    base = unit_corpus.iloc[:40].copy()
    dup = base.iloc[:15].copy()  # re-delivery of the first 15 pages
    dup["url"] = dup["url"] + "?mirror"  # different url, same content
    dup["warc_ts"] = dup["warc_ts"] + pd.Timedelta(minutes=5)
    src = str(tmp_path / "src")
    _drop_chunks(spark, pd.concat([base, dup], ignore_index=True), src,
                 [(0, 40), (40, 55)])

    store = SnapshotStore(str(tmp_path / "idx"))
    deduped = dedup_stream(_stream_df(spark, src), horizon="1 hour")
    q = start_index_stream(
        deduped, store,
        name="warc", checkpoint_dir=str(tmp_path / "chk"),
        n_segments=2, available_now=True,
    )
    q.awaitTermination(300)

    s = IndexSearcher(spark, store)
    assert s.n_docs == 40  # every mirror re-delivery was dropped
    urls = {
        r["url"]
        for r in s.store.read_docs(spark, s.sid).select("url").collect()
    }
    assert urls == set(base["url"])  # first occurrences won


def test_dedup_stream_null_content_passes_through(spark, unit_corpus, tmp_path):
    """Null-content rows are NOT duplicates of each other: md5(NULL) is
    NULL and dropDuplicatesWithinWatermark treats NULL keys as equal, so
    without the url fallback every contentless row within the horizon
    would silently collapse to one — data loss, not dedup."""
    import pandas as pd

    from iresearch_spark.streaming import dedup_stream

    base = unit_corpus.iloc[:6].copy()
    base.loc[base.index[:3], "text"] = None  # 3 contentless rows
    dup = base.iloc[4:5].copy()  # one real duplicate (same content)
    dup["url"] = dup["url"] + "?mirror"
    dup["warc_ts"] = dup["warc_ts"] + pd.Timedelta(minutes=5)
    src = str(tmp_path / "src")
    _drop_chunks(spark, pd.concat([base, dup], ignore_index=True), src,
                 [(0, 7)])

    out = dedup_stream(_stream_df(spark, src), horizon="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("nulldedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select url, text from nulldedup").collect()
    urls = {r["url"] for r in rows}
    # the mirror re-delivery collapsed; all three null-text rows survived
    assert urls == set(base["url"])
    assert sum(1 for r in rows if r["text"] is None) == 3


def test_dedup_stream_null_content_null_url_rows_survive(
    spark, unit_corpus, tmp_path
):
    """Null-content rows whose url is ALSO null still pass through
    individually: Spark concat is null-propagating, so the fallback key
    must coalesce the url with a unique surrogate or every such row
    within the horizon shares a NULL key and collapses to one."""
    import pandas as pd

    from iresearch_spark.streaming import dedup_stream

    base = unit_corpus.iloc[:6].copy()
    base.loc[base.index[:3], "text"] = None
    base.loc[base.index[:2], "url"] = None  # 2 rows with NO identity
    src = str(tmp_path / "src")
    _drop_chunks(spark, base, src, [(0, 6)])

    out = dedup_stream(_stream_df(spark, src), horizon="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("nullnulldedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select url, text from nullnulldedup").collect()
    assert len(rows) == 6  # nothing collapsed
    assert sum(1 for r in rows if r["url"] is None) == 2
