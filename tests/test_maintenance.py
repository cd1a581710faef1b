"""Index maintenance: append builds, delete-by-query tombstones, segment
merge with docID rebase, tier consolidation (SURVEY.md S4/M2/M4, mirrored
from [up] tests/index/consolidation_tests.cpp + merge_writer_tests.cpp).

Invariant used throughout: BM25 results under tie="url" depend only on
(tf, dl, N, avgdl, df), never on segment layout — so any append/merge
sequence over the same corpus must return byte-identical (url, score)
lists, and the session unit_index (single 4-segment build) is the golden.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from iresearch_spark.build import build_index
from iresearch_spark.build.merge import delete_by_query, merge_segments
from iresearch_spark.build.policy import (
    consolidate,
    consolidate_bytes_accum,
    consolidate_count,
    consolidate_tier,
)
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher
from iresearch_spark.store import SnapshotStore

QUERIES = {
    0: qf.Term("w3"),
    1: qf.And(qf.Term("w1"), qf.Term("w7")),
    2: qf.Or(qf.Term("w2"), qf.Term("w40")),
    3: qf.Prefix("w1", scored_terms_limit=16),
}


def _results(spark, store, k=10):
    s = IndexSearcher(spark, store)
    rows = s.search_batch(QUERIES, k=k, with_urls=True, tie="url").collect()
    return [
        (r["qid"], r["rank"], r["url"], round(r["score"], 9)) for r in rows
    ]


@pytest.fixture(scope="module")
def split_store(spark, unit_corpus, tmp_path_factory):
    """Same 1k corpus as unit_index, built as 600-doc base + 400-doc
    append (4 segments each -> 8 live segments)."""
    root = str(tmp_path_factory.mktemp("index_split"))
    store = SnapshotStore(root)
    first = spark.createDataFrame(unit_corpus.iloc[:600])
    second = spark.createDataFrame(unit_corpus.iloc[600:])
    build_index(spark, first, store, n_segments=4, source="base")
    build_index(spark, second, store, n_segments=4, source="delta", mode="append")
    return store


def _copy_store(store: SnapshotStore, tmp_path) -> SnapshotStore:
    dst = str(tmp_path / "store_copy")
    shutil.copytree(store.root, dst)
    return SnapshotStore(dst)


def test_append_matches_single_build(spark, unit_index, split_store):
    base_store, _sid, _oracle = unit_index
    assert len(split_store.snapshot()["segments"]) == 8
    assert split_store.snapshot()["operation"] == "append"
    assert _results(spark, base_store) == _results(spark, split_store)


def test_merge_preserves_results(spark, unit_index, split_store, tmp_path):
    store = _copy_store(split_store, tmp_path)
    seg_ids = [int(s["seg_id"]) for s in store.snapshot()["segments"]][:4]
    merge_segments(spark, store, seg_ids)
    snap = store.snapshot()
    assert len(snap["segments"]) == 5
    assert snap["operation"] == "consolidate"
    base_store, _sid, _oracle = unit_index
    assert _results(spark, base_store) == _results(spark, store)


def test_delete_by_query(spark, split_store, tmp_path):
    store = _copy_store(split_store, tmp_path)
    before_all = _results(spark, store, k=1 << 20)  # full rankings
    victims = {
        r["url"]
        for r in IndexSearcher(spark, store)
        .search_batch({0: qf.Term("w3")}, k=1 << 30, with_urls=True)
        .collect()
    }
    assert victims
    delete_by_query(spark, store, qf.Term("w3"))
    assert store.snapshot()["operation"] == "delete"
    after = _results(spark, store, k=10)
    # q0 (Term w3) now empty
    assert not [t for t in after if t[0] == 0]
    # every other query: exactly the pre-delete ranking minus the masked
    # docs, truncated to k — scores of survivors unchanged (stats stay
    # segment-static until merge)
    for q in (1, 2, 3):
        expect = [
            (u, s) for (qq, _r, u, s) in before_all if qq == q and u not in victims
        ][:10]
        got = [(u, s) for (qq, _r, u, s) in after if qq == q]
        assert got == expect, f"query {q}"


def test_delete_uses_match_only_plan(spark, split_store):
    """M4: the delete path must rank nothing — no Window (global sort of
    the match set) anywhere in the executed plan, and every matching doc
    is returned (not a top-k prefix)."""
    s = IndexSearcher(spark, split_store)
    matched = s.match_docs(qf.Term("w3"))
    plan = matched._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    n_match = matched.count()
    n_topk_all = s.search_batch(
        {0: qf.Term("w3")}, k=1 << 30, with_urls=False
    ).count()
    assert n_match == n_topk_all and n_match > 0


def test_merge_compacts_masked_docs(spark, unit_corpus, split_store, tmp_path):
    store = _copy_store(split_store, tmp_path)
    n_before = store.snapshot()["stats"]["n_docs"]
    victims = {
        r["url"]
        for r in IndexSearcher(spark, store)
        .search_batch({0: qf.Term("w3")}, k=1 << 30, with_urls=True)
        .collect()
    }
    delete_by_query(spark, store, qf.Term("w3"))
    seg_ids = [int(s["seg_id"]) for s in store.snapshot()["segments"]]
    merge_segments(spark, store, seg_ids)
    snap = store.snapshot()
    assert len(snap["segments"]) == 1
    assert snap["stats"]["n_docs"] == n_before - len(victims)
    assert not any(s.get("mask_path") for s in snap["segments"])
    # a merged index must be indistinguishable from a FRESH build over the
    # surviving docs: same live docs -> same stats -> identical (url, score)
    # (post-merge stats exclude compacted docs, unlike the masked snapshot)
    fresh_root = str(tmp_path / "fresh")
    fresh = SnapshotStore(fresh_root)
    survivors = unit_corpus[~unit_corpus["url"].isin(victims)]
    build_index(
        spark, spark.createDataFrame(survivors), fresh, n_segments=4, source="fresh"
    )
    assert _results(spark, store) == _results(spark, fresh)


def test_majority_delete_stays_distributed(spark, split_store, tmp_path):
    """A delete matching MOST of a multi-segment corpus: masks flow
    through the cogrouped DataFrame path (no driver mask dict, no
    all-segment closures — VERDICT r2 item 2), a second delete unions
    per-segment via the same cogroup, counts come back distributively,
    and the compacting merge drops every tombstone."""
    from iresearch_spark.build.policy import masked_counts

    store = _copy_store(split_store, tmp_path)
    n_total = store.snapshot()["stats"]["n_docs"]
    keep_flt = qf.Term("w40")
    survivors = {
        r["url"]
        for r in IndexSearcher(spark, store)
        .search_batch({0: keep_flt}, k=1 << 30, with_urls=True)
        .collect()
    }
    # delete everything that does NOT contain w40 -> majority of corpus
    delete_by_query(spark, store, qf.Not(qf.AllDocs(), keep_flt))
    counts = masked_counts(spark, store, store.snapshot())
    assert sum(counts.values()) == n_total - len(survivors)
    assert sum(counts.values()) > n_total // 2, "must be a majority delete"
    assert len(counts) == 8, "every segment carries a mask"
    # second delete: cogroup-union with the existing masks (w3 subset of
    # survivors may overlap already-masked docs in other segments)
    delete_by_query(spark, store, qf.Term("w3"))
    w3_urls = {
        r["url"]
        for r in IndexSearcher(spark, split_store)
        .search_batch({0: qf.Term("w3")}, k=1 << 30, with_urls=True)
        .collect()
    }
    counts2 = masked_counts(spark, store, store.snapshot())
    assert sum(counts2.values()) == n_total - len(survivors - w3_urls)
    # compacting merge drops all tombstones and survives only w40-not-w3
    seg_ids = [int(s["seg_id"]) for s in store.snapshot()["segments"]]
    merge_segments(spark, store, seg_ids)
    snap = store.snapshot()
    assert snap["stats"]["n_docs"] == len(survivors - w3_urls)
    assert not any(s.get("mask_path") for s in snap["segments"])
    assert snap["lineage"][0]["dropped_masked"] == n_total - len(
        survivors - w3_urls
    )
    got = _results(spark, store, k=1 << 20)
    got_urls = {u for (_q, _r, u, _s) in got if _q == 0}  # w3 query: empty
    assert not got_urls


def test_tier_policy_pure():
    def seg(i, n_docs=100):
        return {"seg_id": i, "n_docs": n_docs, "sum_dl": n_docs * 10}

    # ten equal small segments -> merge the max window
    segs = [seg(i) for i in range(10)]
    sizes = {i: 1 << 20 for i in range(10)}
    cand = consolidate_tier(segs, sizes, min_segments=2, max_segments=8)
    assert len(cand) == 8
    # one huge + one small: poor balance, below min_score -> no merge
    sizes2 = {0: 10 << 30, 1: 1 << 20}
    assert (
        consolidate_tier(
            [seg(0), seg(1)],
            sizes2,
            min_segments=2,
            max_segments=10,
            max_segments_bytes=100 << 30,
            min_score=0.3,
        )
        == []
    )
    # byte cap respected
    sizes3 = {i: 1 << 30 for i in range(6)}
    cand3 = consolidate_tier(
        [seg(i) for i in range(6)],
        sizes3,
        min_segments=2,
        max_segments=6,
        max_segments_bytes=3 << 30,
    )
    assert 2 <= len(cand3) <= 3
    # count / bytes_accum variants
    assert consolidate_count([seg(i) for i in range(9)], {}, max_segments=8) == list(
        range(9)
    )
    assert consolidate_count([seg(i) for i in range(3)], {}, max_segments=8) == []
    acc = consolidate_bytes_accum(
        [seg(i) for i in range(4)], {i: 100 for i in range(4)}, byte_budget=250
    )
    assert acc == [0, 1]


def test_policy_variants_pure():
    """M2 completion: bytes / docs_live / docs_fill policy selection
    ([up] core/utils/index_utils.cpp consolidate_bytes,
    consolidate_docs_live, consolidate_docs_fill)."""
    from iresearch_spark.build.policy import (
        consolidate_bytes,
        consolidate_docs_fill,
        consolidate_docs_live,
    )

    def seg(i, n_docs=100):
        return {"seg_id": i, "n_docs": n_docs, "sum_dl": n_docs * 10}

    # bytes: two tiny + one huge -> merge the tiny pair
    segs = [seg(0), seg(1), seg(2)]
    sizes = {0: 10, 1: 20, 2: 10_000}
    assert consolidate_bytes(segs, sizes, threshold=0.5) == [0, 1]
    # all equal -> nothing below threshold x avg
    assert consolidate_bytes(segs, {0: 100, 1: 100, 2: 100}, threshold=0.5) == []
    # docs_live: masked docs shrink the live count
    segs2 = [seg(0, 1000), seg(1, 1000), seg(2, 1000)]
    masked = {0: 900, 1: 880}
    assert consolidate_docs_live(segs2, {}, threshold=0.5, masked=masked) == [0, 1]
    assert consolidate_docs_live(segs2, {}, threshold=0.5, masked={}) == []
    # docs_fill: fill ratio below threshold regardless of absolute size
    assert consolidate_docs_fill(segs2, {}, threshold=0.8, masked={1: 300}) == [1]
    assert consolidate_docs_fill(segs2, {}, threshold=0.8, masked={1: 100}) == []


def test_consolidate_docs_fill_end_to_end(spark, split_store, tmp_path):
    """Delete-heavy segments get compacted by the docs_fill-driven loop,
    and results stay identical to the pre-delete index minus victims."""
    from iresearch_spark.build.policy import consolidate, consolidate_docs_fill

    store = _copy_store(split_store, tmp_path)
    delete_by_query(spark, store, qf.Term("w3"))
    n_before = len(store.snapshot()["segments"])
    sids = consolidate(spark, store, consolidate_docs_fill, threshold=0.99)
    assert sids, "docs_fill should trigger at threshold 0.99"
    snap = store.snapshot()
    # the delete-heavy segments were merged away and tombstones compacted
    assert len(snap["segments"]) < n_before
    assert not any(s.get("mask_path") for s in snap["segments"])
    after = _results(spark, store, k=10)
    assert not [t for t in after if t[0] == 0]  # w3 gone


def test_consolidate_loop(spark, unit_index, split_store, tmp_path):
    store = _copy_store(split_store, tmp_path)
    sids = consolidate(
        spark, store, consolidate_count, max_segments=1
    )
    assert sids, "expected at least one merge round"
    assert len(store.snapshot()["segments"]) == 1
    base_store, _sid, _oracle = unit_index
    assert _results(spark, base_store) == _results(spark, store)
    # lineage records the merge provenance
    assert "merge(" in store.snapshot()["lineage"][0]["source"]


def test_expire_and_gc(spark, split_store, tmp_path):
    store = _copy_store(split_store, tmp_path)
    seg_ids = [int(s["seg_id"]) for s in store.snapshot()["segments"]]
    merge_segments(spark, store, seg_ids)
    import os

    data_root = os.path.join(store.root, "data")
    n_dirs_before = len(os.listdir(data_root))
    assert n_dirs_before >= 3  # base commit, delta commit, merge commit
    # nothing reclaimable while old snapshots still reference old commits
    assert store.gc() == []
    expired = store.expire_snapshots(keep_last=1)
    assert len(expired) == 2
    removed = store.gc()
    assert removed, "old commit dirs should be reclaimed"
    assert len(os.listdir(data_root)) < n_dirs_before
    # the surviving snapshot still reads fine
    after = _results(spark, store)
    assert after and store.snapshots() == [store.current_snapshot_id()]


def test_merge_all_masked_drops_segments(spark, split_store, tmp_path):
    """Merging a set whose every doc is tombstoned must not try to write an
    empty segment: the consolidate commit simply drops the source segments
    (the reference likewise discards an empty merge_writer output)."""
    store = _copy_store(split_store, tmp_path)
    delete_by_query(spark, store, qf.AllDocs())
    seg_ids = [int(s["seg_id"]) for s in store.snapshot()["segments"]]
    merge_segments(spark, store, seg_ids)
    snap = store.snapshot()
    assert snap["segments"] == []
    assert snap["stats"]["n_docs"] == 0
    assert (
        IndexSearcher(spark, store)
        .search_batch({0: qf.Term("w3")}, k=10)
        .count()
        == 0
    )


def test_merge_docid_assignment_parts_invariant(spark, split_store, tmp_path):
    """The distributed url-sort docID assignment (range partition + local
    row_number + offset cumsum) must be byte-identical at any parallelism:
    merging the same segments at parts=2 and parts=16 yields the same
    (doc_id, url) table and the same ranked results."""
    docs_tables, results = [], []
    for parts in (2, 16):
        store = _copy_store(split_store, tmp_path / f"p{parts}")
        seg_ids = [int(s["seg_id"]) for s in store.snapshot()["segments"]]
        merge_segments(spark, store, seg_ids, parts=parts)
        docs = (
            store.read_docs(spark)
            .select("doc_id", "url", "dl")
            .orderBy("doc_id")
            .collect()
        )
        docs_tables.append([(r["doc_id"], r["url"], r["dl"]) for r in docs])
        results.append(_results(spark, store))
    assert docs_tables[0] == docs_tables[1]
    assert results[0] == results[1]


def test_merge_holds_no_perdoc_driver_state(
    spark, split_store, tmp_path, monkeypatch
):
    """The merge must never ship per-doc state through a Python-side
    broadcast (the old design broadcast the whole merge set's docID remap
    plus the merged dl norms): fail the run if sc.broadcast is called at
    all during merge_segments — the remap/norms blobs must flow through
    cogrouped DataFrames instead. (JVM broadcast-hash joins of the tiny
    per-partition offset table are unaffected: they never call the
    Python broadcast API.)"""
    from pyspark import SparkContext

    store = _copy_store(split_store, tmp_path)
    delete_by_query(spark, store, qf.Term("w7"))

    def _no_broadcast(self, value):
        raise AssertionError(
            f"merge must not sc.broadcast per-doc state, got {type(value)}"
        )

    seg_ids = [int(s["seg_id"]) for s in store.snapshot()["segments"]]
    with monkeypatch.context() as m:
        m.setattr(SparkContext, "broadcast", _no_broadcast)
        merge_segments(spark, store, seg_ids)
    assert len(store.snapshot()["segments"]) == 1


# --------------------------------------------------------------- rollback
# Iceberg rollback_to_snapshot / the reference abandoning a bad generation
# by reopening an older index_meta ([up] core/index/index_meta.hpp keeps
# prior segments_N files until cleaned for exactly this recovery path).


def test_rollback_restores_deleted_docs(spark, unit_index, split_store, tmp_path):
    base_store, _sid, _oracle = unit_index
    store = _copy_store(split_store, tmp_path)
    pre = store.current_snapshot_id()
    golden = _results(spark, base_store)
    delete_by_query(spark, store, qf.Term("w3"))
    assert _results(spark, store) != golden
    sid = store.rollback_to(pre)
    snap = store.snapshot()
    assert sid == store.current_snapshot_id() == pre + 2  # delete, rollback
    assert snap["operation"] == "rollback"
    assert snap["rolled_back_to"] == pre
    assert snap["parent_id"] == pre + 1
    # byte-identical restoration: segments, stats, sort, fields
    target = store.snapshot(pre)
    assert snap["segments"] == target["segments"]
    assert snap["stats"] == target["stats"]
    assert _results(spark, store) == golden


def test_rollback_survives_expire_and_gc_then_append(
    spark, unit_corpus, split_store, tmp_path
):
    """After rolling back over a consolidation, expire+gc must sweep the
    abandoned merge generation's data but keep every dir the rollback
    references; appends on top of the rollback keep working."""
    store = _copy_store(split_store, tmp_path)
    pre = store.current_snapshot_id()
    golden = _results(spark, store)
    seg_ids = [int(s["seg_id"]) for s in store.snapshot()["segments"]]
    merge_segments(spark, store, seg_ids)
    merged_dirs = {
        s["docs_path"].split("/")[1] for s in store.snapshot()["segments"]
    }
    store.rollback_to(pre)
    store.expire_snapshots(keep_last=1)  # drops build/append/merge manifests
    removed = store.gc()
    # the abandoned merge generation is swept; the restored dirs survive
    assert merged_dirs <= set(removed)
    assert _results(spark, store) == golden
    extra = spark.createDataFrame(unit_corpus.iloc[:50])
    build_index(spark, extra, store, n_segments=1, source="post_rb",
                mode="append")
    assert len(store.snapshot()["segments"]) == 9


def test_rollback_edge_cases(spark, split_store, tmp_path):
    store = _copy_store(split_store, tmp_path)
    cur = store.current_snapshot_id()
    # no-op: rolling back to the current generation publishes nothing
    assert store.rollback_to(cur) == cur
    assert store.current_snapshot_id() == cur
    with pytest.raises(FileNotFoundError, match="does not exist"):
        store.rollback_to(cur + 5)
    # cipher identity: a key-opened store cannot restore a plaintext
    # generation (the published manifest must be readable with the key
    # the caller holds)
    from iresearch_spark.store import derive_key

    keyed = SnapshotStore(store.root, key=derive_key("nope"))
    with pytest.raises(ValueError, match="cipher"):
        keyed.rollback_to(cur - 1)


def test_abort_staged_discards_checkpoint(tmp_path):
    """index_writer::rollback(): drop the staged-but-uncommitted build
    checkpoint without touching committed generations."""
    import json
    import os

    store = SnapshotStore(str(tmp_path / "abort_store"))
    assert store.abort_staged() is False  # nothing staged
    staged_dir = store.new_commit_dir()
    with open(os.path.join(staged_dir, "part-0"), "w") as f:
        f.write("x")
    with open(os.path.join(store.root, "_staging.json"), "w") as f:
        json.dump({"key": "k", "dir": staged_dir}, f)
    assert store.abort_staged() is True
    assert not os.path.exists(os.path.join(store.root, "_staging.json"))
    assert not os.path.isdir(staged_dir)
    assert store.abort_staged() is False
