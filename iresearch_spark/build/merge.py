"""Segment merge + delete-by-query (SURVEY.md S4/M4).

merge_segments reproduces the reference's merge_writer semantics
([up] core/index/merge_writer.cpp): k segments stream into one new
segment; docIDs are rebased by cumulative live-doc offsets in seg_id
order, masked (deleted) docs are dropped and the survivors' docIDs are
compacted; term dictionaries union naturally under groupBy(term); the
new segment's postings/skip/blockmax blobs are re-encoded from the
remapped doc lists.

Spark shape: the docs remap is a per-source-segment vectorized
applyInPandas (offsets precomputed on the driver from segment metadata —
no data-dependent driver loop), and the postings merge is one
groupBy(seg-set terms).applyInPandas — term-parallel, so a single merge
scales out across executors even though the *output* is one logical
segment, and many merge sets can run as independent jobs.

delete_by_query writes per-segment tombstone masks (sorted u32 docID
blobs, the document_mask of [up] core/formats/formats.hpp) and commits a
new snapshot; stats stay segment-static until a merge compacts the masked
docs — the reference behaves the same way (deletes are invisible to
scoring stats until consolidation rewrites the segment).

Scale bound: one merge broadcasts the merged segment's dense dl blob
(built distributively by the norms job, then read back as ONE binary row
of 4 bytes/doc — no per-row driver path) for blockmax recompute inside
merge_term. A merge set stays within the tier policy's max_segments_bytes budget
(exactly the reference's invariant: merge_writer streams ONE bounded
merge at a time; unbounded merges are prevented by policy, not by the
writer).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from iresearch_spark.build import kernels
from iresearch_spark.codec.postings import (
    decode_positions_for,
    decode_postings,
    encode_positions,
    encode_postings,
)
from iresearch_spark.store import SnapshotStore

MASK_SCHEMA = "seg_id int, mask_bin binary"


def _load_masks(store: SnapshotStore, snap: dict) -> dict[int, np.ndarray]:
    """seg_id -> sorted u32 array of deleted docIDs (empty if no mask)."""
    out: dict[int, np.ndarray] = {}
    for seg in snap["segments"]:
        mp = seg.get("mask_path")
        if not mp:
            continue
        import pyarrow.parquet as pq

        tbl = pq.read_table(store.abs_path(mp))
        if tbl.num_rows:
            buf = b"".join(bytes(x) for x in tbl.column("mask_bin").to_pylist())
            out[int(seg["seg_id"])] = np.sort(np.frombuffer(buf, dtype="<u4"))
    return out


def merge_segments(
    spark, store: SnapshotStore, seg_ids: list[int], *, parts: int | None = None
) -> int:
    """Merge `seg_ids` of the current snapshot into one new segment and
    commit; returns the new snapshot id."""
    snap = store.snapshot()
    segs = {int(s["seg_id"]): s for s in snap["segments"]}
    seg_ids = sorted(seg_ids)
    for sid_ in seg_ids:
        if sid_ not in segs:
            raise ValueError(f"segment {sid_} not in current snapshot")
    masks = _load_masks(store, snap)
    parts = parts or spark.sparkContext.defaultParallelism * 2

    # live-doc offsets per source segment (driver-side, from metadata)
    offsets: dict[int, int] = {}
    acc = 0
    for sid_ in seg_ids:
        offsets[sid_] = acc
        acc += int(segs[sid_]["n_docs"]) - len(masks.get(sid_, ()))
    new_seg_id = max(segs) + 1
    commit_dir = store.new_commit_dir()
    docs_dir = os.path.join(commit_dir, "docs")
    post_dir = os.path.join(commit_dir, "postings")
    norms_dir = os.path.join(commit_dir, "norms")

    # ---- docs table: drop masked, rebase docIDs (order-preserving)
    docs = spark.read.parquet(
        *[store.abs_path(segs[s]["docs_path"]) for s in seg_ids]
    )

    def remap_docs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        src = int(key[0])
        pdf = pdf.sort_values("doc_id")
        mask = masks.get(src)
        if mask is not None and len(mask):
            pdf = pdf[~pdf["doc_id"].isin(mask)]
        pdf = pdf.copy()
        pdf["doc_id"] = offsets[src] + np.arange(1, len(pdf) + 1, dtype=np.int64)
        pdf["seg_id"] = np.int32(new_seg_id)
        return pdf

    docs_schema = (
        "seg_id int, doc_id bigint, url string, warc_ts timestamp, "
        "lang string, dl int"
    )
    merged_docs = (
        docs.select("seg_id", "doc_id", "url", "warc_ts", "lang", "dl")
        .groupBy("seg_id")
        .applyInPandas(remap_docs, docs_schema)
    )
    (
        merged_docs.withColumn("seg_part", F.col("seg_id"))
        .write.partitionBy("seg_part")
        .parquet(docs_dir, mode="overwrite")
    )

    # ---- postings: per-term concat with docID remap, re-encode
    post = spark.read.parquet(
        *[store.abs_path(segs[s]["postings_path"]) for s in seg_ids]
    )
    bc_masks = spark.sparkContext.broadcast(
        {k: v for k, v in masks.items() if k in offsets}
    )
    bc_offsets = spark.sparkContext.broadcast(offsets)

    def merge_term(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term = key[0]
        pdf = pdf.sort_values("seg_id")
        mks, offs = bc_masks.value, bc_offsets.value
        all_docs, all_tfs, all_pos = [], [], []
        for row in pdf.itertuples():
            pl = decode_postings(bytes(row.blob))
            docs_a = pl.doc_ids.astype(np.int64)
            tfs_a = pl.tfs.astype(np.int64)
            sel = np.arange(len(docs_a))
            mask = mks.get(int(row.seg_id))
            if mask is not None and len(mask):
                keep = ~np.isin(docs_a, mask)
                # compacted id = old - (#deleted <= old)
                shift = np.searchsorted(mask, docs_a, side="right")
                docs_a, tfs_a, sel = (docs_a - shift)[keep], tfs_a[keep], sel[keep]
            pos_flat = decode_positions_for(
                bytes(row.pos_off), bytes(row.pos_pay), sel, tfs_a
            )
            all_docs.append(docs_a + offs[int(row.seg_id)])
            all_tfs.append(tfs_a)
            all_pos.extend(p for p in pos_flat)
        docs_m = np.concatenate(all_docs) if all_docs else np.empty(0, np.int64)
        if len(docs_m) == 0:
            return pd.DataFrame(
                columns=[f.split()[0] for f in kernels.POSTING_SCHEMA.split(", ")]
            )
        tfs_m = np.concatenate(all_tfs)
        pos_m = (
            np.concatenate(all_pos) if all_pos else np.empty(0, np.int64)
        )
        dls_m = _dls_for(bc_norms.value, docs_m)
        blob, skip, bmax = encode_postings(
            docs_m.astype("<u4"), tfs_m.astype("<u4"), dls_m.astype("<u4")
        )
        pos_off, pos_pay = encode_positions(pos_m.astype(np.int64), tfs_m)
        return pd.DataFrame(
            {
                "seg_id": [np.int32(new_seg_id)],
                "term": [term],
                "df": [int(len(docs_m))],
                "cf": [int(tfs_m.sum())],
                "max_tf": [int(tfs_m.max())],
                "blob": [blob],
                "skip": [skip],
                "bmax": [bmax],
                "pos_off": [pos_off],
                "pos_pay": [pos_pay],
            }
        )

    # ---- norms table FIRST (distributed dense-dl build; merge_term needs
    # the dl array for blockmax recompute). The per-segment dls_bin blob is
    # then read back (one row, 4 bytes/doc of packed binary) and broadcast —
    # never the per-row toPandas path.
    (
        spark.read.parquet(docs_dir)
        .select("seg_id", "doc_id", "dl")
        .groupBy("seg_id")
        .applyInPandas(kernels.norms_builder, kernels.NORMS_SCHEMA)
        .withColumn("seg_part", F.col("seg_id"))
        .write.partitionBy("seg_part")
        .parquet(norms_dir, mode="overwrite")
    )
    import pyarrow.parquet as pq

    norms_tbl = pq.read_table(norms_dir, columns=["dls_bin"])
    assert norms_tbl.num_rows == 1
    dls_arr = np.frombuffer(
        bytes(norms_tbl.column("dls_bin")[0].as_py()), dtype="<u4"
    )
    bc_norms = spark.sparkContext.broadcast(dls_arr)

    merged_post = (
        post.repartition(parts, "term")
        .groupBy("term")
        .applyInPandas(merge_term, kernels.POSTING_SCHEMA)
    )
    (
        merged_post.withColumn("seg_part", F.col("seg_id"))
        .write.partitionBy("seg_part")
        .parquet(post_dir, mode="overwrite")
    )

    # ---- snapshot: survivors + the merged segment
    rel = os.path.relpath(commit_dir, store.root)
    n_docs_new = int(acc)
    sum_dl_new = int(dls_arr.astype(np.int64).sum())
    n_terms_new = int(
        spark.read.parquet(post_dir).select("term").distinct().count()
    )
    new_seg = {
        "seg_id": new_seg_id,
        "docs_path": f"{rel}/docs/seg_part={new_seg_id}",
        "postings_path": f"{rel}/postings/seg_part={new_seg_id}",
        "norms_path": f"{rel}/norms/seg_part={new_seg_id}",
        "n_docs": n_docs_new,
        "sum_dl": sum_dl_new,
        "n_terms": n_terms_new,
    }
    survivors = [s for s in snap["segments"] if int(s["seg_id"]) not in offsets]
    segments = survivors + [new_seg]
    stats = {
        "n_docs": sum(int(s["n_docs"]) for s in segments),
        "sum_dl": sum(int(s["sum_dl"]) for s in segments),
    }
    lineage = [
        {
            "partition": f"seg_id={new_seg_id}",
            "source": f"merge({','.join(map(str, seg_ids))})",
            "n_docs": n_docs_new,
            "dropped_masked": sum(len(m) for m in masks.values() if m is not None),
        }
    ]
    return store.commit(
        segments, stats=stats, lineage=lineage, operation="consolidate"
    )


def _dls_for(dls_arr: np.ndarray, doc_ids: np.ndarray) -> np.ndarray:
    return dls_arr[doc_ids - 1]


def delete_by_query(spark, store: SnapshotStore, flt) -> int:
    """Mark matching docs deleted (tombstone mask) in a new snapshot."""
    from iresearch_spark.query.executor import IndexSearcher

    snap = store.snapshot()
    searcher = IndexSearcher(spark, store)
    # match-only path: no scoring, no global ranking window — a delete can
    # match most of the corpus, and ranking it would funnel every match
    # through one partition's sort
    matched = searcher.match_docs(flt)
    old_masks = _load_masks(store, snap)

    def to_blob(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sid_ = int(key[0])
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        prev = old_masks.get(sid_)
        if prev is not None and len(prev):
            ids = np.union1d(ids, prev.astype(np.int64))
        ids = np.unique(ids).astype("<u4")
        return pd.DataFrame({"seg_id": [sid_], "mask_bin": [ids.tobytes()]})

    commit_dir = store.new_commit_dir()
    masks_dir = os.path.join(commit_dir, "masks")
    masked = matched.groupBy("seg_id").applyInPandas(to_blob, MASK_SCHEMA)
    (
        masked.withColumn("seg_part", F.col("seg_id"))
        .write.partitionBy("seg_part")
        .parquet(masks_dir, mode="overwrite")
    )
    new_seg_ids = {
        int(r["seg_id"])
        for r in spark.read.parquet(masks_dir).select("seg_id").distinct().collect()
    }
    rel = os.path.relpath(commit_dir, store.root)
    segments = []
    for s in snap["segments"]:
        s = dict(s)
        if int(s["seg_id"]) in new_seg_ids:
            s["mask_path"] = f"{rel}/masks/seg_part={s['seg_id']}"
        segments.append(s)
    return store.commit(
        segments,
        stats=snap["stats"],
        lineage=[{"operation": "delete", "segments": sorted(new_seg_ids)}],
        operation="delete",
    )
