"""Segment merge + delete-by-query (SURVEY.md S4/M4).

merge_segments reproduces the reference's merge_writer semantics
([up] core/index/merge_writer.cpp): k segments stream into one new
segment; masked (deleted) docs are dropped and survivors get new docIDs
assigned by a GLOBAL url sort — preserving the engine's docID invariant
(SURVEY.md §1.4: docIDs follow url order within every segment), so a
merged segment is indistinguishable from a fresh build over the same live
docs (tested). Term dictionaries union naturally under groupBy(field,
term); the new segment's postings/skip/blockmax blobs are re-encoded from
the remapped doc lists.

Spark shape: the doc stream is a DISTRIBUTED global url sort — survivors
are checkpointed once (so the range sampler scans one parquet column, not
the Python cogroup), range-partitioned by url, numbered per partition with
a JVM window, and given globally sequential docIDs by adding per-partition
offsets (a ≤`parts`-row cumsum broadcast join). No single-task stage
remains: where the reference's merge_writer streams docs through one
thread ([up] core/index/merge_writer.cpp), the same url-ordered sequence
here is produced by `parts` parallel tasks. The postings merge is one
groupBy(field, term).applyInPandas — term-parallel — so a single merge
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
    decode_values_for,
    encode_positions,
    encode_postings,
    encode_raw_batch,
)
from iresearch_spark.store import SnapshotStore

MASK_SCHEMA = "seg_id int, mask_bin binary"


def _mask_ids(mask_pdf: pd.DataFrame) -> np.ndarray:
    """Decode one segment's cogrouped mask rows to a sorted int64 docID
    array (empty if the segment carries no tombstones). Runs INSIDE the
    task that owns that segment's rows — masks never aggregate on the
    driver or ride task closures (a delete matching most of a 10^12-doc
    corpus stays distributed)."""
    if not len(mask_pdf):
        return np.empty(0, dtype=np.int64)
    buf = b"".join(bytes(x) for x in mask_pdf["mask_bin"] if x is not None)
    return np.sort(np.frombuffer(buf, dtype="<u4").astype(np.int64))


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
    masks_df = store.read_masks(spark).filter(F.col("seg_id").isin(seg_ids))
    parts = parts or spark.sparkContext.defaultParallelism * 2
    new_seg_id = max(segs) + 1
    commit_dir = store.new_commit_dir()
    docs_dir = os.path.join(commit_dir, "docs")
    post_dir = os.path.join(commit_dir, "postings")
    norms_dir = os.path.join(commit_dir, "norms")
    remap_dir = os.path.join(commit_dir, "remap")

    # ---- docs table: drop masked, re-assign docIDs by GLOBAL url sort.
    # The engine's docID invariant (SURVEY.md §1.4) is "docIDs follow url
    # order within a segment"; per-source-offset rebase would break it and
    # make merged segments tie-break differently from a fresh build. The
    # global url sort is DISTRIBUTED: checkpoint survivors (so the range
    # sampler scans one parquet column instead of re-running the Python
    # cogroup), range-partition by url, number each partition with a JVM
    # window, then add per-partition offsets (tiny cumsum, broadcast join)
    # to get the globally sequential ids the single-threaded reference
    # merge_writer would emit — at `parts`-way parallelism.
    docs = spark.read.parquet(
        *[store.abs_path(segs[s]["docs_path"]) for s in seg_ids]
    )

    def drop_masked(_key, pdf: pd.DataFrame, mask_pdf: pd.DataFrame) -> pd.DataFrame:
        mask = _mask_ids(mask_pdf)
        if len(mask):
            pdf = pdf[~pdf["doc_id"].isin(mask)]
        return pdf

    survivors_schema = kernels.DOCS_TABLE_SCHEMA

    surv_dir = os.path.join(commit_dir, "survivors")
    (
        docs.select("seg_id", "doc_id", "url", "warc_ts", "lang", "dl", "fdls")
        .groupBy("seg_id")
        .cogroup(masks_df.groupBy("seg_id"))
        .applyInPandas(drop_masked, survivors_schema)
        .withColumnsRenamed({"seg_id": "old_seg", "doc_id": "old_doc"})
        .write.parquet(surv_dir, mode="overwrite")
    )

    from pyspark.sql import Window as W

    # pid/local_idx are materialized in ONE action (remap staging write), so
    # the offsets computed from the staging table can never disagree with
    # the ids the docs write reads back. orderBy carries (old_seg, old_doc)
    # tiebreakers so duplicate urls stay deterministic under any
    # parallelism; with unique urls this matches a fresh build exactly.
    w_local = W.partitionBy("pid").orderBy("url", "old_seg", "old_doc")
    (
        spark.read.parquet(surv_dir)
        .repartitionByRange(parts, "url", "old_seg", "old_doc")
        .withColumn("pid", F.spark_partition_id())
        .withColumn("local_idx", F.row_number().over(w_local).cast("bigint"))
        .write.parquet(remap_dir, mode="overwrite")
    )

    staged = spark.read.parquet(remap_dir)
    counts = {
        int(r["pid"]): int(r["n"])
        for r in staged.groupBy("pid").agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        # every doc in the merge set is masked: the merged segment would be
        # empty, so (like the reference dropping an empty merge_writer
        # output) commit a snapshot that simply drops the source segments.
        import shutil

        shutil.rmtree(commit_dir, ignore_errors=True)
        survivors = [
            s for s in snap["segments"] if int(s["seg_id"]) not in set(seg_ids)
        ]
        field_names = [d["name"] for d in store.fields()]
        field_totals: dict[str, int] = {}
        for s in survivors:
            per = s.get("field_sum_dl") or {field_names[0]: int(s["sum_dl"])}
            for name, v in per.items():
                field_totals[name] = field_totals.get(name, 0) + int(v)
        stats = {
            "n_docs": sum(int(s["n_docs"]) for s in survivors),
            "sum_dl": sum(int(s["sum_dl"]) for s in survivors),
            "field_sum_dl": field_totals,
        }
        lineage = [
            {
                "partition": "(dropped)",
                "source": f"merge({','.join(map(str, seg_ids))})",
                "n_docs": 0,
                "dropped_masked": sum(int(segs[s]["n_docs"]) for s in seg_ids),
            }
        ]
        return store.commit(
            survivors, stats=stats, lineage=lineage, operation="consolidate"
        )
    offsets: dict[int, int] = {}
    running = 0
    for pid_ in sorted(counts):
        offsets[pid_] = running
        running += counts[pid_]
    offsets_df = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], "pid int, off bigint"
    )
    (
        staged.join(F.broadcast(offsets_df), "pid")
        .withColumn("doc_id", (F.col("off") + F.col("local_idx")))
        .withColumn("seg_id", F.lit(new_seg_id).cast("int"))
        .select("seg_id", "doc_id", "url", "warc_ts", "lang", "dl", "fdls")
        .withColumn("seg_part", F.col("seg_id"))
        .write.partitionBy("seg_part")
        .parquet(docs_dir, mode="overwrite")
    )

    # old (seg, doc) -> new doc mapping, read back as compact arrays and
    # broadcast (8 bytes/doc, same budget class as the dls blob)
    import pyarrow.parquet as pq

    remap_tbl = pq.read_table(
        remap_dir, columns=["old_seg", "old_doc", "pid", "local_idx"]
    )
    o_seg = remap_tbl.column("old_seg").to_numpy()
    o_doc = remap_tbl.column("old_doc").to_numpy()
    off_np = np.zeros(max(offsets, default=0) + 1, dtype=np.int64)
    for pid_, off_ in offsets.items():
        off_np[pid_] = off_
    n_doc = (
        off_np[remap_tbl.column("pid").to_numpy()]
        + remap_tbl.column("local_idx").to_numpy()
    )
    remap_arrays: dict[int, np.ndarray] = {}
    for sid_ in seg_ids:
        arr = np.zeros(int(segs[sid_]["n_docs"]) + 1, dtype=np.int64)
        sel = o_seg == sid_
        arr[o_doc[sel]] = n_doc[sel]  # masked docs stay 0 (= dropped)
        remap_arrays[sid_] = arr
    bc_remap = spark.sparkContext.broadcast(remap_arrays)

    # ---- postings: per-term concat with docID remap, re-encode
    post = spark.read.parquet(
        *[store.abs_path(segs[s]["postings_path"]) for s in seg_ids]
    )

    field_names = [d["name"] for d in store.fields()]
    field_idx = {name: i for i, name in enumerate(field_names)}

    def merge_term(key, pdf: pd.DataFrame) -> pd.DataFrame:
        field, term = key[0], key[1]
        pdf = pdf.sort_values("seg_id")
        remap = bc_remap.value
        all_docs, all_tfs, all_pos, all_spans, all_pays = [], [], [], [], []
        has_spans = has_pays = False
        for row in pdf.itertuples():
            pl = decode_postings(bytes(row.blob))
            docs_a = pl.doc_ids.astype(np.int64)
            tfs_a = pl.tfs.astype(np.int64)
            new_ids = remap[int(row.seg_id)][docs_a]
            keep = new_ids > 0  # 0 = masked/dropped doc
            sel = np.flatnonzero(keep)
            docs_a, tfs_a = new_ids[keep], tfs_a[keep]
            pos_flat = decode_positions_for(
                bytes(row.pos_off), bytes(row.pos_pay), sel, tfs_a
            )
            all_docs.append(docs_a)
            all_tfs.append(tfs_a)
            all_pos.extend(p for p in pos_flat)
            row_pay = getattr(row, "pay_pay", None)
            if row.span_pay is not None and len(row.span_pay):
                has_spans = True
                sp = decode_values_for(
                    bytes(row.span_off), bytes(row.span_pay), sel, tfs_a * 2
                )
                sp_doc = (
                    np.split(sp, np.cumsum(2 * tfs_a)[:-1]) if len(tfs_a) else []
                )
                all_spans.extend(sp_doc)
                if row_pay is not None and len(row_pay):
                    # A8 payload chars per doc: counts = sum of that doc's
                    # span lengths (odd entries of its span slice)
                    has_pays = True
                    c = (
                        np.add.reduceat(
                            sp[1::2].astype(np.int64),
                            np.cumsum(tfs_a) - tfs_a,
                        )
                        if len(tfs_a)
                        else np.empty(0, np.int64)
                    )
                    pay = decode_values_for(
                        bytes(row.pay_off), bytes(row_pay), sel, c
                    )
                    all_pays.extend(
                        np.split(pay, np.cumsum(c)[:-1]) if len(c) else []
                    )
                else:
                    all_pays.extend(
                        np.empty(0, np.int64) for _ in range(len(docs_a))
                    )
            else:
                all_spans.extend(
                    np.empty(0, np.int64) for _ in range(len(docs_a))
                )
                all_pays.extend(
                    np.empty(0, np.int64) for _ in range(len(docs_a))
                )
        docs_m = np.concatenate(all_docs) if all_docs else np.empty(0, np.int64)
        if len(docs_m) == 0:
            return pd.DataFrame(
                columns=[f.split()[0] for f in kernels.POSTING_SCHEMA.split(", ")]
            )
        tfs_m = np.concatenate(all_tfs)
        # new docIDs interleave across source segments (global url sort):
        # re-sort the concatenated entries, permuting per-doc position
        # lists (and spans) with them
        order = np.argsort(docs_m, kind="stable")
        docs_m, tfs_m = docs_m[order], tfs_m[order]
        all_pos = [all_pos[i] for i in order]
        all_spans = [all_spans[i] for i in order]
        all_pays = [all_pays[i] for i in order]
        pos_m = (
            np.concatenate(all_pos) if all_pos else np.empty(0, np.int64)
        )
        dls_m = _dls_for(bc_norms.value[field_idx[field]], docs_m)
        blob, skip, bmax = encode_postings(
            docs_m.astype("<u4"), tfs_m.astype("<u4"), dls_m.astype("<u4")
        )
        pos_off, pos_pay = encode_positions(pos_m.astype(np.int64), tfs_m)
        if has_spans:
            sp_flat = (
                np.concatenate(all_spans) if all_spans else np.empty(0, np.int64)
            )
            so_buf, _so_off, sp_buf, _sp_off = encode_raw_batch(
                sp_flat,
                2 * tfs_m,
                np.array([0, len(docs_m)], dtype=np.int64),
            )
            span_off, span_pay = so_buf.tobytes(), sp_buf.tobytes()
        else:
            span_off, span_pay = b"", b""
        if has_pays:
            pay_flat = (
                np.concatenate(all_pays) if all_pays else np.empty(0, np.int64)
            )
            pay_counts = np.fromiter(
                (len(p) for p in all_pays), count=len(all_pays), dtype=np.int64
            )
            yo_buf, _yo, yp_buf, _yp = encode_raw_batch(
                pay_flat,
                pay_counts,
                np.array([0, len(docs_m)], dtype=np.int64),
            )
            pay_off_b, pay_pay_b = yo_buf.tobytes(), yp_buf.tobytes()
        else:
            pay_off_b, pay_pay_b = b"", b""
        return pd.DataFrame(
            {
                "seg_id": [np.int32(new_seg_id)],
                "field": [field],
                "term": [term],
                "df": [int(len(docs_m))],
                "cf": [int(tfs_m.sum())],
                "max_tf": [int(tfs_m.max())],
                "blob": [blob],
                "skip": [skip],
                "bmax": [bmax],
                "pos_off": [pos_off],
                "pos_pay": [pos_pay],
                "span_off": [span_off],
                "span_pay": [span_pay],
                "pay_off": [pay_off_b],
                "pay_pay": [pay_pay_b],
                "blob_bytes": [len(blob) + len(skip) + len(bmax)],
                "pos_bytes": [
                    len(pos_off) + len(pos_pay) + len(span_off) + len(span_pay)
                    + len(pay_off_b) + len(pay_pay_b)
                ],
            }
        )

    # ---- norms table FIRST (distributed dense-dl build; merge_term needs
    # the dl array for blockmax recompute). The per-segment dls_bin blob is
    # then read back (one row, 4 bytes/doc of packed binary) and broadcast —
    # never the per-row toPandas path.
    (
        spark.read.parquet(docs_dir)
        .select("seg_id", "doc_id", "fdls")
        .groupBy("seg_id")
        .applyInPandas(kernels.norms_builder, kernels.NORMS_SCHEMA)
        .write.parquet(norms_dir, mode="overwrite")
    )
    import pyarrow.parquet as pq

    norms_tbl = pq.read_table(norms_dir, columns=["fidx", "dls_bin", "sum_dl"])
    dls_by_fidx = {
        int(fx): np.frombuffer(bytes(blob.as_py()), dtype="<u4")
        for fx, blob in zip(
            norms_tbl.column("fidx").to_pylist(), norms_tbl.column("dls_bin")
        )
    }
    field_sums_new = {
        field_names[int(fx)]: int(s)
        for fx, s in zip(
            norms_tbl.column("fidx").to_pylist(),
            norms_tbl.column("sum_dl").to_pylist(),
        )
    }
    bc_norms = spark.sparkContext.broadcast(dls_by_fidx)

    merged_post = (
        post.repartition(parts, "field", "term")
        .groupBy("field", "term")
        .applyInPandas(merge_term, kernels.POSTING_SCHEMA)
    )
    (
        merged_post.withColumn("seg_part", F.col("seg_id"))
        .write.partitionBy("seg_part")
        .parquet(post_dir, mode="overwrite")
    )

    # drop the staging tables (only needed during this merge)
    import shutil

    shutil.rmtree(remap_dir, ignore_errors=True)
    shutil.rmtree(surv_dir, ignore_errors=True)

    # ---- snapshot: survivors + the merged segment
    rel = os.path.relpath(commit_dir, store.root)
    n_docs_new = int(remap_tbl.num_rows)
    sum_dl_new = int(field_sums_new.get(field_names[0], 0))
    n_terms_new = int(spark.read.parquet(post_dir).count())
    new_seg = {
        "seg_id": new_seg_id,
        "docs_path": f"{rel}/docs/seg_part={new_seg_id}",
        "postings_path": f"{rel}/postings/seg_part={new_seg_id}",
        "norms_path": f"{rel}/norms",
        "n_docs": n_docs_new,
        "sum_dl": sum_dl_new,
        "n_terms": n_terms_new,
        "field_sum_dl": field_sums_new,
    }
    survivors = [s for s in snap["segments"] if int(s["seg_id"]) not in set(seg_ids)]
    segments = survivors + [new_seg]
    field_totals: dict[str, int] = {}
    for s in segments:
        per = s.get("field_sum_dl") or {field_names[0]: int(s["sum_dl"])}
        for name, v in per.items():
            field_totals[name] = field_totals.get(name, 0) + int(v)
    stats = {
        "n_docs": sum(int(s["n_docs"]) for s in segments),
        "sum_dl": sum(int(s["sum_dl"]) for s in segments),
        "field_sum_dl": field_totals,
    }
    lineage = [
        {
            "partition": f"seg_id={new_seg_id}",
            "source": f"merge({','.join(map(str, seg_ids))})",
            "n_docs": n_docs_new,
            "dropped_masked": sum(int(segs[s]["n_docs"]) for s in seg_ids)
            - n_docs_new,
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
    # through one partition's sort. Prior masks join the new matches via a
    # cogroup on seg_id, so each task sees only ITS segment's tombstones
    # (never a driver dict or an all-segments closure).
    matched = searcher.match_docs(flt)
    old_masks_df = store.read_masks(spark)

    def to_blob(
        key, pdf: pd.DataFrame, mask_pdf: pd.DataFrame
    ) -> pd.DataFrame:
        sid_ = int(key[0])
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        prev = _mask_ids(mask_pdf)
        if len(prev):
            ids = np.union1d(ids, prev)
        ids = np.unique(ids).astype("<u4")
        return pd.DataFrame({"seg_id": [sid_], "mask_bin": [ids.tobytes()]})

    commit_dir = store.new_commit_dir()
    masks_dir = os.path.join(commit_dir, "masks")
    masked = (
        matched.groupBy("seg_id")
        .cogroup(old_masks_df.groupBy("seg_id"))
        .applyInPandas(to_blob, MASK_SCHEMA)
    )
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
