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

Scale shape: NO per-doc state ever aggregates on the driver or rides a
broadcast. The old→new docID remap is built as per-source-segment blobs by
a distributed groupBy, and the postings re-encode runs in two grouped
stages: phase 1 cogroups each source segment's postings (salted into
`bands` slices so no task holds a whole segment) with THAT segment's remap
blob + dl norms and rewrites docIDs / attaches dls; phase 2 groups by
(field, term) and concatenates + re-sorts + re-encodes — term-parallel,
exactly like a fresh build's encode stage. Where the reference's
merge_writer holds doc_id map vectors for the whole merge set in one
process ([up] core/index/merge_writer.cpp), each task here sees one
segment's 8-bytes/doc blob at most; the only driver-side rows are the
≤`parts`-row offset cumsum and per-field sums. A merge set stays within
the tier policy's max_segments_bytes budget (the reference's invariant:
policy, not the writer, bounds a merge).
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
    commit; returns the new snapshot id. Holds the index write lock for
    the whole stage+commit span (reentrant under consolidate())."""
    with store.write_lock(owner=f"merge:{','.join(map(str, seg_ids))}"):
        return _merge_segments_impl(spark, store, seg_ids, parts=parts)


def _merge_segments_impl(
    spark, store: SnapshotStore, seg_ids: list[int], *, parts: int | None = None
) -> int:
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
    docs = store.read_parquet(
        spark, [store.abs_path(segs[s]["docs_path"]) for s in seg_ids],
        "docs",
    )

    def drop_masked(_key, pdf: pd.DataFrame, mask_pdf: pd.DataFrame) -> pd.DataFrame:
        mask = _mask_ids(mask_pdf)
        if len(mask):
            pdf = pdf[~pdf["doc_id"].isin(mask)]
        return pdf

    # user stored_cols (manifest "stored") ride every docs rewrite
    # verbatim — merged segments keep the full columnstore surface
    stored_spec = [
        (d["name"], d["type"]) for d in snap.get("stored") or []
    ]
    doc_cols = [
        "seg_id", "doc_id", "url", "warc_ts", "lang", "dl", "fdls",
        *[n for n, _ in stored_spec],
    ]
    stored_str = tuple(n for n, t in stored_spec if t == "string")
    survivors_schema = kernels.with_stored(
        kernels.DOCS_TABLE_SCHEMA, stored_spec
    )

    surv_dir = os.path.join(commit_dir, "survivors")
    (
        store.encrypt_table(
            docs.select(*doc_cols)
            .groupBy("seg_id")
            .cogroup(masks_df.groupBy("seg_id"))
            .applyInPandas(drop_masked, survivors_schema)
            .withColumnsRenamed({"seg_id": "old_seg", "doc_id": "old_doc"}),
            "survivors",
            extra_str=stored_str,
        )
        .write.parquet(surv_dir, mode="overwrite")
    )

    from pyspark.sql import Window as W

    # pid/local_idx are materialized in ONE action (remap staging write), so
    # the offsets computed from the staging table can never disagree with
    # the ids the docs write reads back. orderBy carries (old_seg, old_doc)
    # tiebreakers so duplicate urls stay deterministic under any
    # parallelism; with unique urls this matches a fresh build exactly.
    # A primary-sorted index ([up] core/index/comparer.hpp — merge_writer
    # re-sorts merged docs with the writer's comparer) leads the ordering
    # with the manifest's frozen sort expression, computable from the
    # stored doc columns exactly like upstream reads its sorted column
    # back out of the columnstore.
    sort_spec = snap.get("sort")
    order_cols = (
        [F.expr(sort_spec).asc(), F.col("url"), F.col("old_seg"), F.col("old_doc")]
        if sort_spec
        else [F.col("url"), F.col("old_seg"), F.col("old_doc")]
    )
    w_local = W.partitionBy("pid").orderBy(*order_cols)
    (
        store.encrypt_table(
            store.decrypt_staged(
                spark.read.parquet(surv_dir), "survivors",
                extra_str=stored_str,
            )
            .repartitionByRange(parts, *order_cols)
            .withColumn("pid", F.spark_partition_id())
            .withColumn(
                "local_idx", F.row_number().over(w_local).cast("bigint")
            ),
            "survivors",
            extra_str=stored_str,
        )
        .write.parquet(remap_dir, mode="overwrite")
    )

    staged = store.decrypt_staged(
        spark.read.parquet(remap_dir), "survivors", extra_str=stored_str
    )
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
    n_docs_total = running
    offsets_df = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], "pid int, off bigint"
    )
    (
        store.encrypt_table(
            staged.join(F.broadcast(offsets_df), "pid")
            .withColumn("doc_id", (F.col("off") + F.col("local_idx")))
            .withColumn("seg_id", F.lit(new_seg_id).cast("int"))
            .select(*doc_cols),
            "docs",
            extra_str=stored_str,
        )
        .withColumn("seg_part", F.col("seg_id"))
        .write.partitionBy("seg_part")
        .parquet(docs_dir, mode="overwrite")
    )

    # ---- old (seg, doc) -> new docID remap, built DISTRIBUTIVELY: one
    # int64 blob per SOURCE segment (index = old doc, value = new doc,
    # 0 = masked/dropped), assembled by a groupBy(old_seg) task from the
    # staged remap rows. The blobs never aggregate on the driver and never
    # ride a broadcast — phase 1 below cogroups each segment's blob with
    # that segment's postings slice, so a task holds ONE segment's
    # 8-bytes/doc array at most.
    n_docs_by_seg = {int(s): int(segs[s]["n_docs"]) for s in seg_ids}

    def build_remap(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sid_ = int(key[0])
        arr = np.zeros(n_docs_by_seg[sid_] + 1, dtype="<i8")
        arr[pdf["old_doc"].to_numpy(dtype=np.int64)] = pdf[
            "new_id"
        ].to_numpy(dtype=np.int64)
        return pd.DataFrame({"seg_id": [sid_], "remap_bin": [arr.tobytes()]})

    remapb = (
        staged.join(F.broadcast(offsets_df), "pid")
        .withColumn("new_id", F.col("off") + F.col("local_idx"))
        .select("old_seg", "old_doc", "new_id")
        .groupBy("old_seg")
        .applyInPandas(build_remap, "seg_id int, remap_bin binary")
    )

    # ---- postings: two grouped stages, no per-doc broadcast.
    post = store.read_parquet(
        spark, [store.abs_path(segs[s]["postings_path"]) for s in seg_ids],
        "postings",
    )

    field_names = [d["name"] for d in store.fields()]
    field_idx = {name: i for i, name in enumerate(field_names)}

    # per-source-segment dl norms (per field): each posting entry's dl is
    # attached in phase 1 for the blockmax recompute — dl is per-doc
    # invariant under merge, so the OLD segment's array indexed by the OLD
    # docID equals the merged segment's dl for that doc.
    norms_old = (
        store.read_parquet(
            spark,
            sorted({store.abs_path(segs[s]["norms_path"]) for s in seg_ids}),
            "norms",
        )
        .filter(F.col("seg_id").isin(seg_ids))
        .select("seg_id", "fidx", "dls_bin")
    )
    norms_agg = norms_old.groupBy("seg_id").agg(
        F.sort_array(F.collect_list(F.struct("fidx", "dls_bin"))).alias(
            "norm_rows"
        )
    )
    # salt each segment's postings into `bands` slices so a phase-1 task
    # holds ~1/bands of one segment's blobs plus its ~12-bytes/doc aux
    bands = int(max(1, min(32, parts // max(1, len(seg_ids)))))
    aux = remapb.join(norms_agg, "seg_id").crossJoin(
        spark.range(bands).select(F.col("id").cast("int").alias("band"))
    )
    post_b = post.withColumn(
        "band", F.pmod(F.xxhash64("field", "term"), F.lit(bands)).cast("int")
    )

    REMAPPED_COLS = (
        "seg_id",
        "field",
        "term",
        "docs_bin",
        "tfs_bin",
        "dls_bin",
        "pos_bin",
        "span_bin",
        "pay_bin",
    )
    REMAPPED_SCHEMA = (
        "seg_id int, field string, term string, docs_bin binary, "
        "tfs_bin binary, dls_bin binary, pos_bin binary, span_bin binary, "
        "pay_bin binary"
    )

    def remap_slice(
        key, post_pdf: pd.DataFrame, aux_pdf: pd.DataFrame
    ) -> pd.DataFrame:
        """Phase 1: rewrite one (segment, band) postings slice to merged
        docIDs, dropping masked docs and attaching per-entry dls. Decoded
        values ship as packed little-endian int64 binaries; per-doc slice
        widths are implied by tfs (positions), 2*tfs (spans) and the span
        length sums (payload chars)."""
        if not len(post_pdf) or not len(aux_pdf):
            return pd.DataFrame({c: [] for c in REMAPPED_COLS})
        arow = aux_pdf.iloc[0]
        remap = np.frombuffer(bytes(arow["remap_bin"]), dtype="<i8")
        dls_by_fidx = {
            int(r["fidx"]): np.frombuffer(bytes(r["dls_bin"]), dtype="<u4")
            for r in arow["norm_rows"]
        }
        out: dict[str, list] = {c: [] for c in REMAPPED_COLS}
        for prow in post_pdf.itertuples():
            pl = decode_postings(bytes(prow.blob))
            docs_a = pl.doc_ids.astype(np.int64)
            tfs_a = pl.tfs.astype(np.int64)
            new_ids = remap[docs_a]
            keep = new_ids > 0  # 0 = masked/dropped doc
            if not keep.any():
                continue
            sel = np.flatnonzero(keep)
            old_keep = docs_a[keep]
            new_keep = new_ids[keep]
            tf_keep = tfs_a[keep]
            pos_list = decode_positions_for(
                bytes(prow.pos_off), bytes(prow.pos_pay), sel, tf_keep
            )
            pos_flat = (
                np.concatenate(pos_list).astype(np.int64)
                if pos_list
                else np.empty(0, np.int64)
            )
            dls_vals = dls_by_fidx[field_idx[prow.field]][
                old_keep - 1
            ].astype(np.int64)
            if prow.span_pay is not None and len(prow.span_pay):
                sp = decode_values_for(
                    bytes(prow.span_off), bytes(prow.span_pay), sel,
                    tf_keep * 2,
                ).astype(np.int64)
                row_pay = getattr(prow, "pay_pay", None)
                if row_pay is not None and len(row_pay):
                    c = (
                        np.add.reduceat(
                            sp[1::2], np.cumsum(tf_keep) - tf_keep
                        )
                        if len(tf_keep)
                        else np.empty(0, np.int64)
                    )
                    pay = decode_values_for(
                        bytes(prow.pay_off), bytes(row_pay), sel, c
                    ).astype(np.int64)
                else:
                    pay = np.empty(0, np.int64)
            else:
                sp = np.empty(0, np.int64)
                pay = np.empty(0, np.int64)
            out["seg_id"].append(np.int32(prow.seg_id))
            out["field"].append(prow.field)
            out["term"].append(prow.term)
            out["docs_bin"].append(new_keep.astype("<i8").tobytes())
            out["tfs_bin"].append(tf_keep.astype("<i8").tobytes())
            out["dls_bin"].append(dls_vals.astype("<i8").tobytes())
            out["pos_bin"].append(pos_flat.astype("<i8").tobytes())
            out["span_bin"].append(sp.astype("<i8").tobytes())
            out["pay_bin"].append(pay.astype("<i8").tobytes())
        return pd.DataFrame(out)

    def merge_term_rows(key, pdf: pd.DataFrame) -> pd.DataFrame:
        """Phase 2: one (field, term) across all source segments — concat
        the phase-1 slices in seg_id order, stable-sort by merged docID
        (new ids interleave across segments under the global url sort),
        permute the ragged per-doc value runs with the same order, and
        re-encode. Vectorized end-to-end; per-entry dls arrived from
        phase 1, so no norms broadcast is needed for blockmax."""
        field, term = key[0], key[1]
        pdf = pdf.sort_values("seg_id")

        def cat(col: str) -> np.ndarray:
            bufs = [bytes(b) for b in pdf[col] if b is not None and len(b)]
            if not bufs:
                return np.empty(0, np.int64)
            return np.frombuffer(b"".join(bufs), dtype="<i8")

        docs = cat("docs_bin")
        if len(docs) == 0:
            return pd.DataFrame(
                columns=[f.split()[0] for f in kernels.POSTING_SCHEMA.split(", ")]
            )
        tfs = cat("tfs_bin")
        dls = cat("dls_bin")
        pos = cat("pos_bin")
        spans = cat("span_bin")
        pays = cat("pay_bin")
        has_spans = len(spans) > 0
        has_pays = len(pays) > 0
        # span/payload presence is per-field (FieldSpec), so within one
        # (field, term) group every slice carries them or none does
        if has_spans and len(spans) != int(2 * tfs.sum()):
            raise ValueError(
                f"inconsistent span presence across segments for "
                f"({field!r}, {term!r})"
            )
        order = np.argsort(docs, kind="stable")
        docs_m, tfs_m, dls_m = docs[order], tfs[order], dls[order]
        pos_m = _permute_ragged(pos, tfs, order)
        if has_pays:
            # A8 payload chars per doc: counts = sum of that doc's span
            # lengths (odd entries of its span slice), in pre-sort order
            pay_counts_pre = np.add.reduceat(
                spans[1::2], np.cumsum(tfs) - tfs
            )
            pays_m = _permute_ragged(pays, pay_counts_pre, order)
            pay_counts_m = pay_counts_pre[order]
        all_spans_m = (
            _permute_ragged(spans, 2 * tfs, order) if has_spans else spans
        )
        blob, skip, bmax = encode_postings(
            docs_m.astype("<u4"), tfs_m.astype("<u4"), dls_m.astype("<u4")
        )
        pos_off, pos_pay = encode_positions(pos_m.astype(np.int64), tfs_m)
        if has_spans:
            so_buf, _so_off, sp_buf, _sp_off = encode_raw_batch(
                all_spans_m,
                2 * tfs_m,
                np.array([0, len(docs_m)], dtype=np.int64),
            )
            span_off, span_pay = so_buf.tobytes(), sp_buf.tobytes()
        else:
            span_off, span_pay = b"", b""
        if has_pays:
            yo_buf, _yo, yp_buf, _yp = encode_raw_batch(
                pays_m,
                pay_counts_m,
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

    # ---- norms table for the NEW segment (distributed dense-dl build).
    # Only the tiny per-field sums come back to the driver (for snapshot
    # stats); the dls blobs stay on disk — blockmax recompute reads dls
    # per entry from phase 1, not from a broadcast.
    (
        store.encrypt_table(
            spark.read.parquet(docs_dir)
            .select("seg_id", "doc_id", "fdls")
            .groupBy("seg_id")
            .applyInPandas(kernels.norms_builder, kernels.NORMS_SCHEMA),
            "norms",
        )
        .write.parquet(norms_dir, mode="overwrite")
    )
    import pyarrow.parquet as pq

    norms_tbl = pq.read_table(norms_dir, columns=["fidx", "sum_dl"])
    field_sums_new = {
        field_names[int(fx)]: int(s)
        for fx, s in zip(
            norms_tbl.column("fidx").to_pylist(),
            norms_tbl.column("sum_dl").to_pylist(),
        )
    }

    merged_post = (
        post_b.groupBy("seg_id", "band")
        .cogroup(aux.groupBy("seg_id", "band"))
        .applyInPandas(remap_slice, REMAPPED_SCHEMA)
        .repartition(parts, "field", "term")
        .groupBy("field", "term")
        .applyInPandas(merge_term_rows, kernels.POSTING_SCHEMA)
    )
    (
        store.encrypt_table(merged_post, "postings")
        .withColumn("seg_part", F.col("seg_id"))
        .write.partitionBy("seg_part")
        .parquet(post_dir, mode="overwrite")
    )

    # drop the staging tables (only needed during this merge)
    import shutil

    shutil.rmtree(remap_dir, ignore_errors=True)
    shutil.rmtree(surv_dir, ignore_errors=True)

    # ---- snapshot: survivors + the merged segment
    rel = os.path.relpath(commit_dir, store.root)
    n_docs_new = int(n_docs_total)
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


def _permute_ragged(
    v: np.ndarray, counts: np.ndarray, order: np.ndarray
) -> np.ndarray:
    """Reorder concatenated ragged runs: `v` holds len(counts) runs of
    counts[i] values each; return the runs re-concatenated in `order`.
    Pure index arithmetic (repeat + intra-run arange) — no Python loop."""
    if len(v) == 0:
        return v
    starts = np.cumsum(counts) - counts
    cc = counts[order]
    total = int(cc.sum())
    run_starts = np.cumsum(cc) - cc
    idx = np.repeat(starts[order], cc) + (
        np.arange(total, dtype=np.int64) - np.repeat(run_starts, cc)
    )
    return v[idx]


def delete_by_query(spark, store: SnapshotStore, flt) -> int:
    """Mark matching docs deleted (tombstone mask) in a new snapshot."""
    with store.write_lock(owner="delete_by_query"):
        return _delete_by_query_impl(spark, store, flt)


def _delete_by_query_impl(spark, store: SnapshotStore, flt) -> int:
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
        store.encrypt_table(masked, "masks")
        .withColumn("seg_part", F.col("seg_id"))
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
