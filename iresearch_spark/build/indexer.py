"""Segment build job: corpus table -> doc table + encoded postings +
snapshot commit (SURVEY.md §3.1 Spark re-architecture).

Dataflow (one wide shuffle of documents, one compact shuffle of partials):

  corpus (url, warc_ts, html, text, lang)
    | seg_id = pmod(crc32(url), n_segments)          [JVM, matches oracle]
    | repartition(parts)                             [full-width tokenize]
    | mapInArrow tokenize_kernel                     [narrow: extract+tokenize]
    | repartition(seg_id) + sortWithinPartitions(seg_id, url)
    | row_number over (seg_id, url)                  [JVM docID assignment]
    |--- assigned checkpoint (parquet; intra-build resume point)
    | three CONCURRENT jobs off the checkpoint (one thread pool; the small
    | docs/norms jobs hide inside the postings job's wall time):
    |--- docs table write (columnstore role, [up] core/formats/columnstore2)
    |--- norms table write (dense per-segment dl blobs)
    |--- postings: mapInArrow partials_kernel        [map-side combine -> raw
    |                                                 (seg,term,band) partials]
    |    [optional, band_bits set: repartition(seg,term,band) + sort +
    |     merge_kernel — salted level-1 for pathologically large segments]
    |    repartition(seg_id) + sort(seg, term, min_doc) + encode_kernel
    '--- snapshot commit (two-phase, [up]
         core/index/index_writer.cpp :: begin/commit)

Skew strategy: segments are uniform url-hash shards, so the per-segment
final encode (mirroring the reference's single-writer segment flush,
[up] core/index/segment_writer.cpp) is balanced by construction and a
term's postings within a segment are bounded by the segment's doc count —
the segment count is the scale knob. For segments too large for that bound
the optional banded level-1 shuffle splits hot terms' partials across
doc-range bands (the salted groupBy of BASELINE.json:6); both paths emit
byte-identical blobs (tested). Postings files are term-sorted per segment,
so parquet min/max row-group stats give dictionary-style block skipping on
term lookups ([up] formats_burst_trie's sorted-dictionary role).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, functions as F

from iresearch_spark.build import kernels
from iresearch_spark.fields import DEFAULT_FIELDS, FieldSpec
from iresearch_spark.store import SnapshotStore


def _with_seg_id(
    corpus: DataFrame, n_segments: int, base: int = 0,
    segment_key: str | None = None,
) -> DataFrame:
    # crc32 matches zlib.crc32 in the oracle (both standard CRC-32).
    # segment_key (a SQL expression over the corpus, default url) routes
    # docs to segments — the block-ingestion hook: the reference indexes a
    # parent/child block as one transaction into one segment ([up]
    # core/index/index_writer.cpp :: documents()), reproduced here by
    # giving every block member the same key (e.g. a url prefix) so the
    # F19 nested filter's blocks are co-resident and, because child urls
    # sort before their parent's under a shared fixed-width prefix,
    # contiguous in docID order.
    key = F.expr(segment_key) if segment_key else F.col("url")
    return corpus.withColumn(
        "seg_id",
        (
            F.pmod(F.crc32(key.cast("binary")), F.lit(n_segments)) + base
        ).cast("int"),
    )


def staging_key(
    source: str,
    n_segments: int,
    band_bits,
    mode: str,
    seg_base: int,
    field_specs,
    segment_key: str | None = None,
    sort_by: str | None = None,
    cipher_kcv: str | None = None,
    stored_cols: tuple[str, ...] = (),
) -> str:
    """Identity of a staged (resumable) build: same key -> the interrupted
    commit dir's completed stages can be reused (BASELINE.json checkpoint
    resume). Any field-spec change (including offsets/payloads features)
    changes the key and forces a clean rebuild; so does the encryption
    key (staged tables are encrypted with it — a resume under a different
    key must not reuse them)."""
    fields_key = ",".join(
        f"{f.name}={f.source}:{f.analyzer}:{int(f.offsets)}{int(f.payloads)}"
        for f in field_specs
    )
    return (
        f"{source}|{n_segments}|{band_bits}|{mode}|{seg_base}|{fields_key}"
        f"|{segment_key or 'url'}|{sort_by or 'url'}|{cipher_kcv or ''}"
        f"|{','.join(stored_cols)}"
    )


def build_index(
    spark,
    corpus: DataFrame,
    store: SnapshotStore,
    n_segments: int = 8,
    *,
    fields: list[FieldSpec] | None = None,
    band_bits: int | None = None,
    parts: int | None = None,
    source: str = "",
    mode: str = "replace",
    streams: dict[str, int] | None = None,
    segment_key: str | None = None,
    sort_by: str | None = None,
    stored_cols: tuple[str, ...] = (),
) -> int:
    # Whole-build single-writer exclusivity ([up] core/index/index_writer
    # .cpp :: index_writer::make holding the directory's index_lock for
    # the writer's lifetime): staging (_staging.json, commit dirs) and
    # the generation bump are one critical section, so a concurrent
    # builder fails FAST here instead of late at commit().
    with store.write_lock(owner=f"build_index:{source or 'corpus'}"):
        return _build_index_impl(
            spark, corpus, store, n_segments, fields=fields,
            band_bits=band_bits, parts=parts, source=source, mode=mode,
            streams=streams, segment_key=segment_key, sort_by=sort_by,
            stored_cols=stored_cols,
        )


def _build_index_impl(
    spark,
    corpus: DataFrame,
    store: SnapshotStore,
    n_segments: int = 8,
    *,
    fields: list[FieldSpec] | None = None,
    band_bits: int | None = None,
    parts: int | None = None,
    source: str = "",
    mode: str = "replace",
    streams: dict[str, int] | None = None,
    segment_key: str | None = None,
    sort_by: str | None = None,
    stored_cols: tuple[str, ...] = (),
) -> int:
    """Build a new index generation from `corpus`; returns the snapshot id.

    stored_cols: extra corpus columns persisted verbatim in the per-segment
    docs table (the user columnstore — ArangoSearch storedValues, [up]
    core/formats/columnstore2 user columns). They ride the tokenize
    kernel's Arrow pass-through and the existing segment shuffle (no extra
    corpus scan or join), survive merges, and surface at query time via
    IndexSearcher.search_batch(with_cols=...) and highlights(). Part of
    the index identity: append-mode builds must pass the same list.
    String-typed stored columns are encrypted at rest like url/lang;
    other types ride plaintext (like the structural int columns).

    mode="replace" commits the new segments as the whole index;
    mode="append" adds them after the current snapshot's live segments
    (seg_ids continue past the existing maximum) — the incremental-ingest
    path of the reference's index_writer ([up] index_writer.cpp: new
    flush segments join the committed generation; readers reopen()).

    sort_by: primary-sort expression — a SQL expression over the STORED
    doc columns (url, warc_ts, lang) — giving the index sort of the
    reference ([up] core/index/comparer.hpp; index_writer constructed
    with a comparer): per-segment docIDs follow (sort_by ASC, url ASC)
    instead of plain url order, merges re-sort by the same spec (it is
    frozen in the snapshot manifest like the field specs), and
    IndexSearcher.sorted_topk reads the first-k matches in index order
    without scoring. Restricting the expression to stored columns mirrors
    upstream keeping the sorted column in the columnstore.

    Resumable: stage outputs live under one commit dir with parquet
    _SUCCESS markers; if the docs/postings table for this commit already
    completed (same commit dir passed via a staged checkpoint file), the
    stage is skipped (BASELINE.json:14 checkpoint resume). The staged dir is
    keyed by (source, n_segments) in <root>/_staging.json.
    """
    t_start = time.time()
    sc = spark.sparkContext
    parts = parts or sc.defaultParallelism * 2
    field_specs = list(fields) if fields else list(DEFAULT_FIELDS)
    field_names = [f.name for f in field_specs]
    prev_snap = store.snapshot() if mode == "append" else None
    if prev_snap is not None:
        # fail fast, not after the whole build at commit time
        prev_cipher = prev_snap.get("cipher") or None
        cur_cipher = store.cipher.describe() if store.cipher else None
        if prev_cipher != cur_cipher:
            raise ValueError(
                "append requires the live index's encryption key "
                "(cipher/key mismatch with the current snapshot)"
            )
        prev_fields = [FieldSpec.from_json(d) for d in prev_snap.get("fields", [])]
        if prev_fields and prev_fields != field_specs:
            raise ValueError(
                "append with a different field spec than the live index"
            )
        if prev_snap.get("sort") != sort_by:
            raise ValueError(
                "append with a different primary sort than the live index"
            )
        prev_stored = [d["name"] for d in prev_snap.get("stored") or []]
        if prev_stored != list(stored_cols):
            raise ValueError(
                "append with different stored_cols than the live index "
                f"(live: {prev_stored}, got: {list(stored_cols)})"
            )
    # stored-column contract: must exist in the corpus and not collide
    # with the engine's structural/output names
    _RESERVED = {
        "seg_id", "doc_id", "seg_part", "dl", "fdls", "terms", "tfids",
        "tfs", "positions", "ostarts", "olens", "pchars", "url",
        "warc_ts", "lang", "pid", "local_idx", "old_seg", "old_doc",
    }
    corpus_types = dict(corpus.dtypes)
    stored_cols = tuple(dict.fromkeys(stored_cols))
    for c in stored_cols:
        if c in _RESERVED:
            raise ValueError(
                f"stored_cols: {c!r} collides with a built-in docs column"
            )
        if c not in corpus_types:
            raise ValueError(f"stored_cols: {c!r} is not a corpus column")
    stored_spec = [(c, corpus_types[c]) for c in stored_cols]
    stored_str = tuple(c for c, t in stored_spec if t == "string")
    seg_base = (
        max((int(s["seg_id"]) for s in prev_snap["segments"]), default=-1) + 1
        if prev_snap
        else 0
    )

    # ---- staged-checkpoint lookup (resume path)
    import json

    staging_path = os.path.join(store.root, "_staging.json")
    stage_key = staging_key(
        source, n_segments, band_bits, mode, seg_base, field_specs,
        segment_key, sort_by,
        store.cipher.kcv if store.cipher else None,
        stored_cols,
    )
    staged = {}
    if os.path.exists(staging_path):
        with open(staging_path) as f:
            staged = json.load(f)
    if staged.get("key") == stage_key and os.path.isdir(staged.get("dir", "")):
        commit_dir = staged["dir"]
    else:
        commit_dir = store.new_commit_dir()
        with open(staging_path, "w") as f:
            json.dump({"key": stage_key, "dir": commit_dir}, f)
    docs_dir = os.path.join(commit_dir, "docs")
    post_dir = os.path.join(commit_dir, "postings")
    norms_dir = os.path.join(commit_dir, "norms")
    tok_dir = os.path.join(commit_dir, "assigned")
    timings: dict[str, float] = {}

    tok_done = os.path.exists(os.path.join(tok_dir, "_SUCCESS"))
    docs_done = os.path.exists(os.path.join(docs_dir, "_SUCCESS"))
    post_done = os.path.exists(os.path.join(post_dir, "_SUCCESS"))
    norms_done = os.path.exists(os.path.join(norms_dir, "_SUCCESS"))

    # ---- stage 1: tokenize + docID assignment, checkpointed as parquet
    # (the finest-grained resume point: an interrupted build restarts from
    # the tokenized table, skipping html-extract + tokenize entirely)
    t0 = time.time()
    if not (docs_done and post_done and norms_done) and not tok_done:
        cols = ["seg_id", "url", "warc_ts", "lang", "html", "text"]
        # extra analyzer source columns beyond the standard web shape
        extra_sources = sorted(
            {
                f.source
                for f in field_specs
                if f.source != "__text__" and f.source not in cols
            }
        )
        cols += extra_sources
        cols += [c for c in stored_cols if c not in cols]
        corpus_cols = set(corpus.columns)
        src = _with_seg_id(corpus, n_segments, seg_base, segment_key)
        if "html" not in corpus_cols:
            src = src.withColumn("html", F.lit(None).cast("binary"))
        if "text" not in corpus_cols:
            src = src.withColumn("text", F.lit(None).cast("string"))
        if "warc_ts" not in corpus_cols:
            src = src.withColumn("warc_ts", F.lit(None).cast("timestamp"))
        if "lang" not in corpus_cols:
            src = src.withColumn("lang", F.lit(None).cast("string"))
        # widen BEFORE tokenize only when the corpus arrives in too few
        # splits — a round-robin repartition here moves the RAW corpus
        # (html bytes) through a full shuffle, which is pure memory/IO
        # bandwidth; when the source is already wide, tokenizing in place
        # and shuffling only the (much smaller) token table is strictly
        # better at any scale
        sel = src.select(*cols)
        if sel.rdd.getNumPartitions() < max(parts // 2, 1):
            sel = sel.repartition(parts)
        tokenized = sel.mapInArrow(
            kernels.make_tokenize_kernel(field_specs, stored_cols),
            kernels.with_stored(kernels.TOKENIZED_SCHEMA, stored_spec),
        )
        # docID assignment stays JVM-side (whole-stage codegen): the hash
        # repartition co-locates each segment, and row_number over
        # (seg_id, url) IS the per-segment url-sorted sequential id —
        # deterministic under any parallelism, and the token table never
        # takes a second JVM->Python->JVM round trip
        from pyspark.sql import Window as W

        w_assign = (
            W.partitionBy("seg_id").orderBy(F.expr(sort_by).asc(), "url")
            if sort_by
            else W.partitionBy("seg_id").orderBy("url")
        )
        assigned_plain = (
            tokenized.repartition(n_segments, "seg_id")
            .withColumn(
                "doc_id", F.row_number().over(w_assign).cast("bigint")
            )
            .select(
                "seg_id", "doc_id", "url", "warc_ts", "lang", "dl", "fdls",
                "terms", "tfids", "tfs", "positions", "ostarts", "olens",
                "pchars", *stored_cols,
            )
        )
        (
            store.encrypt_table(assigned_plain, "assigned", extra_str=stored_str)
            .withColumn("seg_part", F.col("seg_id"))
            .write.partitionBy("seg_part")
            .parquet(tok_dir, mode="overwrite")
        )
    timings["tokenize_assign_s"] = time.time() - t0
    assigned = (
        store.decrypt_staged(
            spark.read.parquet(tok_dir), "assigned", extra_str=stored_str
        )
        if not (docs_done and post_done and norms_done)
        else None
    )

    # ---- docs / postings / norms: all three are independent consumers of
    # the assigned checkpoint, so they run as CONCURRENT Spark jobs from
    # one thread pool instead of four sequential actions (VERDICT r2 item
    # 4) — the small docs/norms jobs hide entirely inside the postings
    # job's wall time, and on a cluster the scheduler interleaves their
    # tasks across idle executors. Each job stays guarded by its own
    # _SUCCESS marker, preserving the staged-resume contract.
    offs_flags = [f.offsets for f in field_specs]
    pay_flags = [f.payloads for f in field_specs]
    post_stats_dir = os.path.join(commit_dir, "post_stats")
    os.makedirs(post_stats_dir, exist_ok=True)

    def write_docs() -> None:
        # per-segment columnstore; column-pruned projection of the
        # assigned checkpoint — no shuffle, no token columns. Partition
        # dirs are named seg_part=N while seg_id stays a data column, so
        # per-segment dir reads keep the column without basePath.
        (
            store.encrypt_table(
                assigned.select(
                    "seg_id", "doc_id", "url", "warc_ts", "lang", "dl",
                    "fdls", *stored_cols,
                ),
                "docs",
                extra_str=stored_str,
            )
            .withColumn("seg_part", F.col("seg_id"))
            .write.partitionBy("seg_part")
            .parquet(docs_dir, mode="overwrite")
        )

    def write_postings() -> None:
        partials = assigned.select(
            "seg_id", "doc_id", "fdls", "terms", "tfids", "tfs",
            "positions", "ostarts", "olens", "pchars",
        ).mapInArrow(
            kernels.make_partials_kernel(band_bits or 16, offs_flags, pay_flags),
            kernels.PARTIAL_SCHEMA,
        )
        if band_bits is not None:
            # two-level salted path: hot terms' partials are pre-merged per
            # doc-range band so no single reducer concatenates a whole
            # pathological term. Segments already bound per-term skew to
            # n_docs/n_segments; enable this level when segments are huge.
            partials = (
                partials.repartition(parts, "seg_id", "fidx", "term", "band")
                .sortWithinPartitions(
                    "seg_id", "fidx", "term", "band", "min_doc"
                )
                .mapInArrow(kernels.merge_kernel, kernels.PARTIAL_SCHEMA)
            )
        # one partition per segment (hash on seg_id), term-sorted within:
        # mirrors the reference's per-segment segment_writer flush exactly,
        # yields ONE term-sorted parquet file per segment (its sorted
        # dictionary — row-group min/max stats give burst-trie-style block
        # skipping on term lookups), and has no skew by construction
        # (segments are uniform url-hash shards; a term inside a segment is
        # bounded by the segment's doc count). Parallelism = segment count,
        # which is the scale knob — NOT repartitionByRange, whose sampling
        # job would recompute the whole upstream pipeline twice.
        final = (
            partials.repartition(n_segments, "seg_id")
            .sortWithinPartitions("seg_id", "fidx", "term", "min_doc")
            .mapInArrow(
                kernels.with_stats_sidecar(
                    kernels.make_encode_kernel(
                        field_names, offs_flags, pay_flags
                    ),
                    post_stats_dir,
                ),
                kernels.POSTING_SCHEMA,
            )
        )
        store.encrypt_table(final, "postings").withColumn(
            "seg_part", F.col("seg_id")
        ).write.partitionBy("seg_part").parquet(post_dir, mode="overwrite")
        # sidecar complete only when every task of THIS successful write
        # has landed its file; staged resumes from pre-sidecar attempts
        # fall back to the scan below
        with open(os.path.join(post_stats_dir, "_COMPLETE"), "w") as f:
            f.write("1")

    def write_norms() -> None:
        # per-segment dense doc-length arrays, built straight from the
        # assigned checkpoint (no dependency on the docs write). The norms
        # table is tiny (n_segments × n_fields rows of packed blobs) — ONE
        # un-partitioned parquet dir; readers filter to the snapshot's
        # live segments (store.read_norms).
        (
            store.encrypt_table(
                assigned.select("seg_id", "doc_id", "fdls")
                .groupBy("seg_id")
                .applyInPandas(kernels.norms_builder, kernels.NORMS_SCHEMA),
                "norms",
            )
            .write.parquet(norms_dir, mode="overwrite")
        )

    from concurrent.futures import ThreadPoolExecutor

    stage_jobs = [
        ("docs_write_s", write_docs, docs_done),
        ("postings_write_s", write_postings, post_done),
        ("norms_write_s", write_norms, norms_done),
    ]

    def run_stage(entry):
        name, fn, done = entry
        t = time.time()
        if not done:
            fn()
        return name, time.time() - t

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=3) as pool:
        for name, dt in pool.map(run_stage, stage_jobs):
            timings[name] = dt
    timings["tables_wall_s"] = time.time() - t0

    # ---- per-segment stats + lineage. Norms stats: a driver-side pyarrow
    # read of the tiny norms table (no Spark job). Postings stats: ONE
    # light columnar scan over the int columns the encode kernel emitted
    # (seg_id/df/blob_bytes/pos_bytes) — the blobs are never re-read.
    t0 = time.time()
    import pyarrow.parquet as pq

    norm_tbl = pq.read_table(
        norms_dir, columns=["seg_id", "fidx", "n_docs", "sum_dl"]
    ).to_pylist()
    doc_stats = {
        int(r["seg_id"]): (int(r["n_docs"]), int(r["sum_dl"]))
        for r in norm_tbl
        if int(r["fidx"]) == 0
    }
    field_sums = {name: 0 for name in field_names}
    seg_field_sums: dict[int, dict[str, int]] = {}
    for r in norm_tbl:
        name = field_names[int(r["fidx"])]
        field_sums[name] += int(r["sum_dl"])
        seg_field_sums.setdefault(int(r["seg_id"]), {})[name] = int(r["sum_dl"])
    # Postings stats: the write pass emitted them as a tiny per-task
    # sidecar (kernels.with_stats_sidecar — ≤ one row per segment per
    # task), so no second scan over the postings table is needed. The
    # Spark agg survives only as the fallback for staged resumes whose
    # postings write predates the sidecar.
    post_stats: dict[int, dict] = {}
    if os.path.exists(os.path.join(post_stats_dir, "_COMPLETE")):
        side = pq.read_table(post_stats_dir).to_pylist()
        for r in side:
            row = post_stats.setdefault(
                int(r["seg_id"]),
                {"n_terms": 0, "postings": 0, "blob_bytes": 0, "pos_bytes": 0},
            )
            for k in ("n_terms", "postings", "blob_bytes", "pos_bytes"):
                row[k] += int(r[k])
    else:
        post_stats = {
            int(r["seg_id"]): r.asDict()
            for r in spark.read.parquet(post_dir)
            .groupBy("seg_id")
            .agg(
                F.count("*").alias("n_terms"),
                F.sum("df").alias("postings"),
                F.sum("blob_bytes").alias("blob_bytes"),
                F.sum("pos_bytes").alias("pos_bytes"),
            )
            .collect()
        }
    timings["stats_s"] = time.time() - t0

    rel = os.path.relpath(commit_dir, store.root)
    segments, lineage = [], []
    n_docs_total, sum_dl_total, postings_total, blob_bytes_total = 0, 0, 0, 0
    for seg_id, (n, sum_dl) in sorted(doc_stats.items()):
        ps = post_stats.get(seg_id, {})
        seg = {
            "seg_id": seg_id,
            "docs_path": f"{rel}/docs/seg_part={seg_id}",
            "postings_path": f"{rel}/postings/seg_part={seg_id}",
            "norms_path": f"{rel}/norms",
            "n_docs": n,
            "sum_dl": sum_dl,
            "n_terms": int(ps.get("n_terms", 0)),
            "field_sum_dl": seg_field_sums.get(seg_id, {}),
        }
        segments.append(seg)
        n_docs_total += n
        sum_dl_total += sum_dl
        postings_total += int(ps.get("postings", 0))
        blob_bytes_total += int(ps.get("blob_bytes", 0))
        lineage.append(
            {
                "partition": f"seg_id={seg_id}",
                "source": source,
                "n_docs": n,
                "postings": int(ps.get("postings", 0)),
                "blob_bytes": int(ps.get("blob_bytes", 0)),
                "pos_bytes": int(ps.get("pos_bytes", 0)),
            }
        )

    wall = time.time() - t_start
    metrics = {
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs_total / wall, 1) if wall else None,
        "postings_per_sec": round(postings_total / wall, 1) if wall else None,
        "postings": postings_total,
        "bytes_raw_postings": postings_total * 8,  # u32 doc + u32 tf
        "bytes_blob": blob_bytes_total,
        "timings": {k: round(v, 3) for k, v in timings.items()},
        "resumed_stages": {
            "docs": docs_done,
            "postings": post_done,
            "norms": norms_done,
        },
    }
    if prev_snap:
        segments = list(prev_snap["segments"]) + segments
        n_docs_total += int(prev_snap["stats"]["n_docs"])
        sum_dl_total += int(prev_snap["stats"]["sum_dl"])
        for name, v in prev_snap["stats"].get("field_sum_dl", {}).items():
            field_sums[name] = field_sums.get(name, 0) + int(v)
    sid = store.commit(
        segments,
        stats={
            "n_docs": n_docs_total,
            "sum_dl": sum_dl_total,
            "field_sum_dl": field_sums,
        },
        lineage=lineage,
        metrics=metrics,
        operation="append" if prev_snap else "rebuild",
        fields=[f.to_json() for f in field_specs],
        streams=streams,
        sort=sort_by,
        stored=[{"name": c, "type": t} for c, t in stored_spec],
    )
    if os.path.exists(staging_path):
        os.remove(staging_path)
    # the tokenized checkpoint is only needed for intra-build resume;
    # drop it once the snapshot is durable
    import shutil

    shutil.rmtree(tok_dir, ignore_errors=True)
    return sid
