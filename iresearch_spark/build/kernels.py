"""Arrow-batch kernels for the segment build pipeline (SURVEY.md M1/S2/S6).

Everything here runs inside DataFrame.mapInArrow on executors and is
numpy/pandas vectorized per batch — no per-row Python on the hot path
(BASELINE.json:15). The pipeline reproduces the reference's in-memory
inverted-index accumulation + format flush
([up] core/index/field_data.cpp -> [up] core/formats/formats_10.cpp) as a
sequence of vectorized map stages + compact shuffles:

  make_tokenize_kernel(fields)
                    corpus rows -> (seg, url, meta, per-field dls, terms,
                    field ids, tfs, positions) — one analyzer per field
  (docID assignment is JVM-side: row_number over (seg_id, url) — see
   build/indexer.py)
  partials_kernel   token lists -> per-(seg,field,term,band) raw partials
  merge_kernel      (sorted partials)     -> concatenated band partials
  make_encode_kernel(names)
                    (sorted band merges)  -> final encoded posting rows

Partials carry raw little-endian uint32 arrays (docs/tfs/dls/positions) so
shuffles move compact binary, and every merge is a pure concatenation:
doc ranges of partials for one (seg, term) never interleave (a segment is
wholly contained in one partition and batches are consumed in order), so
ordering by min_doc is sufficient. Final blob bytes are therefore
independent of batch boundaries and parallelism — the N-vs-4N determinism
requirement (BASELINE.md scaling protocol).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from iresearch_spark.analysis.extract import extract_series
from iresearch_spark.codec.postings import (
    encode_positions_batch,
    encode_postings_batch,
    encode_raw_batch,
)

TOKENIZED_SCHEMA = (
    "seg_id int, url string, warc_ts timestamp, lang string, dl int, "
    "fdls array<int>, terms array<string>, tfids array<int>, "
    "tfs array<int>, positions array<int>, ostarts array<int>, "
    "olens array<int>, pchars array<int>"
)
ASSIGNED_SCHEMA = (
    "seg_id int, doc_id bigint, url string, warc_ts timestamp, lang string, "
    "dl int, fdls array<int>, terms array<string>, tfids array<int>, "
    "tfs array<int>, positions array<int>, ostarts array<int>, "
    "olens array<int>, pchars array<int>"
)
PARTIAL_SCHEMA = (
    "seg_id int, fidx int, term string, band int, min_doc bigint, n bigint, "
    "docs_bin binary, tfs_bin binary, dls_bin binary, pos_bin binary, "
    "span_bin binary, pay_bin binary"
)
POSTING_SCHEMA = (
    "seg_id int, field string, term string, df bigint, cf bigint, "
    "max_tf int, blob binary, skip binary, bmax binary, pos_off binary, "
    "pos_pay binary, span_off binary, span_pay binary, pay_off binary, "
    "pay_pay binary, blob_bytes bigint, pos_bytes bigint"
)
NORMS_SCHEMA = (
    "seg_id int, fidx int, n_docs bigint, sum_dl bigint, dls_bin binary"
)
# The docs (columnstore) table as written by build_index's write_docs and
# merge_segments — the canonical row a reader of any docs_path sees.
# Indexes built with stored_cols append those columns after fdls
# (ArangoSearch storedValues / [up] core/formats/columnstore2 user
# columns); readers discover them from the parquet schema + manifest.
DOCS_TABLE_SCHEMA = (
    "seg_id int, doc_id bigint, url string, warc_ts timestamp, "
    "lang string, dl int, fdls array<int>"
)


def with_stored(schema: str, stored: list[tuple[str, str]]) -> str:
    """Append stored-column (name, spark-sql type) pairs to one of the
    frozen schema strings above."""
    if not stored:
        return schema
    return schema + ", " + ", ".join(f"{n} {t}" for n, t in stored)


def norms_builder(key, pdf):
    """Per-(segment, field) dense norms columns: one row per field with
    dls_bin[doc_id-1] = that field's token count for the doc (u32), plus
    the stats (n_docs, per-field sum_dl) so snapshot stats come from this
    tiny table instead of a second full docs scan. The reference stores
    norms per field in its columnstore ([up] core/index/norm.cpp); dense
    docIDs make flat arrays exact."""
    import pandas as pd

    pdf = pdf.sort_values("doc_id")
    doc = pdf["doc_id"].to_numpy()
    n = len(doc)
    assert doc[0] == 1 and doc[-1] == n, "docIDs must be dense 1..n"
    fdl = np.asarray(pdf["fdls"].tolist(), dtype=np.int64)  # (n, n_fields)
    n_fields = fdl.shape[1]
    rows = {
        "seg_id": [key[0]] * n_fields,
        "fidx": list(range(n_fields)),
        "n_docs": [n] * n_fields,
        "sum_dl": [int(fdl[:, f].sum()) for f in range(n_fields)],
        "dls_bin": [fdl[:, f].astype("<u4").tobytes() for f in range(n_fields)],
    }
    return pd.DataFrame(rows)


def with_stats_sidecar(kernel, stats_dir: str):
    """Wrap an encode kernel: stream its output batches through unchanged
    while accumulating per-segment postings stats (n_terms, postings =
    Σdf, blob_bytes, pos_bytes) from the emitted columns, then write ONE
    tiny parquet per task into `stats_dir`. The manifest stats thus come
    for free from the write pass — no second scan over the postings table
    ([up] segment_writer flushes its seg meta alongside the data files).

    Idempotent under task retries/speculation: the file name is the
    deterministic partition id and the write is tmp + os.replace (atomic
    on POSIX — the same rename protocol the snapshot store relies on).
    Assumes the store root is POSIX-visible to executors, which the whole
    SnapshotStore layout already requires."""

    def wrapped(batches):
        acc: dict[int, list[int]] = {}
        for out in kernel(batches):
            seg = out.column("seg_id").to_numpy(zero_copy_only=False)
            dfv = out.column("df").to_numpy(zero_copy_only=False)
            bb = out.column("blob_bytes").to_numpy(zero_copy_only=False)
            pb = out.column("pos_bytes").to_numpy(zero_copy_only=False)
            for s in np.unique(seg):
                m = seg == s
                row = acc.setdefault(int(s), [0, 0, 0, 0])
                row[0] += int(m.sum())
                row[1] += int(dfv[m].sum())
                row[2] += int(bb[m].sum())
                row[3] += int(pb[m].sum())
            yield out
        if acc:
            import os
            import uuid

            import pyarrow.parquet as pq
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            segs = sorted(acc)
            tbl = pa.table(
                {
                    "seg_id": pa.array(segs, pa.int32()),
                    "n_terms": pa.array([acc[s][0] for s in segs], pa.int64()),
                    "postings": pa.array([acc[s][1] for s in segs], pa.int64()),
                    "blob_bytes": pa.array([acc[s][2] for s in segs], pa.int64()),
                    "pos_bytes": pa.array([acc[s][3] for s in segs], pa.int64()),
                }
            )
            final = os.path.join(stats_dir, f"part-{pid:05d}.parquet")
            # "."-prefixed tmp: invisible to parquet dataset readers even
            # if a killed task leaves it behind
            tmp = os.path.join(stats_dir, f".tmp-{uuid.uuid4().hex[:8]}")
            pq.write_table(tbl, tmp)
            os.replace(tmp, final)

    return wrapped


def _list_offsets(arr: pa.Array) -> np.ndarray:
    """int offsets (n+1) of a pyarrow ListArray."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return np.frombuffer(a.buffers()[1], dtype=np.int32)[
        a.offset : a.offset + len(a) + 1
    ].astype(np.int64)


def _binary_array(values: bytes | np.ndarray, byte_offsets: np.ndarray) -> pa.Array:
    """Zero-copy pa.binary() array from a contiguous buffer + byte offsets."""
    n = len(byte_offsets) - 1
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(byte_offsets.astype(np.int32).tobytes()), pa.py_buffer(values)],
    )


def _codepoints(tokens) -> tuple[np.ndarray, np.ndarray]:
    """Token sequence -> (flat code points u32, per-token char counts).

    pa.StringArray fast path: for ASCII the UTF-8 value buffer IS the
    code-point sequence (1 byte/char), read zero-copy; otherwise one
    UTF-32 re-encode of the joined tokens (C-speed, no per-char Python)."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if isinstance(tokens, pa.Array):
        if len(tokens) == 0:
            return np.empty(0, np.uint32), np.empty(0, np.int64)
        if pc.all(pc.string_is_ascii(tokens)).as_py():
            offs = np.frombuffer(tokens.buffers()[1], dtype=np.int32)[
                tokens.offset : tokens.offset + len(tokens) + 1
            ].astype(np.int64)
            data = np.frombuffer(tokens.buffers()[2] or b"", dtype=np.uint8)
            return (
                data[offs[0] : offs[-1]].astype(np.uint32),
                np.diff(offs),
            )
        tokens = tokens.to_pylist()
    toks = list(tokens)
    joined = "".join(toks)
    chars = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter((len(t) for t in toks), count=len(toks), dtype=np.int64)
    return chars, lens


def _bin_view(batch: pa.RecordBatch, name: str) -> tuple[np.ndarray, np.ndarray]:
    """Binary column -> (contiguous row bytes, 0-based row offsets n+1).

    The returned buffer starts at the first row's first byte, so group
    concatenation downstream is pure offset arithmetic (zero copies)."""
    a = batch.column(name)
    if isinstance(a, pa.ChunkedArray):  # pragma: no cover
        a = a.combine_chunks()
    offs = np.frombuffer(a.buffers()[1], dtype=np.int32)[
        a.offset : a.offset + len(a) + 1
    ].astype(np.int64)
    data = np.frombuffer(a.buffers()[2] or b"", dtype=np.uint8)
    return data[offs[0] : offs[-1]], offs - offs[0]


# ------------------------------------------------------------ tokenization


def make_tokenize_kernel(field_specs, stored_cols: tuple[str, ...] = ()):
    """corpus (seg_id, url, warc_ts, lang, html, text[, extra sources]) ->
    TOKENIZED_SCHEMA (+ stored_cols appended verbatim), for an arbitrary
    field-spec list. stored_cols are user columnstore values (ArangoSearch
    storedValues): the kernel passes the input Arrow columns straight
    through — zero copy, no Python objects — so they ride the existing
    token-table shuffle into the docs table instead of costing a second
    corpus join.

    Per field: run its analyzer over the source column — the "__text__"
    source is html -> frozen extraction with `text` fallback for null
    html. The plain "text" analyzer takes the Arrow-native fast path
    (analysis.analyzers.text_tokenize_arrow): token extraction stays in
    Arrow C++ with no per-token Python objects, which is what keeps many
    concurrent workers memory-bandwidth-bound instead of allocator-bound.
    Then ONE combined aggregation builds the per-doc inverted entries:
    terms sorted (field idx asc, term asc), tf per (field, term),
    positions (and, for offsets-enabled fields, A8 spans) flat in entry
    order, and per-field dl vector `fdls`.
    """
    import pandas as pd

    from iresearch_spark.analysis.analyzers import (
        analyze_batch_payloads,
        text_tokenize_arrow,
    )

    specs = list(field_specs)

    def kernel(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            flat_parts, fidx_parts, owner_parts = [], [], []
            pos_parts, start_parts, len_parts = [], [], []
            pchar_parts, plen_parts = [], []
            fdls = np.zeros((n, len(specs)), dtype=np.int64)
            pdf_cache: dict[str, pd.Series] = {}

            def as_series(name):
                if name not in pdf_cache:
                    pdf_cache[name] = batch.column(name).to_pandas()
                return pdf_cache[name]

            for fi, fs in enumerate(specs):
                surf = None  # A8 payload surface; == token for 1-stage specs
                if fs.analyzer == "text" and fs.source != "__text__":
                    flat, counts, pos, sts, lns = text_tokenize_arrow(
                        batch.column(fs.source), with_spans=fs.offsets
                    )
                elif fs.source == "__text__":
                    html = as_series("html")
                    if html.isna().all():
                        # pure-text corpus: keep the Arrow fast path
                        if fs.analyzer == "text":
                            flat, counts, pos, sts, lns = text_tokenize_arrow(
                                batch.column("text"), with_spans=fs.offsets
                            )
                        else:
                            f_, counts, pos, sts, lns, surf = analyze_batch_payloads(
                                as_series("text"), fs.analyzer
                            )
                            flat = pa.array(f_, pa.string())
                    else:
                        vals = extract_series(html)
                        if html.isna().any():
                            na = html.isna()
                            vals.loc[na] = as_series("text").fillna("")[na]
                        if fs.analyzer == "text":
                            flat, counts, pos, sts, lns = text_tokenize_arrow(
                                pa.array(vals, pa.string()), with_spans=fs.offsets
                            )
                        else:
                            f_, counts, pos, sts, lns, surf = analyze_batch_payloads(
                                vals, fs.analyzer
                            )
                            flat = pa.array(f_, pa.string())
                else:
                    f_, counts, pos, sts, lns, surf = analyze_batch_payloads(
                        as_series(fs.source), fs.analyzer
                    )
                    flat = pa.array(f_, pa.string())
                fdls[:, fi] = counts
                if len(flat) == 0:
                    continue
                if not fs.offsets:
                    sts = np.zeros(len(flat), dtype=np.int64)
                    lns = np.zeros(len(flat), dtype=np.int64)
                if fs.payloads:
                    # surface code points per occurrence (surf is None only
                    # on the text fast path, where surface == token)
                    chars_f, lens_f = _codepoints(
                        flat if surf is None else surf
                    )
                    # decode splits payload slices by SPAN length — the
                    # two are structurally equal (every analyzer's span
                    # length is its emitted token's length; singleton
                    # stages keep the parent's span AND surface)
                    assert np.array_equal(lens_f, lns), fs.name
                    pchar_parts.append(chars_f)
                    plen_parts.append(lens_f)
                else:
                    plen_parts.append(np.zeros(len(flat), dtype=np.int64))
                flat_parts.append(flat)
                pos_parts.append(pos)
                start_parts.append(sts)
                len_parts.append(lns)
                owner_parts.append(np.repeat(np.arange(n, dtype=np.int64), counts))
                fidx_parts.append(np.full(len(flat), fi, dtype=np.int64))
            if flat_parts:
                flat_arr = (
                    flat_parts[0]
                    if len(flat_parts) == 1
                    else pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in flat_parts])
                )
                pos = np.concatenate(pos_parts)
                sts = np.concatenate(start_parts)
                lns = np.concatenate(len_parts)
                owner = np.concatenate(owner_parts)
                fidx = np.concatenate(fidx_parts)
                plen = np.concatenate(plen_parts)
                pchar = (
                    np.concatenate(pchar_parts)
                    if pchar_parts
                    else np.empty(0, np.uint32)
                )
            else:
                flat_arr = pa.array([], pa.string())
                pos = sts = lns = owner = fidx = np.empty(0, dtype=np.int64)
                plen = np.empty(0, dtype=np.int64)
                pchar = np.empty(0, np.uint32)
            # dictionary-encode once (Arrow C++); every per-token op below
            # is integer-based, and lexicographic rank touches only the
            # (small) unique vocab
            denc = flat_arr.dictionary_encode()
            codes = denc.indices.to_numpy() if len(flat_arr) else np.empty(0, np.int64)
            codes = codes.astype(np.int64)
            uniq_arr = denc.dictionary
            uniq_obj = np.asarray(uniq_arr.to_pylist(), dtype=object)
            rank = np.empty(len(uniq_obj), dtype=np.int64)
            rank[np.argsort(uniq_obj, kind="stable")] = np.arange(len(uniq_obj))
            # per-doc (field asc, term asc, position asc) order
            order = np.lexsort((pos, rank[codes], fidx, owner))
            o_owner, o_fidx = owner[order], fidx[order]
            o_term, o_pos = codes[order], pos[order]
            o_sts, o_lns = sts[order], lns[order]
            # A8 payload chars gathered into sorted occurrence order
            o_plen = plen[order]
            if len(pchar):
                c_ex = np.cumsum(plen) - plen
                tot_p = int(o_plen.sum())
                pgidx = np.repeat(c_ex[order], o_plen) + (
                    np.arange(tot_p, dtype=np.int64)
                    - np.repeat(np.cumsum(o_plen) - o_plen, o_plen)
                )
                o_pchar = pchar[pgidx]
            else:
                o_pchar = np.empty(0, np.uint32)
            if len(order):
                newgrp = np.empty(len(order), dtype=bool)
                newgrp[0] = True
                newgrp[1:] = (
                    (o_owner[1:] != o_owner[:-1])
                    | (o_fidx[1:] != o_fidx[:-1])
                    | (o_term[1:] != o_term[:-1])
                )
                gstart = np.flatnonzero(newgrp)
                tf = np.diff(np.append(gstart, len(order)))
                gterm = pc.take(uniq_arr, pa.array(o_term[gstart]))
                gfidx = o_fidx[gstart]
                gowner = o_owner[gstart]
            else:
                tf = np.empty(0, np.int64)
                gterm = pa.array([], pa.string())
                gfidx = np.empty(0, np.int64)
                gowner = np.empty(0, np.int64)
            terms_per_doc = np.bincount(gowner, minlength=n).astype(np.int64)
            toks_per_doc = np.bincount(owner, minlength=n).astype(np.int64)
            term_off = np.concatenate(([0], np.cumsum(terms_per_doc)))
            pos_off = np.concatenate(([0], np.cumsum(toks_per_doc)))
            fdl_off = np.arange(n + 1, dtype=np.int64) * len(specs)
            # spans are all-zero when NO field has the offsets feature —
            # store empty lists instead of zero-filled ones (the partials
            # kernel never reads them in that case), saving 8 bytes/token
            # of checkpoint + shuffle traffic on default builds
            if any(fs.offsets for fs in specs):
                span_off_arr = pa.array(pos_off, pa.int32())
                sts_arr = pa.array(o_sts, pa.int32())
                lns_arr = pa.array(o_lns, pa.int32())
            else:
                span_off_arr = pa.array(
                    np.zeros(n + 1, dtype=np.int64), pa.int32()
                )
                sts_arr = pa.array([], pa.int32())
                lns_arr = pa.array([], pa.int32())
            if any(fs.payloads for fs in specs) and len(o_plen):
                pc_per_doc = np.bincount(
                    o_owner, weights=o_plen, minlength=n
                ).astype(np.int64)
                pchar_off_arr = pa.array(
                    np.concatenate(([0], np.cumsum(pc_per_doc))), pa.int32()
                )
                pchar_vals = pa.array(o_pchar.astype(np.int32))
            else:
                pchar_off_arr = pa.array(
                    np.zeros(n + 1, dtype=np.int64), pa.int32()
                )
                pchar_vals = pa.array([], pa.int32())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("seg_id"),
                    batch.column("url"),
                    batch.column("warc_ts"),
                    batch.column("lang"),
                    pa.array(fdls[:, 0].astype(np.int32)),
                    pa.ListArray.from_arrays(
                        pa.array(fdl_off, pa.int32()),
                        pa.array(fdls.reshape(-1).astype(np.int32)),
                    ),
                    pa.ListArray.from_arrays(
                        pa.array(term_off, pa.int32()), gterm
                    ),
                    pa.ListArray.from_arrays(
                        pa.array(term_off, pa.int32()),
                        pa.array(gfidx.astype(np.int32)),
                    ),
                    pa.ListArray.from_arrays(
                        pa.array(term_off, pa.int32()), pa.array(tf, pa.int32())
                    ),
                    pa.ListArray.from_arrays(
                        pa.array(pos_off, pa.int32()), pa.array(o_pos, pa.int32())
                    ),
                    pa.ListArray.from_arrays(span_off_arr, sts_arr),
                    pa.ListArray.from_arrays(span_off_arr, lns_arr),
                    pa.ListArray.from_arrays(pchar_off_arr, pchar_vals),
                ]
                + [batch.column(c) for c in stored_cols],
                names=[
                    "seg_id",
                    "url",
                    "warc_ts",
                    "lang",
                    "dl",
                    "fdls",
                    "terms",
                    "tfids",
                    "tfs",
                    "positions",
                    "ostarts",
                    "olens",
                    "pchars",
                ]
                + list(stored_cols),
            )

    return kernel


def make_partials_kernel(
    band_bits: int = 16, offsets_enabled=None, payloads_enabled=None
):
    """(seg_id, doc_id, fdls, terms, tfids, tfs, positions, ostarts,
    olens, pchars) -> PARTIAL_SCHEMA rows.

    Explodes each batch's token lists into (seg, field, term, band)
    posting runs with raw uint32 payloads. The per-entry dl is the entry's
    OWN field's token count (fdls[tfid]) — norms are per field. `band` =
    (doc_id-1) >> band_bits splits a hot term's postings into doc-range
    bands so the level-1 merge shuffle spreads the term over multiple
    reducers — the salted-shuffle skew defusal mandated by BASELINE.json:6.
    For fields with the A8 offsets feature, span_bin carries interleaved
    (start, length) u32 pairs per occurrence; other fields' runs carry
    empty span slices, so disabled fields shuffle zero extra bytes. For
    fields with the A8 payloads feature, pay_bin carries the surface-form
    code points per occurrence (slice lengths == span lengths).
    """
    enabled = np.asarray(offsets_enabled or [], dtype=bool)
    pay_enabled = np.asarray(payloads_enabled or [], dtype=bool)

    def kernel(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            seg = batch.column("seg_id").to_numpy().astype(np.int64)
            doc = batch.column("doc_id").to_numpy().astype(np.int64)
            fdls_la = batch.column("fdls")
            f_off = _list_offsets(fdls_la)
            f_vals = fdls_la.values.to_numpy().astype(np.int64)
            terms_la = batch.column("terms")
            t_off = _list_offsets(terms_la)
            # dictionary-encode term strings once (C++); every later op is
            # on int codes — the code ORDER is arbitrary, which is fine:
            # rows only need grouping here, Spark sorts by the real string
            # before the next kernel
            t_dict = terms_la.values.dictionary_encode()
            t_codes = t_dict.indices.to_numpy().astype(np.int64)
            t_dict_vals = t_dict.dictionary
            e_fid = batch.column("tfids").values.to_numpy().astype(np.int64)
            tf_vals = batch.column("tfs").values.to_numpy().astype(np.int64)
            pos_vals = batch.column("positions").values.to_numpy().astype(np.int64)
            any_spans = bool(enabled.any())
            if any_spans:
                st_vals = batch.column("ostarts").values.to_numpy().astype(np.int64)
                ln_vals = batch.column("olens").values.to_numpy().astype(np.int64)
            any_pays = bool(pay_enabled.any())
            if any_pays:
                pch_la = batch.column("pchars")
                pch_row_off = _list_offsets(pch_la)
                pch_vals = pch_la.values.to_numpy().astype(np.int64)
            ntpd = np.diff(t_off)
            if ntpd.sum() == 0:
                continue
            e_row = np.repeat(np.arange(n, dtype=np.int64), ntpd)
            e_seg = seg[e_row]
            e_doc = doc[e_row]
            e_dl = f_vals[f_off[:-1][e_row] + e_fid]
            e_tf = tf_vals
            e_band = (e_doc - 1) >> band_bits
            # entry -> slice of pos_vals: entries are laid out in order, so
            # the exclusive prefix sum of e_tf is each entry's start
            ctf = np.concatenate(([0], np.cumsum(e_tf)))[:-1]
            order = np.lexsort((e_doc, e_band, t_codes, e_fid, e_seg))
            s_seg, s_fid, s_term = e_seg[order], e_fid[order], t_codes[order]
            s_band, s_doc = e_band[order], e_doc[order]
            s_tf, s_dl = e_tf[order], e_dl[order]
            # gather positions into sorted-entry order
            ns = s_tf
            src = ctf[order]
            tot = int(ns.sum())
            gidx = np.repeat(src, ns) + (
                np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(ns) - ns, ns)
            )
            s_pos = pos_vals[gidx]
            if any_spans:
                # interleaved (start, len) pairs, occurrences of enabled
                # fields only (others contribute empty slices)
                occ_en = np.repeat(enabled[s_fid], ns)
                g_en = gidx[occ_en]
                inter = np.empty(2 * len(g_en), dtype=np.int64)
                inter[0::2] = st_vals[g_en]
                inter[1::2] = ln_vals[g_en]
                span_counts = np.where(enabled[s_fid], ns, 0) * 2
            else:
                inter = np.empty(0, dtype=np.int64)
                span_counts = np.zeros(len(order), dtype=np.int64)
            if any_pays:
                # per-occurrence payload char counts (pre-sort layout):
                # payload slice length == span length for enabled fields.
                # pchars rows concatenate in the same occurrence order, so
                # the global exclusive prefix IS each occurrence's char
                # start in pch_vals.
                occ_fid = np.repeat(e_fid, e_tf)
                occ_paylen = np.where(pay_enabled[occ_fid], ln_vals, 0)
                assert int(occ_paylen.sum()) == len(pch_vals), "pchars drift"
                c_ex = np.cumsum(occ_paylen) - occ_paylen
                s_paylen = occ_paylen[gidx]
                tot_pay = int(s_paylen.sum())
                pg = np.repeat(c_ex[gidx], s_paylen) + (
                    np.arange(tot_pay, dtype=np.int64)
                    - np.repeat(np.cumsum(s_paylen) - s_paylen, s_paylen)
                )
                s_pay = pch_vals[pg]
                entry_pay = (
                    np.add.reduceat(s_paylen, np.cumsum(ns) - ns)
                    if len(ns)
                    else np.empty(0, np.int64)
                )
            else:
                s_pay = np.empty(0, dtype=np.int64)
                entry_pay = np.zeros(len(order), dtype=np.int64)
            # run boundaries on (seg, field, term, band)
            m = len(order)
            newrun = np.empty(m, dtype=bool)
            newrun[0] = True
            newrun[1:] = (
                (s_seg[1:] != s_seg[:-1])
                | (s_fid[1:] != s_fid[:-1])
                | (s_band[1:] != s_band[:-1])
                | (s_term[1:] != s_term[:-1])
            )
            rstart = np.flatnonzero(newrun)
            rlen = np.diff(np.append(rstart, m))
            run_tf = np.add.reduceat(ns, rstart)
            run_span = np.add.reduceat(span_counts, rstart)
            run_pay = np.add.reduceat(entry_pay, rstart)
            # zero-copy binary columns: one contiguous buffer + offsets
            entry_off4 = np.concatenate(([0], np.cumsum(rlen))) * 4
            pos_off4 = np.concatenate(([0], np.cumsum(run_tf))) * 4
            span_off4 = np.concatenate(([0], np.cumsum(run_span))) * 4
            pay_off4 = np.concatenate(([0], np.cumsum(run_pay))) * 4
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(s_seg[rstart].astype(np.int32)),
                    pa.array(s_fid[rstart].astype(np.int32)),
                    pc.take(t_dict_vals, pa.array(s_term[rstart])),
                    pa.array(s_band[rstart].astype(np.int32)),
                    pa.array(s_doc[rstart]),
                    pa.array(rlen.astype(np.int64)),
                    _binary_array(s_doc.astype("<u4").tobytes(), entry_off4),
                    _binary_array(s_tf.astype("<u4").tobytes(), entry_off4),
                    _binary_array(s_dl.astype("<u4").tobytes(), entry_off4),
                    _binary_array(s_pos.astype("<u4").tobytes(), pos_off4),
                    _binary_array(inter.astype("<u4").tobytes(), span_off4),
                    _binary_array(s_pay.astype("<u4").tobytes(), pay_off4),
                ],
                names=[
                    "seg_id",
                    "fidx",
                    "term",
                    "band",
                    "min_doc",
                    "n",
                    "docs_bin",
                    "tfs_bin",
                    "dls_bin",
                    "pos_bin",
                    "span_bin",
                    "pay_bin",
                ],
            )

    return kernel


_BIN_COLS = ("docs_bin", "tfs_bin", "dls_bin", "pos_bin", "span_bin", "pay_bin")


class _SortedRuns:
    """Vectorized consumer of key-sorted partial batches.

    Holds the working set as flat numpy arrays + contiguous binary
    buffers; group concatenation is offset arithmetic only. The trailing
    (possibly incomplete) group of each batch is carried into the next.
    """

    def __init__(self, with_band: bool):
        self.with_band = with_band
        self.carry: dict | None = None

    def _extract(self, batch: pa.RecordBatch) -> dict:
        w = {
            "seg_id": batch.column("seg_id").to_numpy().astype(np.int64),
            "fidx": batch.column("fidx").to_numpy().astype(np.int64),
            "term": batch.column("term").to_numpy(zero_copy_only=False),
            "min_doc": batch.column("min_doc").to_numpy().astype(np.int64),
            "n": batch.column("n").to_numpy().astype(np.int64),
        }
        if self.with_band:
            w["band"] = batch.column("band").to_numpy().astype(np.int64)
        for c in _BIN_COLS:
            w[c] = _bin_view(batch, c)
        return w

    def _concat(self, a: dict, b: dict) -> dict:
        out = {}
        for k in a:
            if k in _BIN_COLS:
                da, oa = a[k]
                db, ob = b[k]
                out[k] = (
                    np.concatenate((da, db)),
                    np.concatenate((oa[:-1], ob + oa[-1])),
                )
            else:
                out[k] = np.concatenate((a[k], b[k]))
        return out

    def _slice(self, w: dict, lo: int, hi: int) -> dict:
        out = {}
        for k, v in w.items():
            if k in _BIN_COLS:
                data, offs = v
                out[k] = (
                    data[offs[lo] : offs[hi]].copy(),
                    (offs[lo : hi + 1] - offs[lo]).copy(),
                )
            else:
                out[k] = v[lo:hi].copy()
        return out

    def groups(self, batches):
        """Yield (working set, group starts, cut) per batch; groups cover
        rows [0, cut) and are complete."""
        for batch in batches:
            if batch.num_rows == 0:
                continue
            w = self._extract(batch)
            if self.carry is not None:
                w = self._concat(self.carry, w)
                self.carry = None
            m = len(w["seg_id"])
            new = np.empty(m, dtype=bool)
            new[0] = True
            new[1:] = (
                (w["seg_id"][1:] != w["seg_id"][:-1])
                | (w["fidx"][1:] != w["fidx"][:-1])
                | (w["term"][1:] != w["term"][:-1])
            )
            if self.with_band:
                new[1:] |= w["band"][1:] != w["band"][:-1]
            gstart = np.flatnonzero(new)
            cut = gstart[-1]  # last group may continue into the next batch
            self.carry = self._slice(w, cut, m)
            if cut > 0:
                yield w, gstart[:-1], cut
        if self.carry is not None and len(self.carry["seg_id"]):
            w = self.carry
            self.carry = None
            yield w, np.array([0], dtype=np.int64), len(w["seg_id"])


def merge_kernel(batches):
    """Level-1 band merge: concatenate partials of one (seg, field, term,
    band) in min_doc order (pure concat — ranges never interleave; the
    whole merge is offset arithmetic over the batch's contiguous buffers)."""
    runs = _SortedRuns(with_band=True)
    for w, gstart, cut in runs.groups(batches):
        bounds = np.append(gstart, cut)
        arrays = [
            pa.array(w["seg_id"][gstart].astype(np.int32)),
            pa.array(w["fidx"][gstart].astype(np.int32)),
            pa.array(w["term"][gstart], pa.string()),
            pa.array(w["band"][gstart].astype(np.int32)),
            pa.array(w["min_doc"][gstart]),
            pa.array(np.add.reduceat(w["n"][:cut], gstart)),
        ]
        for c in _BIN_COLS:
            data, offs = w[c]
            arrays.append(_binary_array(data[: offs[cut]], offs[bounds]))
        yield pa.RecordBatch.from_arrays(
            arrays,
            names=[
                "seg_id",
                "fidx",
                "term",
                "band",
                "min_doc",
                "n",
                "docs_bin",
                "tfs_bin",
                "dls_bin",
                "pos_bin",
                "span_bin",
                "pay_bin",
            ],
        )


def make_encode_kernel(field_names, offsets_enabled=None, payloads_enabled=None):
    """Final merge + encode: one output row per (seg, field, term) with the
    block blob, skip list, blockmax metadata and position blobs (SURVEY.md
    S6/SC4). Input sorted by (seg_id, fidx, term, min_doc). Group assembly
    is offset arithmetic and the encoders are batch-vectorized across
    groups (per-group Python survives only for the rare >128-doc hot
    terms); the fidx -> field-name mapping is a take on a tiny vocab."""
    names_arr = pa.array(list(field_names), pa.string())
    enabled = np.asarray(
        offsets_enabled or [False] * len(list(field_names)), dtype=bool
    )
    pay_enabled = np.asarray(
        payloads_enabled or [False] * len(list(field_names)), dtype=bool
    )

    def kernel(batches):
        runs = _SortedRuns(with_band=False)
        for w, gstart, cut in runs.groups(batches):
            bounds = np.append(gstart, cut)
            d_data, d_off = w["docs_bin"]
            t_data, t_off = w["tfs_bin"]
            l_data, l_off = w["dls_bin"]
            p_data, p_off = w["pos_bin"]
            s_data, s_off = w["span_bin"]
            y_data, y_off = w["pay_bin"]
            docs_all = d_data[: d_off[cut]].view("<u4")
            tfs_all = t_data[: t_off[cut]].view("<u4")
            dls_all = l_data[: l_off[cut]].view("<u4")
            pos_all = p_data[: p_off[cut]].view("<u4")
            span_all = s_data[: s_off[cut]].view("<u4")
            pay_all = y_data[: y_off[cut]].view("<u4")
            db = (d_off[bounds] // 4).astype(np.int64)
            dfs = np.diff(db)
            cfs = np.add.reduceat(tfs_all.astype(np.int64), db[:-1])
            max_tfs = np.maximum.reduceat(tfs_all.astype(np.int64), db[:-1])
            blob_buf, blob_off, skip_buf, skip_off, bmax_buf, bmax_off = (
                encode_postings_batch(docs_all, tfs_all, dls_all, db)
            )
            po_buf, po_off, pay_buf, pay_off = encode_positions_batch(
                pos_all.astype(np.int64), tfs_all.astype(np.int64), db
            )
            # A8 spans: raw-VByte of interleaved (start, len) per
            # occurrence; per-doc counts = 2*tf on offsets-enabled fields
            en_doc = np.repeat(enabled[w["fidx"][gstart]], dfs)
            span_counts = np.where(en_doc, 2 * tfs_all.astype(np.int64), 0)
            so_buf, so_off, sp_buf, sp_off = encode_raw_batch(
                span_all, span_counts, db
            )
            # A8 payloads: surface code points per occurrence, slice
            # lengths = the span lengths (odd entries of the doc's span
            # slice; every slice length is even, so global odd parity ==
            # within-slice parity)
            en_pay_doc = np.repeat(pay_enabled[w["fidx"][gstart]], dfs)
            n_docs_all = len(tfs_all)
            occ_sizes = np.where(en_doc, tfs_all.astype(np.int64), 0)
            if occ_sizes.sum():
                sp_lens = span_all[1::2].astype(np.int64)
                occ_doc = np.repeat(
                    np.arange(n_docs_all, dtype=np.int64), occ_sizes
                )
                chars_per_doc = np.bincount(
                    occ_doc, weights=sp_lens, minlength=n_docs_all
                ).astype(np.int64)
            else:
                chars_per_doc = np.zeros(n_docs_all, dtype=np.int64)
            pay_counts = np.where(en_pay_doc, chars_per_doc, 0)
            yo_buf, yo_off, yp_buf, yp_off = encode_raw_batch(
                pay_all, pay_counts, db
            )
            # per-row blob byte sizes as plain columns: build metrics come
            # from a light columnar scan, never from re-reading the blobs
            blob_sz = np.diff(blob_off) + np.diff(skip_off) + np.diff(bmax_off)
            pos_sz = (
                np.diff(po_off) + np.diff(pay_off) + np.diff(so_off) + np.diff(sp_off)
                + np.diff(yo_off) + np.diff(yp_off)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(w["seg_id"][gstart].astype(np.int32)),
                    pc.take(names_arr, pa.array(w["fidx"][gstart])),
                    pa.array(w["term"][gstart], pa.string()),
                    pa.array(dfs),
                    pa.array(cfs),
                    pa.array(max_tfs.astype(np.int32)),
                    _binary_array(blob_buf, blob_off),
                    _binary_array(skip_buf, skip_off),
                    _binary_array(bmax_buf, bmax_off),
                    _binary_array(po_buf, po_off),
                    _binary_array(pay_buf, pay_off),
                    _binary_array(so_buf, so_off),
                    _binary_array(sp_buf, sp_off),
                    _binary_array(yo_buf, yo_off),
                    _binary_array(yp_buf, yp_off),
                    pa.array(blob_sz.astype(np.int64)),
                    pa.array(pos_sz.astype(np.int64)),
                ],
                names=[
                    "seg_id",
                    "field",
                    "term",
                    "df",
                    "cf",
                    "max_tf",
                    "blob",
                    "skip",
                    "bmax",
                    "pos_off",
                    "pos_pay",
                    "span_off",
                    "span_pay",
                    "pay_off",
                    "pay_pay",
                    "blob_bytes",
                    "pos_bytes",
                ],
            )

    return kernel
