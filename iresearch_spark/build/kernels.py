"""Arrow-batch kernels for the segment build pipeline (SURVEY.md M1/S2/S6).

Everything here runs inside DataFrame.mapInArrow on executors and is
numpy/pandas vectorized per batch — no per-row Python on the hot path
(BASELINE.json:15). The pipeline reproduces the reference's in-memory
inverted-index accumulation + format flush
([up] core/index/field_data.cpp -> [up] core/formats/formats_10.cpp) as a
sequence of vectorized map stages + compact shuffles:

  tokenize_kernel   corpus rows -> (seg, url, meta, dl, terms, tfs, positions)
  assign_kernel     (sorted by seg,url)   -> + per-segment sequential doc_id
  partials_kernel   token lists -> per-(seg,term,band) raw posting partials
  merge_kernel      (sorted partials)     -> concatenated band partials
  encode_kernel     (sorted band merges)  -> final encoded posting rows

Partials carry raw little-endian uint32 arrays (docs/tfs/dls/positions) so
shuffles move compact binary, and every merge is a pure concatenation:
doc ranges of partials for one (seg, term) never interleave (a segment is
wholly contained in one partition and batches are consumed in order), so
ordering by min_doc is sufficient. Final blob bytes are therefore
independent of batch boundaries and parallelism — the N-vs-4N determinism
requirement (BASELINE.md scaling protocol).
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pyarrow as pa

from iresearch_spark.analysis.extract import extract_series
from iresearch_spark.analysis.tokenizer import STOPWORDS, _TOKEN_RE
from iresearch_spark.codec.postings import encode_positions, encode_postings

TOKENIZED_SCHEMA = (
    "seg_id int, url string, warc_ts timestamp, lang string, dl int, "
    "terms array<string>, tfs array<int>, positions array<int>"
)
ASSIGNED_SCHEMA = (
    "seg_id int, doc_id bigint, url string, warc_ts timestamp, lang string, "
    "dl int, terms array<string>, tfs array<int>, positions array<int>"
)
PARTIAL_SCHEMA = (
    "seg_id int, term string, band int, min_doc bigint, n bigint, "
    "docs_bin binary, tfs_bin binary, dls_bin binary, pos_bin binary"
)
POSTING_SCHEMA = (
    "seg_id int, term string, df bigint, cf bigint, max_tf int, "
    "blob binary, skip binary, bmax binary, pos_off binary, pos_pay binary"
)
NORMS_SCHEMA = "seg_id int, n_docs bigint, dls_bin binary"


def norms_builder(key, pdf):
    """Per-segment dense norms column: dls_bin[doc_id-1] = doc length (u32).
    The reference stores norms in its columnstore per doc
    ([up] core/index/norm.cpp); dense docIDs make a flat array exact."""
    import pandas as pd

    pdf = pdf.sort_values("doc_id")
    doc = pdf["doc_id"].to_numpy()
    n = len(doc)
    assert doc[0] == 1 and doc[-1] == n, "docIDs must be dense 1..n"
    dls = pdf["dl"].to_numpy().astype("<u4")
    return pd.DataFrame(
        {"seg_id": [key[0]], "n_docs": [n], "dls_bin": [dls.tobytes()]}
    )


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


# ------------------------------------------------------------ tokenization


def tokenize_kernel(batches):
    """corpus (seg_id, url, warc_ts, lang, html, text) -> TOKENIZED_SCHEMA.

    html -> frozen extraction -> frozen tokenization -> per-doc inverted
    entry (sorted unique terms, tfs, positions flat in term order). Falls
    back to the `text` column for rows with null html.
    """
    stop_arr = np.asarray(sorted(STOPWORDS), dtype=np.str_)
    for batch in batches:
        tbl = batch.to_pandas()
        n = len(tbl)
        if n == 0:
            continue
        texts = extract_series(tbl["html"])
        if tbl["html"].isna().any():
            mask = tbl["html"].isna()
            texts.loc[mask] = tbl["text"].fillna("")[mask]
        norm = texts.str.normalize("NFKC").str.lower()
        tok_lists = norm.str.findall(_TOKEN_RE)
        counts = tok_lists.str.len().to_numpy(np.int64)
        total = int(counts.sum())
        if total:
            flat = np.asarray(
                list(chain.from_iterable(tok_lists)), dtype=np.str_
            )
        else:
            flat = np.empty(0, dtype="<U1")
        keep = ~np.isin(flat, stop_arr)
        owner = np.repeat(np.arange(n, dtype=np.int64), counts)[keep]
        kept = flat[keep]
        kcounts = np.bincount(owner, minlength=n).astype(np.int64)
        kstarts = np.cumsum(kcounts) - kcounts
        pos = np.arange(len(kept), dtype=np.int64) - np.repeat(kstarts, kcounts)
        # per-doc (term asc, position asc) order
        order = np.lexsort((pos, kept, owner))
        o_owner, o_term, o_pos = owner[order], kept[order], pos[order]
        if len(order):
            newgrp = np.empty(len(order), dtype=bool)
            newgrp[0] = True
            newgrp[1:] = (o_owner[1:] != o_owner[:-1]) | (o_term[1:] != o_term[:-1])
            gstart = np.flatnonzero(newgrp)
            tf = np.diff(np.append(gstart, len(order)))
            gterm = o_term[gstart]
            gowner = o_owner[gstart]
        else:
            gstart = np.empty(0, np.int64)
            tf = np.empty(0, np.int64)
            gterm = np.empty(0, "<U1")
            gowner = np.empty(0, np.int64)
        terms_per_doc = np.bincount(gowner, minlength=n).astype(np.int64)
        term_off = np.concatenate(([0], np.cumsum(terms_per_doc)))
        pos_off = np.concatenate(([0], np.cumsum(kcounts)))
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("seg_id"),
                batch.column("url"),
                batch.column("warc_ts"),
                batch.column("lang"),
                pa.array(kcounts, pa.int32()),
                pa.ListArray.from_arrays(
                    pa.array(term_off, pa.int32()), pa.array(gterm, pa.string())
                ),
                pa.ListArray.from_arrays(
                    pa.array(term_off, pa.int32()), pa.array(tf, pa.int32())
                ),
                pa.ListArray.from_arrays(
                    pa.array(pos_off, pa.int32()), pa.array(o_pos, pa.int32())
                ),
            ],
            names=[
                "seg_id",
                "url",
                "warc_ts",
                "lang",
                "dl",
                "terms",
                "tfs",
                "positions",
            ],
        )


# --------------------------------------------------------- docID assignment


def assign_kernel(batches):
    """Assign per-segment sequential docIDs (1-based, [up] core/shared.hpp
    doc_limits). Input MUST be partitioned by seg_id and sorted by
    (seg_id, url) — the counter state is partition-scoped and deterministic
    because each segment lives wholly inside one partition."""
    counters: dict[int, int] = {}
    for batch in batches:
        seg = batch.column("seg_id").to_numpy()
        n = len(seg)
        if n == 0:
            continue
        doc = np.empty(n, dtype=np.int64)
        change = np.flatnonzero(np.diff(seg)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [n]))
        for s, e in zip(starts, ends):
            sid = int(seg[s])
            base = counters.get(sid, 0)
            doc[s:e] = base + 1 + np.arange(e - s, dtype=np.int64)
            counters[sid] = base + (e - s)
        arrays = [batch.column("seg_id"), pa.array(doc, pa.int64())] + [
            batch.column(i) for i in range(1, batch.num_columns)
        ]
        names = ["seg_id", "doc_id"] + batch.schema.names[1:]
        yield pa.RecordBatch.from_arrays(arrays, names=names)


# ------------------------------------------------------------ raw partials


def make_partials_kernel(band_bits: int = 16):
    """(seg_id, doc_id, dl, terms, tfs, positions) -> PARTIAL_SCHEMA rows.

    Explodes each batch's token lists into (seg, term, band) posting runs
    with raw uint32 payloads. `band` = (doc_id-1) >> band_bits splits a hot
    term's postings into doc-range bands so the level-1 merge shuffle
    spreads the term over multiple reducers — the salted-shuffle skew
    defusal mandated by BASELINE.json:6.
    """

    def kernel(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            seg = batch.column("seg_id").to_numpy().astype(np.int64)
            doc = batch.column("doc_id").to_numpy().astype(np.int64)
            dl = batch.column("dl").to_numpy().astype(np.int64)
            terms_la = batch.column("terms")
            t_off = _list_offsets(terms_la)
            t_vals = np.asarray(terms_la.values.to_pylist(), dtype=np.str_)
            tf_vals = batch.column("tfs").values.to_numpy().astype(np.int64)
            pos_vals = batch.column("positions").values.to_numpy().astype(np.int64)
            ntpd = np.diff(t_off)
            if ntpd.sum() == 0:
                continue
            e_seg = np.repeat(seg, ntpd)
            e_doc = np.repeat(doc, ntpd)
            e_dl = np.repeat(dl, ntpd)
            e_tf = tf_vals
            e_band = (e_doc - 1) >> band_bits
            # entry -> slice of pos_vals: entries are laid out in order, so
            # the exclusive prefix sum of e_tf is each entry's start
            ctf = np.concatenate(([0], np.cumsum(e_tf)))[:-1]
            order = np.lexsort((e_doc, e_band, t_vals, e_seg))
            s_seg, s_term = e_seg[order], t_vals[order]
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
            # run boundaries on (seg, term, band)
            m = len(order)
            newrun = np.empty(m, dtype=bool)
            newrun[0] = True
            newrun[1:] = (
                (s_seg[1:] != s_seg[:-1])
                | (s_band[1:] != s_band[:-1])
                | (s_term[1:] != s_term[:-1])
            )
            rstart = np.flatnonzero(newrun)
            rlen = np.diff(np.append(rstart, m))
            run_tf = np.add.reduceat(ns, rstart)
            # zero-copy binary columns: one contiguous buffer + offsets
            entry_off4 = np.concatenate(([0], np.cumsum(rlen))) * 4
            pos_off4 = np.concatenate(([0], np.cumsum(run_tf))) * 4
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(s_seg[rstart].astype(np.int32)),
                    pa.array(s_term[rstart], pa.string()),
                    pa.array(s_band[rstart].astype(np.int32)),
                    pa.array(s_doc[rstart]),
                    pa.array(rlen.astype(np.int64)),
                    _binary_array(s_doc.astype("<u4").tobytes(), entry_off4),
                    _binary_array(s_tf.astype("<u4").tobytes(), entry_off4),
                    _binary_array(s_dl.astype("<u4").tobytes(), entry_off4),
                    _binary_array(s_pos.astype("<u4").tobytes(), pos_off4),
                ],
                names=[
                    "seg_id",
                    "term",
                    "band",
                    "min_doc",
                    "n",
                    "docs_bin",
                    "tfs_bin",
                    "dls_bin",
                    "pos_bin",
                ],
            )

    return kernel


# ------------------------------------------------------- merge with carry


def _iter_groups(batches, key_cols: list[str]):
    """Yield (pandas sub-frame) per complete key group across batch
    boundaries; input batches must arrive sorted by key_cols. The trailing
    (possibly incomplete) group is carried into the next batch."""
    import pandas as pd

    carry = None
    for batch in batches:
        pdf = batch.to_pandas()
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if len(pdf) == 0:
            continue
        last = tuple(pdf.iloc[-1][k] for k in key_cols)
        tail_mask = np.ones(len(pdf), dtype=bool)
        for k, v in zip(key_cols, last):
            tail_mask &= (pdf[k] == v).to_numpy()
        # keys are sorted, so equality with the last key is a suffix run
        idx = np.flatnonzero(~tail_mask)
        cut = (idx[-1] + 1) if len(idx) else 0
        carry = pdf.iloc[cut:]
        work = pdf.iloc[:cut]
        if len(work):
            for _, grp in work.groupby(key_cols, sort=False):
                yield grp
    if carry is not None and len(carry):
        for _, grp in carry.groupby(key_cols, sort=False):
            yield grp


def merge_kernel(batches):
    """Level-1 band merge: concatenate partials of one (seg, term, band)
    in min_doc order (pure concat — ranges never interleave)."""
    rows: list[dict] = []

    def flush():
        nonlocal rows
        if not rows:
            return None
        import pandas as pd

        out = pa.RecordBatch.from_pandas(
            pd.DataFrame(rows),
            schema=pa.schema(
                [
                    ("seg_id", pa.int32()),
                    ("term", pa.string()),
                    ("band", pa.int32()),
                    ("min_doc", pa.int64()),
                    ("n", pa.int64()),
                    ("docs_bin", pa.binary()),
                    ("tfs_bin", pa.binary()),
                    ("dls_bin", pa.binary()),
                    ("pos_bin", pa.binary()),
                ]
            ),
            preserve_index=False,
        )
        rows = []
        return out

    for grp in _iter_groups(batches, ["seg_id", "term", "band"]):
        rows.append(
            {
                "seg_id": grp["seg_id"].iloc[0],
                "term": grp["term"].iloc[0],
                "band": grp["band"].iloc[0],
                "min_doc": grp["min_doc"].iloc[0],
                "n": int(grp["n"].sum()),
                "docs_bin": b"".join(grp["docs_bin"]),
                "tfs_bin": b"".join(grp["tfs_bin"]),
                "dls_bin": b"".join(grp["dls_bin"]),
                "pos_bin": b"".join(grp["pos_bin"]),
            }
        )
        if len(rows) >= 2048:
            out = flush()
            if out is not None:
                yield out
    out = flush()
    if out is not None:
        yield out


def encode_kernel(batches):
    """Final merge + encode: one output row per (seg, term) with the block
    blob, skip list, blockmax metadata and position blobs (SURVEY.md S6/SC4).
    Input sorted by (seg_id, term, min_doc)."""
    rows: list[dict] = []

    def flush():
        nonlocal rows
        if not rows:
            return None
        import pandas as pd

        out = pa.RecordBatch.from_pandas(
            pd.DataFrame(rows),
            schema=pa.schema(
                [
                    ("seg_id", pa.int32()),
                    ("term", pa.string()),
                    ("df", pa.int64()),
                    ("cf", pa.int64()),
                    ("max_tf", pa.int32()),
                    ("blob", pa.binary()),
                    ("skip", pa.binary()),
                    ("bmax", pa.binary()),
                    ("pos_off", pa.binary()),
                    ("pos_pay", pa.binary()),
                ]
            ),
            preserve_index=False,
        )
        rows = []
        return out

    for grp in _iter_groups(batches, ["seg_id", "term"]):
        docs = np.frombuffer(b"".join(grp["docs_bin"]), dtype="<u4")
        tfs = np.frombuffer(b"".join(grp["tfs_bin"]), dtype="<u4")
        dls = np.frombuffer(b"".join(grp["dls_bin"]), dtype="<u4")
        pos = np.frombuffer(b"".join(grp["pos_bin"]), dtype="<u4")
        blob, skip, bmax = encode_postings(docs, tfs, dls)
        pos_off, pos_pay = encode_positions(
            pos.astype(np.int64), tfs.astype(np.int64)
        )
        rows.append(
            {
                "seg_id": grp["seg_id"].iloc[0],
                "term": grp["term"].iloc[0],
                "df": int(len(docs)),
                "cf": int(tfs.sum()),
                "max_tf": int(tfs.max()),
                "blob": blob,
                "skip": skip,
                "bmax": bmax,
                "pos_off": pos_off,
                "pos_pay": pos_pay,
            }
        )
        if len(rows) >= 1024:
            out = flush()
            if out is not None:
                yield out
    out = flush()
    if out is not None:
        yield out
