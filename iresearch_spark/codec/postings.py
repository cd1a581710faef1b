"""Posting-list block format: docID-delta + bitpack/VByte 128-doc blocks,
skip list, per-block max-score metadata.

Mirrors the reference's postings format semantics
([up] core/formats/formats_10.cpp :: postings_writer/postings_reader):
  * documents are split into blocks of BLOCK_SIZE (=128) docIDs;
  * full blocks are fixed-width bitpacked ("SIMD-style"), the tail block is
    VByte — both over (delta - 1) of strictly-increasing docIDs
    (BASELINE.json:6 "docID-delta + VByte/SIMD-style block compression");
  * a skip entry per block (last docID + byte offset) allows seek(target)
    without decoding prior blocks ([up] core/formats/skip_list.hpp);
  * per-block WAND metadata (max tf, min doc length) bounds the block's best
    possible BM25 contribution ([up] core/formats/formats_10.cpp wand hooks,
    BASELINE.json:6 "per-block max-score metadata").

Blob layout (all little-endian):
  u32 n_docs
  repeated blocks:
    u16 n          docs in this block (1..128)
    u8  doc_mode   0 = VByte, else bit width of packed doc deltas
    u8  tf_mode    0 = VByte, else bit width of packed (tf-1)
    u32 first_doc  absolute first docID of the block
    u32 len_docs   payload bytes for the n-1 doc deltas (delta-1 encoded)
    u32 len_tfs    payload bytes for the n tf values (tf-1 encoded)
    bytes payload_docs, payload_tfs

Skip blob: per block (last_doc u32, offset u32) — offset is the block start
relative to the beginning of the postings blob.
Blockmax blob: per block (max_tf u32, min_dl u32).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from iresearch_spark import BLOCK_SIZE
from iresearch_spark.codec.bitpack import bitpack, bitunpack, width_for
from iresearch_spark.codec.vbyte import vbyte_decode, vbyte_encode

_HDR = 16  # per-block header bytes: 2+1+1+4+4+4


@dataclass
class PostingList:
    doc_ids: np.ndarray  # uint32, sorted ascending, ≥1
    tfs: np.ndarray  # uint32, ≥1

    def __len__(self) -> int:
        return len(self.doc_ids)


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> tuple[bytes, bytes, bytes]:
    """Encode one posting list -> (postings_blob, skip_blob, blockmax_blob).

    `dls` are the document lengths aligned with doc_ids (for blockmax).
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint32)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint32)
    dls = np.ascontiguousarray(dls, dtype=np.uint32)
    n = len(doc_ids)
    if n == 0:
        return (np.uint32(0).tobytes(), b"", b"")
    if len(tfs) != n or len(dls) != n:
        raise ValueError("doc_ids/tfs/dls length mismatch")

    parts: list[bytes] = [np.uint32(n).astype("<u4").tobytes()]
    offset = 4
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    skip = np.empty((n_blocks, 2), dtype="<u4")
    bmax = np.empty((n_blocks, 2), dtype="<u4")

    for bi in range(n_blocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
        d = doc_ids[lo:hi]
        t = tfs[lo:hi]
        nb = hi - lo
        deltas = (np.diff(d.astype(np.uint64)) - 1).astype(np.uint32)
        tf0 = (t.astype(np.uint64) - 1).astype(np.uint32)
        if nb == BLOCK_SIZE:
            dw = width_for(deltas)
            tw = width_for(tf0)
            pd = bitpack(deltas, dw)
            pt = bitpack(tf0, tw)
        else:
            dw = tw = 0
            pd = vbyte_encode(deltas)
            pt = vbyte_encode(tf0)
        hdr = (
            np.uint16(nb).astype("<u2").tobytes()
            + bytes([dw, tw])
            + np.uint32(d[0]).astype("<u4").tobytes()
            + np.uint32(len(pd)).astype("<u4").tobytes()
            + np.uint32(len(pt)).astype("<u4").tobytes()
        )
        skip[bi] = (d[-1], offset)
        bmax[bi] = (t.max(), dls[lo:hi].min())
        parts.extend((hdr, pd, pt))
        offset += _HDR + len(pd) + len(pt)

    return b"".join(parts), skip.tobytes(), bmax.tobytes()


def _decode_block(buf: np.ndarray, off: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Decode one block at byte offset `off` -> (doc_ids, tfs, next_offset)."""
    nb = int(buf[off]) | (int(buf[off + 1]) << 8)
    dw, tw = int(buf[off + 2]), int(buf[off + 3])
    first = int(buf[off + 4 : off + 8].view("<u4")[0])
    ld = int(buf[off + 8 : off + 12].view("<u4")[0])
    lt = int(buf[off + 12 : off + 16].view("<u4")[0])
    p = off + _HDR
    pd = buf[p : p + ld]
    pt = buf[p + ld : p + ld + lt]
    if dw:
        deltas = bitunpack(pd, dw, nb - 1)
    else:
        deltas = vbyte_decode(pd, nb - 1)
    if tw:
        tf0 = bitunpack(pt, tw, nb)
    else:
        tf0 = vbyte_decode(pt, nb)
    docs = np.empty(nb, dtype=np.uint64)
    docs[0] = first
    if nb > 1:
        docs[1:] = first + np.cumsum(deltas.astype(np.uint64) + 1)
    return docs.astype(np.uint32), (tf0.astype(np.uint64) + 1).astype(np.uint32), p + ld + lt


def decode_postings(
    blob: bytes, block_indices: np.ndarray | None = None, skip: bytes | None = None
) -> PostingList:
    """Decode a postings blob fully, or only selected blocks.

    With `block_indices` + `skip`, decodes only those blocks (seek path —
    the skip list gives each block's byte offset, [up] core/formats/
    skip_list.hpp semantics without touching preceding blocks).
    """
    buf = np.frombuffer(blob, dtype=np.uint8)
    n = int(buf[0:4].view("<u4")[0])
    if n == 0:
        return PostingList(np.empty(0, np.uint32), np.empty(0, np.uint32))
    docs_out: list[np.ndarray] = []
    tfs_out: list[np.ndarray] = []
    if block_indices is None:
        off = 4
        while off < len(buf):
            d, t, off = _decode_block(buf, off)
            docs_out.append(d)
            tfs_out.append(t)
    else:
        offsets = decode_skip(skip)[:, 1]
        for bi in np.asarray(block_indices, dtype=np.int64):
            d, t, _ = _decode_block(buf, int(offsets[bi]))
            docs_out.append(d)
            tfs_out.append(t)
    return PostingList(np.concatenate(docs_out), np.concatenate(tfs_out))


def decode_skip(skip: bytes) -> np.ndarray:
    """Skip blob -> (n_blocks, 2) array of [last_doc, byte_offset]."""
    return np.frombuffer(skip, dtype="<u4").reshape(-1, 2).astype(np.int64)


def decode_blockmax(bmax: bytes) -> np.ndarray:
    """Blockmax blob -> (n_blocks, 2) array of [max_tf, min_dl]."""
    return np.frombuffer(bmax, dtype="<u4").reshape(-1, 2).astype(np.int64)


# ------------------------------------------------------------ batch encode


def encode_postings_batch(
    docs: np.ndarray, tfs: np.ndarray, dls: np.ndarray, go: np.ndarray
) -> tuple[np.ndarray, ...]:
    """Encode MANY posting lists in one vectorized pass.

    `go` holds int64 row offsets (n_groups+1) delimiting each list inside
    docs/tfs/dls. Returns (blob_buf, blob_off, skip_buf, skip_off,
    bmax_buf, bmax_off): contiguous uint8 buffers + per-group byte offsets,
    ready for zero-copy arrow binary assembly.

    Groups of ≤ BLOCK_SIZE docs (the Zipf tail — the overwhelming
    majority) take a fully vectorized single-VByte-block path with
    scatter-assembled headers; larger groups fall back to the per-group
    block encoder. Byte output is identical to encode_postings either way
    (enforced by tests/test_codec.py round-trips and the cross-path build
    determinism test).
    """
    go = np.asarray(go, dtype=np.int64)
    n_g = np.diff(go)
    G = len(n_g)
    # strictly below BLOCK_SIZE: an exactly-full block is bitpacked, not
    # VByte, so it must take the per-group block encoder
    small = n_g < BLOCK_SIZE
    big_idx = np.flatnonzero(~small)
    big_res = {
        int(g): encode_postings(
            docs[go[g] : go[g + 1]], tfs[go[g] : go[g + 1]], dls[go[g] : go[g + 1]]
        )
        for g in big_idx
    }

    srow = np.repeat(small, n_g)
    sdocs = docs[srow].astype(np.uint64)
    stfs = tfs[srow].astype(np.uint64)
    sdls = dls[srow].astype(np.uint64)
    sn = n_g[small]
    ns = len(sn)
    s_go = np.concatenate(([0], np.cumsum(sn)))
    first_idx = s_go[:-1]

    prev = np.empty_like(sdocs)
    if len(sdocs):
        prev[0] = 0
        prev[1:] = sdocs[:-1]
    isfirst = np.zeros(len(sdocs), dtype=bool)
    isfirst[first_idx] = True
    d_vals = (sdocs - prev - 1)[~isfirst].astype(np.uint32)
    t_vals = (stfs - 1).astype(np.uint32)
    from iresearch_spark.codec.vbyte import _byte_lengths

    bl_d_row = np.zeros(len(sdocs), dtype=np.int64)
    bl_d_row[~isfirst] = _byte_lengths(d_vals.astype(np.uint64))
    bl_t_row = _byte_lengths(t_vals.astype(np.uint64))
    len_pd = (
        np.add.reduceat(bl_d_row, first_idx) if ns else np.empty(0, np.int64)
    )
    len_pt = (
        np.add.reduceat(bl_t_row, first_idx) if ns else np.empty(0, np.int64)
    )

    blob_len = np.empty(G, dtype=np.int64)
    blob_len[small] = 4 + _HDR + len_pd + len_pt
    skip_len = np.empty(G, dtype=np.int64)
    skip_len[small] = 8
    bmax_len = np.empty(G, dtype=np.int64)
    bmax_len[small] = 8
    for g, (b, s, m) in big_res.items():
        blob_len[g], skip_len[g], bmax_len[g] = len(b), len(s), len(m)
    blob_off = np.concatenate(([0], np.cumsum(blob_len)))
    skip_off = np.concatenate(([0], np.cumsum(skip_len)))
    bmax_off = np.concatenate(([0], np.cumsum(bmax_len)))

    out = np.zeros(int(blob_off[-1]), dtype=np.uint8)
    skip_buf = np.zeros(int(skip_off[-1]), dtype=np.uint8)
    bmax_buf = np.zeros(int(bmax_off[-1]), dtype=np.uint8)

    if ns:
        st = blob_off[:-1][small]
        hdr = np.empty((ns, 20), dtype=np.uint8)
        hdr[:, 0:4] = sn.astype("<u4").view(np.uint8).reshape(ns, 4)
        hdr[:, 4:6] = sn.astype("<u2").view(np.uint8).reshape(ns, 2)
        hdr[:, 6] = 0  # doc_mode = VByte
        hdr[:, 7] = 0  # tf_mode = VByte
        hdr[:, 8:12] = (
            sdocs[first_idx].astype("<u4").view(np.uint8).reshape(ns, 4)
        )
        hdr[:, 12:16] = len_pd.astype("<u4").view(np.uint8).reshape(ns, 4)
        hdr[:, 16:20] = len_pt.astype("<u4").view(np.uint8).reshape(ns, 4)
        dest = (st[:, None] + np.arange(20, dtype=np.int64)[None, :]).ravel()
        out[dest] = hdr.ravel()
        pd_payload = np.frombuffer(vbyte_encode(d_vals), dtype=np.uint8)
        if len(pd_payload):
            pd_gstart = np.concatenate(([0], np.cumsum(len_pd)))[:-1]
            dest_pd = np.arange(len(pd_payload), dtype=np.int64) + np.repeat(
                st + 20 - pd_gstart, len_pd
            )
            out[dest_pd] = pd_payload
        pt_payload = np.frombuffer(vbyte_encode(t_vals), dtype=np.uint8)
        if len(pt_payload):
            pt_gstart = np.concatenate(([0], np.cumsum(len_pt)))[:-1]
            dest_pt = np.arange(len(pt_payload), dtype=np.int64) + np.repeat(
                st + 20 + len_pd - pt_gstart, len_pt
            )
            out[dest_pt] = pt_payload
        # skip entries: (last_doc, offset=4); bmax: (max_tf, min_dl)
        sk = np.empty((ns, 8), dtype=np.uint8)
        sk[:, 0:4] = (
            sdocs[s_go[1:] - 1].astype("<u4").view(np.uint8).reshape(ns, 4)
        )
        sk[:, 4:8] = (
            np.full(ns, 4, dtype="<u4").view(np.uint8).reshape(ns, 4)
        )
        dsk = (
            skip_off[:-1][small][:, None] + np.arange(8, dtype=np.int64)[None, :]
        ).ravel()
        skip_buf[dsk] = sk.ravel()
        bm = np.empty((ns, 8), dtype=np.uint8)
        bm[:, 0:4] = (
            np.maximum.reduceat(stfs, first_idx)
            .astype("<u4")
            .view(np.uint8)
            .reshape(ns, 4)
        )
        bm[:, 4:8] = (
            np.minimum.reduceat(sdls, first_idx)
            .astype("<u4")
            .view(np.uint8)
            .reshape(ns, 4)
        )
        dbm = (
            bmax_off[:-1][small][:, None] + np.arange(8, dtype=np.int64)[None, :]
        ).ravel()
        bmax_buf[dbm] = bm.ravel()

    for g, (b, s, m) in big_res.items():
        out[blob_off[g] : blob_off[g] + len(b)] = np.frombuffer(b, np.uint8)
        skip_buf[skip_off[g] : skip_off[g] + len(s)] = np.frombuffer(s, np.uint8)
        bmax_buf[bmax_off[g] : bmax_off[g] + len(m)] = np.frombuffer(m, np.uint8)
    return out, blob_off, skip_buf, skip_off, bmax_buf, bmax_off


def encode_positions_batch(
    pos_flat: np.ndarray, counts: np.ndarray, go: np.ndarray
) -> tuple[np.ndarray, ...]:
    """Vectorized multi-group variant of encode_positions.

    `counts` = tf per posting row; `go` = row offsets per group. Returns
    (off_buf, off_off, pay_buf, pay_off): the per-group pos_off/pos_pay
    blobs as contiguous buffers + byte offsets. Byte-identical to calling
    encode_positions per group (delta coding is per-doc, VByte is
    per-value, so group slicing is pure offset arithmetic)."""
    go = np.asarray(go, dtype=np.int64)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    pos_flat = np.ascontiguousarray(pos_flat, dtype=np.uint64)
    n_g = np.diff(go)
    if len(counts) == 0:
        z = np.zeros(0, np.uint8)
        zo = np.zeros(len(go), np.int64)
        return z, zo, z, zo
    ends = np.cumsum(counts)
    starts = ends - counts
    enc = pos_flat.copy()
    prev = np.empty_like(pos_flat)
    if len(pos_flat):
        prev[0] = 0
        prev[1:] = pos_flat[:-1]
    is_first = np.zeros(len(pos_flat), dtype=bool)
    is_first[starts[counts > 0]] = True
    nonfirst = ~is_first
    enc[nonfirst] = pos_flat[nonfirst] - prev[nonfirst] - 1
    enc32 = enc.astype(np.uint32)
    payload = np.frombuffer(vbyte_encode(enc32), dtype=np.uint8)
    from iresearch_spark.codec.vbyte import _byte_lengths

    lens = _byte_lengths(enc32.astype(np.uint64))
    cum = np.concatenate(([0], np.cumsum(lens)))
    byte_ends_rows = cum[ends]  # byte end per posting row (global)
    pay_off = np.concatenate(([0], byte_ends_rows[go[1:] - 1]))
    rebased = (byte_ends_rows - np.repeat(pay_off[:-1], n_g)).astype("<u4")
    off_buf = np.frombuffer(rebased.tobytes(), dtype=np.uint8)
    off_off = go * 4
    return off_buf, off_off, payload, pay_off


def encode_raw_batch(
    vals: np.ndarray, counts: np.ndarray, go: np.ndarray
) -> tuple[np.ndarray, ...]:
    """Raw-VByte multi-group encoder (NO delta): used for the A8 offset
    spans, whose interleaved (start, length) stream is not monotonic.
    `vals` holds the concatenated u32 values, `counts` the value count per
    posting row, `go` the row offsets per group. Returns (off_buf,
    off_off, pay_buf, pay_off) with the same shape contract as
    encode_positions_batch: the offsets blob stores the byte END of each
    row's slice (u32)."""
    from iresearch_spark.codec.vbyte import _byte_lengths

    go = np.asarray(go, dtype=np.int64)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    vals32 = np.ascontiguousarray(vals, dtype=np.uint32)
    n_g = np.diff(go)
    if len(counts) == 0:
        z = np.zeros(0, np.uint8)
        zo = np.zeros(len(go), np.int64)
        return z, zo, z, zo
    payload = np.frombuffer(vbyte_encode(vals32), dtype=np.uint8)
    lens = _byte_lengths(vals32.astype(np.uint64))
    cum = np.concatenate(([0], np.cumsum(lens)))
    ends = np.cumsum(counts)
    byte_ends_rows = cum[ends]
    pay_off = np.concatenate(([0], byte_ends_rows[go[1:] - 1]))
    rebased = (byte_ends_rows - np.repeat(pay_off[:-1], n_g)).astype("<u4")
    off_buf = np.frombuffer(rebased.tobytes(), dtype=np.uint8)
    off_off = go * 4
    return off_buf, off_off, payload, pay_off


def decode_values_for(
    offsets_blob: bytes,
    payload_blob: bytes,
    doc_indices: np.ndarray,
    counts: np.ndarray,
) -> np.ndarray:
    """Decode raw-VByte value runs for selected posting rows (no delta
    reconstruction — the inverse of encode_raw_batch). Returns ONE flat
    array of counts.sum() values in row order."""
    doc_indices = np.asarray(doc_indices, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if len(doc_indices) == 0 or len(payload_blob) == 0:
        return np.empty(0, np.int64)
    ends_all = np.frombuffer(offsets_blob, dtype="<u4").astype(np.int64)
    payload = np.frombuffer(payload_blob, dtype=np.uint8)
    starts_all = np.empty_like(ends_all)
    starts_all[0] = 0
    starts_all[1:] = ends_all[:-1]
    sel_starts = starts_all[doc_indices]
    sel_lens = ends_all[doc_indices] - sel_starts
    gather_idx = np.repeat(sel_starts, sel_lens) + (
        np.arange(int(sel_lens.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(sel_lens) - sel_lens, sel_lens)
    )
    return vbyte_decode(payload[gather_idx], int(counts.sum())).astype(np.int64)


# ---------------------------------------------------------------- positions


def encode_positions(pos_flat: np.ndarray, counts: np.ndarray) -> tuple[bytes, bytes]:
    """Encode per-doc position lists -> (offsets_blob, payload_blob).

    `pos_flat` is the concatenation of each matched doc's strictly-increasing
    0-based positions; `counts` gives the number of positions per doc (== tf,
    aligned with the posting list's doc order). Per doc: first position
    as-is, then (delta - 1), all VByte. The offsets blob stores the byte END
    of each doc's slice (u32), enabling random access without decoding
    preceding docs (the columnstore-style dense index of
    [up] core/formats/columnstore2.cpp, applied to positions).
    """
    pos_flat = np.ascontiguousarray(pos_flat, dtype=np.uint64)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    if len(counts) == 0:
        return b"", b""
    ends = np.cumsum(counts)
    starts = ends - counts
    # delta-encode within each doc: value - previous, first stays absolute;
    # subtract 1 from non-first deltas (positions strictly increase)
    enc = pos_flat.copy()
    prev = np.empty_like(pos_flat)
    prev[0] = 0
    prev[1:] = pos_flat[:-1]
    is_first = np.zeros(len(pos_flat), dtype=bool)
    is_first[starts[counts > 0]] = True
    nonfirst = ~is_first
    enc[nonfirst] = pos_flat[nonfirst] - prev[nonfirst] - 1
    enc32 = enc.astype(np.uint32)
    # VByte is per-value self-delimiting, so encoding the whole flat stream
    # equals the concatenation of per-doc encodings; per-doc byte offsets
    # come from the per-value byte lengths (fully vectorized).
    payload = vbyte_encode(enc32)
    from iresearch_spark.codec.vbyte import _byte_lengths

    lens = _byte_lengths(enc32.astype(np.uint64))
    cum = np.concatenate(([0], np.cumsum(lens)))
    byte_ends = cum[ends].astype("<u4")
    return byte_ends.tobytes(), payload


def decode_positions_for(
    offsets_blob: bytes,
    payload_blob: bytes,
    doc_indices: np.ndarray,
    counts: np.ndarray,
) -> list[np.ndarray]:
    """Decode position lists for selected doc indices (by posting order).

    `counts` are the tf values for the SELECTED docs. Gathers all requested
    byte ranges and decodes them in one vectorized VByte pass.
    """
    doc_indices = np.asarray(doc_indices, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if len(doc_indices) == 0:
        return []
    ends_all = np.frombuffer(offsets_blob, dtype="<u4").astype(np.int64)
    payload = np.frombuffer(payload_blob, dtype=np.uint8)
    starts_all = np.empty_like(ends_all)
    starts_all[0] = 0
    starts_all[1:] = ends_all[:-1]
    sel_starts = starts_all[doc_indices]
    sel_lens = ends_all[doc_indices] - sel_starts
    # gather byte ranges into one buffer
    gather_idx = np.repeat(sel_starts, sel_lens) + (
        np.arange(int(sel_lens.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(sel_lens) - sel_lens, sel_lens)
    )
    vals = vbyte_decode(payload[gather_idx], int(counts.sum()))
    out: list[np.ndarray] = []
    pos = 0
    for c in counts:
        chunk = vals[pos : pos + c].astype(np.int64)
        if c > 1:
            chunk[1:] += 1
            chunk = np.cumsum(chunk)
        out.append(chunk)
        pos += c
    return out
