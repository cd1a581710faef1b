"""Vectorized (numpy) VByte varint codec for uint32 arrays.

Semantics mirror the reference's VByte tail encoding for posting blocks
([up] core/formats/formats_10.cpp :: postings_writer — full 128-doc blocks
are bitpacked, the tail block is VByte). Convention: little-endian 7-bit
groups; the LAST byte of each value has the high bit SET (terminator),
continuation bytes have it clear. Values are uint32 (≤ 5 bytes each).

Everything here is pure numpy — no Python-level per-value loops — because
these kernels run inside Arrow UDFs on the executor hot path
(BASELINE.json:15 "no per-row Python").
"""

from __future__ import annotations

import numpy as np

_U32_MAX_BYTES = 5


def _byte_lengths(values: np.ndarray) -> np.ndarray:
    """Number of VByte bytes per value (1..5)."""
    v = values.astype(np.uint64, copy=False)
    n = np.ones(len(v), dtype=np.int64)
    for k in range(1, _U32_MAX_BYTES):
        n += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    return n


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint32 array to VByte bytes (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    lens = _byte_lengths(v)
    total = int(lens.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(lens)
    starts = ends - lens
    # position of each output byte within its value: 0..len-1
    idx = np.arange(total, dtype=np.int64)
    owner = np.repeat(np.arange(len(v), dtype=np.int64), lens)
    pos = idx - starts[owner]
    chunk = (v[owner] >> (np.uint64(7) * pos.astype(np.uint64))) & np.uint64(0x7F)
    out[:] = chunk.astype(np.uint8)
    is_last = pos == (lens[owner] - 1)
    out[is_last] |= 0x80
    return out.tobytes()


def vbyte_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode VByte bytes back to a uint32 numpy array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint32)
    is_last = (b & 0x80) != 0
    ends = np.flatnonzero(is_last)
    n = len(ends)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    owner = np.repeat(np.arange(n, dtype=np.int64), lens)
    pos = np.arange(len(b), dtype=np.int64) - starts[owner]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, owner, contrib)
    out = vals.astype(np.uint32)
    if count is not None and len(out) != count:
        raise ValueError(f"vbyte_decode: expected {count} values, got {len(out)}")
    return out
