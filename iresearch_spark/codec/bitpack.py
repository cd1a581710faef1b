"""Fixed-width bitpacking for full posting blocks (numpy-vectorized).

Mirrors the reference's SIMD bitpacking of full 128-document blocks
([up] core/utils/bit_packing.hpp, [up] external/simdcomp); here the
"SIMD-style" lane is numpy's vectorized unpackbits/packbits
(BASELINE.json:6 "VByte/SIMD-style block compression").

Layout: values are written MSB-first at `width` bits each, packed into a
contiguous bitstream padded to a byte boundary.
"""

from __future__ import annotations

import numpy as np


def width_for(values: np.ndarray) -> int:
    """Minimal bit width that can represent max(values); ≥1."""
    if len(values) == 0:
        return 1
    m = int(values.max())
    return max(1, m.bit_length())


def bitpack(values: np.ndarray, width: int) -> bytes:
    """Pack uint32 values at `width` bits each (MSB-first)."""
    v = np.ascontiguousarray(values, dtype=np.uint32)
    if len(v) == 0:
        return b""
    # view each uint32 as 4 big-endian bytes -> 32 bits per value
    as_bytes = v.astype(">u4").view(np.uint8).reshape(len(v), 4)
    bits = np.unpackbits(as_bytes, axis=1)  # (n, 32), MSB first
    wanted = bits[:, 32 - width :]  # low `width` bits of each value
    return np.packbits(wanted.reshape(-1)).tobytes()


def bitunpack(buf: bytes | np.ndarray, width: int, count: int) -> np.ndarray:
    """Unpack `count` values of `width` bits each."""
    if count == 0:
        return np.empty(0, dtype=np.uint32)
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    bits = np.unpackbits(b)[: count * width].reshape(count, width)
    full = np.zeros((count, 32), dtype=np.uint8)
    full[:, 32 - width :] = bits
    packed = np.packbits(full, axis=1)  # (count, 4) big-endian bytes
    return packed.view(">u4").reshape(count).astype(np.uint32)
