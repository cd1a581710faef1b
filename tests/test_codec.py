"""Codec round-trip + seek tests (FIXTURES.md §4; mirrors the reference's
formats round-trip suites, [up] tests/formats/formats_test_case_base.hpp)."""

import numpy as np
import pytest

from iresearch_spark import BLOCK_SIZE
from iresearch_spark.codec import (
    bitpack,
    bitunpack,
    decode_blockmax,
    decode_postings,
    decode_positions_for,
    decode_skip,
    encode_positions,
    encode_postings,
    vbyte_decode,
    vbyte_encode,
)


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [0],
        [1],
        [127],
        [128],
        [16383, 16384],
        [2**32 - 1],
        list(range(1000)),
    ],
)
def test_vbyte_roundtrip_basic(vals):
    arr = np.asarray(vals, dtype=np.uint32)
    assert np.array_equal(vbyte_decode(vbyte_encode(arr)), arr)


def test_vbyte_roundtrip_random():
    rng = np.random.default_rng(42)
    for n in (1, 127, 128, 129, 4096, 100_000):
        arr = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
        assert np.array_equal(vbyte_decode(vbyte_encode(arr)), arr)


def test_bitpack_roundtrip():
    rng = np.random.default_rng(7)
    for width in (1, 3, 7, 8, 13, 17, 24, 31, 32):
        hi = 2**width
        arr = rng.integers(0, hi, size=BLOCK_SIZE, dtype=np.uint64).astype(np.uint32)
        assert np.array_equal(bitunpack(bitpack(arr, width), width, BLOCK_SIZE), arr)


def _random_postings(rng, n):
    gaps = rng.geometric(0.05, size=n).astype(np.uint64)
    docs = np.cumsum(gaps).astype(np.uint32)
    tfs = rng.integers(1, 50, size=n, dtype=np.uint64).astype(np.uint32)
    dls = rng.integers(5, 2000, size=n, dtype=np.uint64).astype(np.uint32)
    return docs, tfs, dls


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 4096, 100_000])
def test_postings_roundtrip(n):
    rng = np.random.default_rng(n + 1)
    docs, tfs, dls = _random_postings(rng, n)
    blob, skip, bmax = encode_postings(docs, tfs, dls)
    pl = decode_postings(blob)
    assert np.array_equal(pl.doc_ids, docs)
    assert np.array_equal(pl.tfs, tfs)
    if n:
        sk = decode_skip(skip)
        bm = decode_blockmax(bmax)
        n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        assert sk.shape == (n_blocks, 2) and bm.shape == (n_blocks, 2)
        # skip entries: last docid per block
        for bi in range(n_blocks):
            lo, hi_ = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
            assert sk[bi, 0] == docs[hi_ - 1]
            assert bm[bi, 0] == tfs[lo:hi_].max()
            assert bm[bi, 1] == dls[lo:hi_].min()


def test_postings_adversarial_gaps():
    # all-1 gaps (dense) and one giant gap
    docs = np.arange(1, 400, dtype=np.uint32)
    tfs = np.ones(399, dtype=np.uint32)
    dls = np.full(399, 7, dtype=np.uint32)
    blob, _, _ = encode_postings(docs, tfs, dls)
    assert np.array_equal(decode_postings(blob).doc_ids, docs)
    docs2 = np.array([1, 2**31, 2**32 - 2], dtype=np.uint32)
    blob2, _, _ = encode_postings(docs2, tfs[:3], dls[:3])
    assert np.array_equal(decode_postings(blob2).doc_ids, docs2)


def test_selective_block_decode_matches_full():
    rng = np.random.default_rng(99)
    docs, tfs, dls = _random_postings(rng, 5000)
    blob, skip, _ = encode_postings(docs, tfs, dls)
    full = decode_postings(blob)
    # decode only blocks 3 and 17 via the skip list (seek path)
    sel = decode_postings(blob, block_indices=np.array([3, 17]), skip=skip)
    lo3, hi3 = 3 * BLOCK_SIZE, 4 * BLOCK_SIZE
    lo17, hi17 = 17 * BLOCK_SIZE, 18 * BLOCK_SIZE
    expect = np.concatenate([full.doc_ids[lo3:hi3], full.doc_ids[lo17:hi17]])
    assert np.array_equal(sel.doc_ids, expect)


def test_seek_equals_linear_scan():
    """seek(target) via skip list == linear scan (FIXTURES.md §4)."""
    rng = np.random.default_rng(5)
    docs, tfs, dls = _random_postings(rng, 20_000)
    blob, skip, _ = encode_postings(docs, tfs, dls)
    sk = decode_skip(skip)
    targets = rng.integers(0, int(docs[-1]) + 10, size=1000)
    for t in targets:
        # block containing first doc >= t
        bi = int(np.searchsorted(sk[:, 0], t))
        linear = docs[np.searchsorted(docs, t)] if t <= docs[-1] else None
        if bi >= len(sk):
            assert linear is None
            continue
        pl = decode_postings(blob, block_indices=np.array([bi]), skip=skip)
        got = pl.doc_ids[np.searchsorted(pl.doc_ids, t)]
        assert got == linear


def test_positions_roundtrip():
    rng = np.random.default_rng(3)
    n_docs = 500
    counts = rng.integers(1, 20, size=n_docs).astype(np.int64)
    per_doc = [np.sort(rng.choice(5000, size=c, replace=False)) for c in counts]
    flat = np.concatenate(per_doc)
    off, payload = encode_positions(flat, counts)
    sel = np.array([0, 7, 499, 250])
    got = decode_positions_for(off, payload, sel, counts[sel])
    for g, i in zip(got, sel):
        assert np.array_equal(g, per_doc[int(i)])
