"""Vectorized edit-distance kernels vs a reference DP (SURVEY.md F8,
mirroring [up] tests/search/levenshtein_filter_test.cpp's metric checks):
plain Levenshtein and the OSA/restricted-Damerau transposition variant.
"""

from __future__ import annotations

import numpy as np
import pytest

from iresearch_spark.oracle.model import levenshtein
from iresearch_spark.query.fuzzy import damerau_leq_mask, levenshtein_leq_mask

WORDS = [
    "", "a", "ab", "ba", "abc", "acb", "bac", "cab", "abcd", "acbd",
    "badc", "abdc", "table", "tble", "tbale", "tabel", "stable", "cable",
    "w12", "w21", "w120", "w210", "ca", "ac", "abcde", "baced",
]


@pytest.mark.parametrize("max_d", [0, 1, 2, 3])
def test_masks_match_reference_dp(max_d):
    cands = np.asarray(WORDS, dtype=np.str_)
    for q in WORDS:
        lev = levenshtein_leq_mask(q, cands, max_d)
        osa = damerau_leq_mask(q, cands, max_d)
        for i, c in enumerate(WORDS):
            assert lev[i] == (levenshtein(q, c, max_d) <= max_d), (q, c)
            assert osa[i] == (levenshtein(q, c, max_d, True) <= max_d), (q, c)


def test_osa_classics():
    # adjacent swap costs 1
    assert levenshtein("ab", "ba", 2, True) == 1
    assert levenshtein("ab", "ba", 2, False) == 2
    # OSA cannot edit the swapped pair again: "ca" -> "abc" is 3 (full
    # Damerau-Levenshtein would give 2 — the driver oracle therefore pins
    # max_distance=1 where both metrics agree)
    assert levenshtein("ca", "abc", 3, True) == 3
    # transpositions never increase the distance
    rng = np.random.default_rng(7)
    for _ in range(200):
        a = "".join(rng.choice(list("abcd"), rng.integers(0, 6)))
        b = "".join(rng.choice(list("abcd"), rng.integers(0, 6)))
        d_lev = levenshtein(a, b, 8, False)
        d_osa = levenshtein(a, b, 8, True)
        assert d_osa <= d_lev


def test_random_strings_vs_dp():
    rng = np.random.default_rng(123)
    pool = [
        "".join(rng.choice(list("abc"), rng.integers(1, 7))) for _ in range(80)
    ]
    cands = np.asarray(pool, dtype=np.str_)
    for q in pool[:20]:
        for d in (1, 2):
            got = damerau_leq_mask(q, cands, d)
            want = np.array(
                [levenshtein(q, c, d, True) <= d for c in pool], dtype=bool
            )
            assert (got == want).all(), (q, d)


def _piece_windows(q: str, d: int, osa: bool):
    """Python twin of executor._fuzzy_piece_cond: [(piece, lo0, hi0)] with
    0-based window bounds, or None when q is too short to split."""
    m = (2 * d + 1) if osa else (d + 1)
    if d == 0 or len(q) < m:
        return None
    base, extra = divmod(len(q), m)
    out, start = [], 0
    for i in range(m):
        ln = base + (1 if i < extra else 0)
        out.append((q[start : start + ln], max(0, start - d), start + d))
        start += ln
    return out


def _piece_pass(t: str, pieces) -> bool:
    for piece, lo0, hi0 in pieces:
        idx = t.find(piece, lo0)
        if idx != -1 and idx <= hi0:
            return True
    return False


@pytest.mark.parametrize("osa", [False, True])
def test_piece_prefilter_never_drops_a_match(osa):
    """The pigeonhole prefilter is sound: every term within edit distance
    d of q passes the piece condition (for OSA, 2d+1 pieces absorb the
    two-piece damage a boundary transposition can do)."""
    rng = np.random.default_rng(7)
    pool = [
        "".join(rng.choice(list("abcde"), rng.integers(1, 10)))
        for _ in range(300)
    ]
    queries = [
        "".join(rng.choice(list("abcde"), rng.integers(2, 9)))
        for _ in range(30)
    ] + ["abcd", "table", "merge"]
    for q in queries:
        for d in (1, 2):
            pieces = _piece_windows(q, d, osa)
            if pieces is None:
                continue
            for t in pool:
                if levenshtein(q, t, d, osa) <= d:
                    assert _piece_pass(t, pieces), (q, t, d, osa)


def test_piece_prefilter_transposition_boundary():
    """The d+1-piece split is provably unsound under OSA (one boundary
    transposition kills two pieces) — the 2d+1 split must still pass."""
    q, t, d = "abcd", "acbd", 1  # transpose the middle pair
    assert levenshtein(q, t, d, True) == 1
    # d+1 = 2 pieces 'ab'|'cd': neither occurs in 'acbd'
    assert not _piece_pass(t, [("ab", 0, 1), ("cd", 1, 3)])
    # 2d+1 = 3 pieces 'ab'|'c'|'d' -> 'd' occurs in-window
    assert _piece_pass(t, _piece_windows(q, d, True))
