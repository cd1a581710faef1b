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
