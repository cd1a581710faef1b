"""Vectorized Levenshtein / Damerau(OSA) filter over candidate terms.

Replaces the reference's parametric Levenshtein automaton intersection
([up] core/utils/levenshtein_utils.cpp + [up] core/search/
levenshtein_filter.cpp — which supports `with_transpositions`, the
Lucene-style restricted-transposition variant) with a numpy DP evaluated
for ALL candidates at once: candidates are length-prefiltered JVM-side,
then the banded DP runs as m vectorized passes over an (n_candidates,
L+1) matrix. The inner insertion chain dp[j] <= dp[j-1]+1 is closed with
a prefix-min transform (dp = j + cummin(partial - j)), keeping everything
loop-free along j.

Transposition semantics: OSA (optimal string alignment, "restricted
Damerau") — an adjacent transposition costs 1 but the transposed pair
cannot be edited again. This is the variant the reference's parametric
automaton implements; it equals full Damerau-Levenshtein for distances
<= 1 (the driver oracle pins d=1 because DuckDB's damerau_levenshtein is
the unrestricted Lowrance-Wagner metric, which diverges at d >= 2).
"""

from __future__ import annotations

import numpy as np


def _edit_leq_mask(
    query: str, cands: np.ndarray, max_d: int, transpositions: bool
) -> np.ndarray:
    n = len(cands)
    if n == 0:
        return np.zeros(0, dtype=bool)
    u = np.asarray(cands, dtype=np.str_)
    L = u.dtype.itemsize // 4
    chars = u.view(np.uint32).reshape(n, L)
    lens = (chars != 0).sum(axis=1)
    m = len(query)
    q = np.frombuffer(np.array(query, dtype=f"<U{max(m,1)}").tobytes(), dtype=np.uint32)[:m]

    big = np.int32(127)
    j_idx = np.arange(L + 1, dtype=np.int32)
    dp = np.broadcast_to(j_idx, (n, L + 1)).astype(np.int32)
    dp_prev2 = None  # row i-2, for the OSA transposition term
    for i in range(1, m + 1):
        cost = (chars != q[i - 1]).astype(np.int32)  # (n, L)
        partial = np.empty((n, L + 1), dtype=np.int32)
        partial[:, 0] = i
        # deletion (from above) and substitution/diag
        partial[:, 1:] = np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost)
        if transpositions and i >= 2:
            # OSA: dp[i][j] <= dp[i-2][j-2] + 1 when q[i-1]==c[j-2] and
            # q[i-2]==c[j-1] (adjacent pair swapped). Depends only on the
            # i-2 row, so it folds into `partial` before the prefix-min.
            swap = (chars[:, 1:] == q[i - 2]) & (chars[:, :-1] == q[i - 1])
            trans = np.where(swap, dp_prev2[:, :-2] + 1, big)
            partial[:, 2:] = np.minimum(partial[:, 2:], trans)
        dp_prev2 = dp
        # insertion chain closed by prefix-min of (partial[j'] - j') + j
        dp = j_idx + np.minimum.accumulate(partial - j_idx, axis=1)
        np.minimum(dp, big, out=dp)
    final = dp[np.arange(n), lens]
    return final <= max_d


def levenshtein_leq_mask(query: str, cands: np.ndarray, max_d: int) -> np.ndarray:
    """Boolean mask of candidates with edit distance <= max_d from query."""
    return _edit_leq_mask(query, cands, max_d, transpositions=False)


def damerau_leq_mask(query: str, cands: np.ndarray, max_d: int) -> np.ndarray:
    """Boolean mask of candidates with OSA (restricted-Damerau) distance
    <= max_d from query — the `with_transpositions=True` metric."""
    return _edit_leq_mask(query, cands, max_d, transpositions=True)
