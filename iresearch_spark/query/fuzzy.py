"""Vectorized Levenshtein filter over candidate dictionary terms.

Replaces the reference's parametric Levenshtein automaton intersection
([up] core/utils/levenshtein_utils.cpp + [up] core/search/
levenshtein_filter.cpp) with a numpy DP evaluated for ALL candidates at
once: candidates are length-prefiltered JVM-side, then the banded DP runs
as m vectorized passes over an (n_candidates, L+1) matrix. The inner
insertion chain dp[j] <= dp[j-1]+1 is closed with a prefix-min transform
(dp = j + cummin(partial - j)), keeping everything loop-free along j.
"""

from __future__ import annotations

import numpy as np


def levenshtein_leq_mask(query: str, cands: np.ndarray, max_d: int) -> np.ndarray:
    """Boolean mask of candidates with edit distance <= max_d from query."""
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
    for i in range(1, m + 1):
        cost = (chars != q[i - 1]).astype(np.int32)  # (n, L)
        partial = np.empty((n, L + 1), dtype=np.int32)
        partial[:, 0] = i
        # deletion (from above) and substitution/diag
        partial[:, 1:] = np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost)
        # insertion chain closed by prefix-min of (partial[j'] - j') + j
        dp = j_idx + np.minimum.accumulate(partial - j_idx, axis=1)
        np.minimum(dp, big, out=dp)
    final = dp[np.arange(n), lens]
    return final <= max_d
