"""A7 numeric token stream + the F5 granular-range trie decomposition.

The reference indexes a numeric value as a small series of terms at
decreasing precision ([up] core/analysis/token_streams.hpp ::
numeric_token_stream, Lucene-legacy numeric trie: the value's low bits are
shifted off in `step`-bit increments and each level is emitted as its own
term). `by_granular_range` then covers [lo, hi] with the FEWEST terms —
full-precision terms only at the ragged edges, coarser terms for the
aligned middle — so a range over a 10^12-doc corpus touches O(levels ·
2^step) dictionary terms instead of one term per distinct value
([up] core/search/granular_range_filter.cpp).

Term encoding (frozen; the DuckDB twin replicates it in SQL):
    level shift s ∈ {0, step, 2·step, … < 64}
    h = uint64(v) XOR 2^63              (sign-bit flip: h order == v order)
    term(s, v) = f"{s:02d}:{(h >> s):020d}"
Fixed-width zero-padded decimal keeps lexicographic order == numeric order
WITHIN a level, so each decomposed sub-range is one contiguous term-
dictionary scan (the same pushdown-friendly shape as by_range).
"""

from __future__ import annotations

import numpy as np

PRECISION_STEP_DEF = 16  # [up] numeric_token_stream's default step
_SIGN = 1 << 63
_U64 = (1 << 64) - 1


def parse_numeric_spec_typed(stage: str) -> tuple[int, str] | None:
    """`numeric[:<step>]` -> (step, "i64"); `numericd[:<step>]` ->
    (step, "f64") — the double variant maps values through the sortable
    bit pattern first ([up] numeric_token_stream::reset(double)). None
    for non-numeric stages."""
    for pfx, dtype in (("numericd", "f64"), ("numeric", "i64")):
        if stage == pfx:
            return PRECISION_STEP_DEF, dtype
        if stage.startswith(pfx + ":"):
            step = int(stage[len(pfx) + 1 :])
            if not 1 <= step <= 64:
                raise ValueError(f"numeric step out of range: {stage!r}")
            return step, dtype
    return None


def parse_numeric_spec(stage: str) -> int | None:
    """`numeric` / `numeric:<step_bits>` -> step, else None (i64 only)."""
    got = parse_numeric_spec_typed(stage)
    return got[0] if got is not None and got[1] == "i64" else None


def double_to_sortable(v: float) -> int:
    """Order-preserving float64 -> int64 (Lucene sortableDoubleBits):
    adjacent representable doubles map to CONSECUTIVE integers, so
    exclusive float bounds are exact +-1 in sortable space."""
    bits = int(np.float64(v).view(np.int64))
    return bits ^ ((bits >> 63) & 0x7FFFFFFFFFFFFFFF)


def doubles_to_sortable_batch(values: np.ndarray) -> np.ndarray:
    b = values.astype(np.float64).view(np.int64)
    return b ^ ((b >> 63) & np.int64(0x7FFFFFFFFFFFFFFF))


def shifts(step: int) -> list[int]:
    return list(range(0, 64, step))


def to_unsigned(v: int) -> int:
    """Order-preserving int64 -> uint64 (sign-bit flip)."""
    return (v & _U64) ^ _SIGN


def numeric_term(shift: int, h: int) -> str:
    """Level-`shift` term for the FULL unsigned value h."""
    return f"{shift:02d}:{h >> shift:020d}"


def numeric_terms(v: int, step: int) -> list[str]:
    h = to_unsigned(v)
    return [numeric_term(s, h) for s in shifts(step)]


def numeric_terms_batch(values: np.ndarray, step: int) -> np.ndarray:
    """Vectorized numeric_terms over an int64 array: object ndarray of
    shape (len(values) * n_levels,), row-major (all of row 0's levels,
    then row 1's, ...)."""
    h = values.astype(np.uint64) ^ np.uint64(_SIGN)
    ss = shifts(step)
    cols = []
    for s in ss:
        shifted = (h >> np.uint64(s)).astype("U20")
        dec = np.char.zfill(shifted, 20)
        cols.append(np.char.add(f"{s:02d}:", dec).astype(object))
    return np.stack(cols, axis=1).ravel() if len(values) else np.empty(
        0, dtype=object
    )


def split_range_u64(lo: int, hi: int, step: int) -> list[tuple[int, int, int]]:
    """Decompose inclusive unsigned [lo, hi] into per-level inclusive
    sub-ranges [(shift, lo >> shift, hi >> shift), ...] such that every
    value in [lo, hi] is covered by EXACTLY ONE sub-range (the Lucene
    NumericUtils.splitRange recursion the reference's granular filter
    mirrors). Empty list iff lo > hi."""
    if lo > hi:
        return []
    out: list[tuple[int, int, int]] = []
    shift = 0
    while True:
        diff = 1 << (shift + step)
        mask = ((1 << step) - 1) << shift
        has_lower = (lo & mask) != 0
        has_upper = (hi & mask) != mask
        next_lo = ((lo + diff) if has_lower else lo) & ~(diff - 1)
        next_hi = ((hi - diff) if has_upper else hi) & ~(diff - 1)
        if (
            shift + step >= 64
            or next_lo > next_hi
            or next_lo > _U64  # lower bound wrapped past the domain
            or next_hi < 0  # upper bound wrapped below zero
        ):
            out.append((shift, lo >> shift, hi >> shift))
            break
        if has_lower:
            out.append((shift, lo >> shift, (lo | mask) >> shift))
        if has_upper:
            out.append((shift, (hi & ~mask) >> shift, hi >> shift))
        lo, hi = next_lo, next_hi
        shift += step
    return out


def granular_term_ranges(
    lo: int | float | None,
    hi: int | float | None,
    step: int,
    *,
    include_lo: bool = True,
    include_hi: bool = False,
    dtype: str = "i64",
) -> list[tuple[str, str]]:
    """Inclusive TERM-string ranges [(term_lo, term_hi), ...] covering the
    signed range; each value in range matches exactly one covered term.
    None bounds are open. dtype "f64" maps float bounds through the
    sortable double pattern — consecutive in sortable space == adjacent
    representable doubles, so the +-1 exclusive adjustment stays exact."""
    if dtype == "f64":
        lo = None if lo is None else double_to_sortable(float(lo))
        hi = None if hi is None else double_to_sortable(float(hi))
    lo_v = -(1 << 63) if lo is None else int(lo) + (0 if include_lo else 1)
    hi_v = (1 << 63) - 1 if hi is None else int(hi) - (0 if include_hi else 1)
    if lo_v < -(1 << 63) or hi_v > (1 << 63) - 1:
        return []
    if lo_v > hi_v:
        return []
    ranges = split_range_u64(to_unsigned(lo_v), to_unsigned(hi_v), step)
    return [
        (f"{s:02d}:{a:020d}", f"{s:02d}:{b:020d}") for s, a, b in ranges
    ]
