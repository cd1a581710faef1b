"""Block-max pruned top-k kernels (SURVEY.md P1-P3, SC4).

Reproduces the reference's skip-list seek + block-max WAND machinery
([up] core/formats/skip_list.hpp, [up] core/search/disjunction.hpp wand
variants, Ding & Suel 2011) in a vectorized, batch-friendly shape:

* `TermPostings` — lazy per-(term, segment) accessor: nothing is decoded
  until asked; `lookup_tfs` decodes ONLY the 128-doc blocks that can
  contain the requested docs (the seek path — skip entries give block
  byte offsets, preceding blocks are never touched).

* `or_terms_topk` — static-θ two-phase Block-Max WAND variant:
    phase 0  fully score the single term with the highest upper bound;
             its k-th best score is the pruning threshold θ.
    phase 1  a block B of term t survives iff
             ub_t(B) + Σ_{t'≠t} gub_{t'} ≥ θ − ε  — any doc whose every
             term-block fails this cannot reach the top-k no matter how
             the other terms combine (each failing inequality already
             bounds the doc's total score below θ).
    phase 2  exact BM25 for surviving candidates; absent-term tfs come
             from seek-decoding exactly the needed blocks.
  The classic doc-at-a-time heap raises θ as it goes; the static-θ
  variant trades some pruning power for a loop-free numpy formulation —
  results are EXACTLY the unpruned top-k (ε = 1e-4 margin guards the
  6-dp score-rounding tie window).

* `and_terms` — cost-ordered conjunction ([up] core/search/
  conjunction.hpp): lead with the rarest term, seek-decode only the
  blocks of larger lists that overlap the shrinking candidate set.
"""

from __future__ import annotations

import numpy as np

from iresearch_spark.codec.postings import (
    decode_blockmax,
    decode_postings,
    decode_skip,
)

EPS = 1e-4


class TermPostings:
    """Lazy accessor over one (term, segment) posting row."""

    def __init__(self, blob: bytes, skip: bytes, bmax: bytes, df: int):
        self.blob = blob
        self.skip_bytes = skip
        self.df = int(df)
        self.skip = decode_skip(skip)  # (nb, 2): last_doc, byte offset
        self.bmax = decode_blockmax(bmax)  # (nb, 2): max_tf, min_dl
        self._full: tuple[np.ndarray, np.ndarray] | None = None

    # ---------------------------------------------------------- decode

    def full(self) -> tuple[np.ndarray, np.ndarray]:
        if self._full is None:
            pl = decode_postings(self.blob)
            self._full = (
                pl.doc_ids.astype(np.int64),
                pl.tfs.astype(np.float64),
            )
        return self._full

    def decode_blocks(self, bidx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Decode the given (sorted unique) block indices only."""
        if len(bidx) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if self._full is not None or len(bidx) == len(self.skip):
            docs, tfs = self.full()
            if len(bidx) == len(self.skip):
                return docs, tfs
            keep = np.isin((np.searchsorted(self.skip[:, 0], docs)), bidx)
            return docs[keep], tfs[keep]
        pl = decode_postings(self.blob, block_indices=bidx, skip=self.skip_bytes)
        return pl.doc_ids.astype(np.int64), pl.tfs.astype(np.float64)

    # ------------------------------------------------------------ seek

    def blocks_containing(self, docs: np.ndarray) -> np.ndarray:
        """Indices of blocks that could contain any of `docs` (sorted)."""
        bidx = np.searchsorted(self.skip[:, 0], docs)
        bidx = bidx[bidx < len(self.skip)]
        return np.unique(bidx)

    def lookup_tfs(self, cand: np.ndarray) -> np.ndarray:
        """tf for each candidate doc (0.0 where absent), decoding only the
        blocks the candidates could live in."""
        if len(cand) == 0:
            return np.empty(0, np.float64)
        docs, tfs = self.decode_blocks(self.blocks_containing(cand))
        if len(docs) == 0:
            return np.zeros(len(cand), np.float64)
        idx = np.searchsorted(docs, cand)
        idx_c = np.minimum(idx, len(docs) - 1)
        return np.where(docs[idx_c] == cand, tfs[idx_c], 0.0)


def _drop_masked(
    docs: np.ndarray, tfs: np.ndarray, mask: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray]:
    if mask is None or len(docs) == 0:
        return docs, tfs
    keep = ~np.isin(docs, mask, assume_unique=True)
    return docs[keep], tfs[keep]


def or_terms_topk(
    terms: list[tuple[float, TermPostings, np.ndarray, float]],
    k: int,
    tfn,
    mask: np.ndarray | None = None,
    score_round: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k of a weighted term disjunction with block-max pruning.

    `terms` is [(weight, reader, dls, avgdl)] with weight = boost · idf
    and dls/avgdl the term's FIELD norms (per-field statistics, as the
    reference's per-field norm columns); `tfn(tf_array, dl_array, avgdl)`
    is the BM25 tf-normalization; returns (docs, scores) of AT MOST k docs
    (unsorted).

    Weight-0 entries are F17's matched-but-unscored expansions: their docs
    match with score 0, below every positive score, so their lists are
    decoded ONLY when they could still make the top-k — fewer than k
    positive candidates exist, or the k-th kept (rounded) score is ≤ 0 so
    the 0-tier (doc asc) tie-break decides the tail. A huge capped-prefix
    tail therefore costs nothing once k positively-scored docs are
    found."""
    infos = []
    zero_readers = []
    for w, r, dls, avgdl in terms:
        if w < 0.0 or len(r.skip) == 0:
            continue
        if w == 0.0:
            zero_readers.append(r)
            continue
        ub_blocks = w * tfn(
            r.bmax[:, 0].astype(np.float64),
            r.bmax[:, 1].astype(np.float64),
            avgdl,
        )
        infos.append((w, r, dls, avgdl, ub_blocks, float(ub_blocks.max())))
    if not infos:
        # pure matched-unscored disjunction: every match scores 0 and the
        # exhaustive selection (score desc, doc asc) keeps the k smallest
        # doc ids
        if not zero_readers:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        parts = [r.full()[0] for r in zero_readers]
        cand = np.unique(np.concatenate(parts))
        if mask is not None and len(cand):
            cand = cand[~np.isin(cand, mask, assume_unique=True)]
        return cand[:k], np.zeros(min(len(cand), k), np.float64)
    total_gub = sum(i[5] for i in infos)

    # phase 0: θ from the highest-upper-bound term scored alone
    w0, r0, dls0, avgdl0, _, _ = max(infos, key=lambda i: i[5])
    d0, t0 = _drop_masked(*r0.full(), mask)
    s0 = (
        w0 * tfn(t0, dls0[d0 - 1], avgdl0)
        if len(d0)
        else np.empty(0, np.float64)
    )
    if len(s0) >= k:
        theta = float(np.partition(s0, len(s0) - k)[len(s0) - k])
    else:
        theta = -np.inf
    theta_eff = theta - EPS

    # phase 1: surviving blocks + candidate union
    cand_parts = []
    for w, r, _dls, _avgdl, ub_blocks, gub in infos:
        surv = np.flatnonzero(ub_blocks + (total_gub - gub) >= theta_eff)
        if len(surv):
            docs_b, _ = r.decode_blocks(surv)
            cand_parts.append(docs_b)
    if cand_parts:
        cand = np.unique(np.concatenate(cand_parts))
        if mask is not None and len(cand):
            cand = cand[~np.isin(cand, mask, assume_unique=True)]
    else:
        cand = np.empty(0, np.int64)

    # phase 2: exact scores (seek-decode whatever the candidates touch)
    score = np.zeros(len(cand), np.float64)
    for w, r, dls, avgdl, _ub, _g in infos:
        if len(cand) == 0:
            break
        tf = r.lookup_tfs(cand)
        nz = tf > 0
        if nz.any():
            score[nz] += w * tfn(tf[nz], dls[cand[nz] - 1], avgdl)
    # round BEFORE truncation so the kept k under ties match the
    # exhaustive path's (rounded score desc, doc asc) selection exactly
    if score_round is not None:
        score = np.round(score, score_round)

    # phase 3: matched-but-unscored fill. Zero-weight docs score exactly
    # 0, below every positive score — their lists are decoded ONLY when
    # they could still make the top-k: fewer than k positive candidates,
    # or the k-th kept (rounded) score is <= 0 so the 0-tier tie-break
    # (doc asc) decides the tail.
    if zero_readers and k > 0:
        kth = (
            float(np.partition(score, len(cand) - k)[len(cand) - k])
            if len(cand) >= k
            else None
        )
        if kth is None or kth <= 0.0:
            zparts = [r.full()[0] for r in zero_readers]
            zdocs = np.unique(np.concatenate(zparts))
            if mask is not None and len(zdocs):
                zdocs = zdocs[~np.isin(zdocs, mask, assume_unique=True)]
            if len(cand):
                zdocs = zdocs[~np.isin(zdocs, cand, assume_unique=True)]
            cand = np.concatenate([cand, zdocs])
            score = np.concatenate(
                [score, np.zeros(len(zdocs), np.float64)]
            )
    if len(cand) > k:
        sel = np.lexsort((cand, -score))[:k]
        return cand[sel], score[sel]
    return cand, score


def and_terms(
    terms: list[tuple[float, TermPostings, np.ndarray, float]],
    tfn,
    mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact weighted conjunction: lead with the rarest list, seek into the
    rest. `terms` entries carry their field's dls/avgdl like
    or_terms_topk. Returns (docs, summed scores) for ALL matching docs."""
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    order = sorted(terms, key=lambda t: t[1].df)
    w0, r0, _, _ = order[0]
    cand, tf0 = _drop_masked(*r0.full(), mask)
    if len(cand) == 0:
        return cand, np.empty(0, np.float64)
    tfs = [tf0]
    for _w, r, _dls, _avgdl in order[1:]:
        tf = r.lookup_tfs(cand)
        keep = tf > 0
        cand = cand[keep]
        tfs = [t[keep] for t in tfs]
        tfs.append(tf[keep])
        if len(cand) == 0:
            return cand, np.empty(0, np.float64)
    score = np.zeros(len(cand), np.float64)
    for (w, _r, dls, avgdl), tf in zip(order, tfs):
        score += w * tfn(tf, dls[cand - 1], avgdl)
    return cand, score
