"""Block-max pruned top-k kernels (SURVEY.md P1-P3, SC4).

Reproduces the reference's skip-list seek + block-max WAND machinery
([up] core/formats/skip_list.hpp, [up] core/search/disjunction.hpp wand
variants, Ding & Suel 2011) in a vectorized, batch-friendly shape:

* `TermPostings` — lazy per-(term, segment) accessor: nothing is decoded
  until asked; `lookup_tfs` decodes ONLY the 128-doc blocks that can
  contain the requested docs (the seek path — skip entries give block
  byte offsets, preceding blocks are never touched).

* `or_terms_topk` — dynamic-θ Block-Max WAND with iterated threshold
  tightening (the batch-friendly analogue of the doc-at-a-time heap's
  rising θ):
    Every (term, block) pair gets the score upper bound
    sb_t(B) = ub_t(B) + Σ_{t'≠t} gub_{t'} — a doc living ONLY in blocks
    whose sb is below θ cannot reach the top-k however its terms combine.
    Blocks are processed in DESCENDING sb order in geometrically growing
    chunks; each round decodes the chunk's blocks, scores the new
    candidate docs exactly (seek-decoding absent-term tfs), and tightens
    θ to the k-th best exact score so far. On top of the per-block cut,
    the MAXSCORE essential-list split (Turtle & Flood; Block-Max-Maxscore
    hybrid) drops WHOLE TERMS from candidate generation: terms whose
    ascending global upper bounds sum below θ are non-essential — a doc
    living only in them cannot reach the top-k, so their (possibly huge)
    lists are only seek-probed to score candidates found in essential
    lists. θ only rises, so both cuts are monotone-safe: a block or term
    skipped at any round (bound < θ_round − ε ≤ θ_final − ε) stays
    skippable — results are EXACTLY the unpruned top-k (ε = 1e-4 margin
    guards the 6-dp score-rounding tie window). Because the highest-sb
    blocks are scored first, θ converges near its final value within the
    first rounds and long posting tails are never decoded — the property
    the classic BMW heap buys with per-doc pivoting, recovered here in
    O(log n_blocks) vectorized rounds.
  `_or_topk_static` keeps the previous static-θ two-phase variant
  (θ bootstrapped by fully scoring the best single term, one global
  block filter) as the measurement baseline for the pruning-rate bench
  (scripts/wand_pruning.py).

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

# bench-only instrumentation (scripts/wand_pruning.py): when set to a
# list, every TermPostings created in this process registers itself so a
# driver-side kernel run can read back per-reader decode counters.  None
# in production — the branch in __init__ costs one comparison per reader.
INSTRUMENT: list | None = None


class TermPostings:
    """Lazy accessor over one (term, segment) posting row."""

    def __init__(self, blob: bytes, skip: bytes, bmax: bytes, df: int):
        self.blob = blob
        self.skip_bytes = skip
        self.df = int(df)
        self.skip = decode_skip(skip)  # (nb, 2): last_doc, byte offset
        self.bmax = decode_blockmax(bmax)  # (nb, 2): max_tf, min_dl
        self._full: tuple[np.ndarray, np.ndarray] | None = None
        # per-block decode cache: the dynamic-θ loop revisits lists across
        # rounds, and candidate seek-scoring touches blocks phase-1 already
        # decoded — each 128-block is decompressed at most once
        self._blocks: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        # instrumentation for the pruning-rate bench (scripts/wand_pruning):
        # set of block indices ever decompressed
        self.decoded: set[int] = set()
        if INSTRUMENT is not None:
            INSTRUMENT.append(self)

    @property
    def n_blocks(self) -> int:
        return len(self.skip)

    # ---------------------------------------------------------- decode

    def full(self) -> tuple[np.ndarray, np.ndarray]:
        if self._full is None:
            pl = decode_postings(self.blob)
            self._full = (
                pl.doc_ids.astype(np.int64),
                pl.tfs.astype(np.float64),
            )
            self.decoded.update(range(len(self.skip)))
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
        need = np.array(
            [b for b in np.asarray(bidx).tolist() if b not in self._blocks],
            dtype=np.int64,
        )
        if len(need):
            pl = decode_postings(
                self.blob, block_indices=need, skip=self.skip_bytes
            )
            docs = pl.doc_ids.astype(np.int64)
            tfs = pl.tfs.astype(np.float64)
            owner = np.searchsorted(self.skip[:, 0], docs)
            for b in need.tolist():
                m = owner == b
                self._blocks[b] = (docs[m], tfs[m])
                self.decoded.add(b)
        parts = [self._blocks[b] for b in np.asarray(bidx).tolist()]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )

    # ------------------------------------------------------------ seek

    def blocks_containing(self, docs: np.ndarray) -> np.ndarray:
        """Indices of blocks that could contain any of `docs` (sorted)."""
        bidx = np.searchsorted(self.skip[:, 0], docs)
        bidx = bidx[bidx < len(self.skip)]
        return np.unique(bidx)

    def seek_entries(
        self, cand: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(present_mask, ordinals, tfs) for sorted-unique candidate docs,
        decoding ONLY the touched blocks. Ordinals index the FULL posting
        order — valid because every non-final block holds exactly
        BLOCK_SIZE docs, so ordinal = block·BLOCK_SIZE + in-block offset.
        This is what lets the positional kernels address the per-doc
        position-offsets blob without decompressing the whole list."""
        from iresearch_spark import BLOCK_SIZE

        if len(cand) == 0:
            z = np.empty(0, np.int64)
            return np.zeros(0, bool), z, z.copy()
        docs, tfs = self.decode_blocks(self.blocks_containing(cand))
        if len(docs) == 0:
            z = np.empty(0, np.int64)
            return np.zeros(len(cand), bool), z, z.copy()
        owner = np.searchsorted(self.skip[:, 0], docs)
        # in-block offset: index minus the first index of the doc's block run
        change = np.flatnonzero(np.diff(owner)) + 1
        first = np.concatenate(([0], change))
        run_lens = np.diff(np.concatenate((first, [len(owner)])))
        run_start = np.repeat(first, run_lens)
        ordinals = owner.astype(np.int64) * BLOCK_SIZE + (
            np.arange(len(docs), dtype=np.int64) - run_start
        )
        idx = np.searchsorted(docs, cand)
        idx_c = np.minimum(idx, len(docs) - 1)
        present = docs[idx_c] == cand
        sel = idx_c[present]
        return present, ordinals[sel], tfs[sel].astype(np.int64)

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


def _prep_terms(terms, tfn):
    """Split entries into scored infos (with per-block upper bounds) and
    F17 matched-but-unscored readers."""
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
    return infos, zero_readers


def _zero_only_topk(zero_readers, k, mask):
    """Pure matched-unscored disjunction: every match scores 0 and the
    exhaustive (score desc, doc asc) selection keeps the k smallest ids."""
    if not zero_readers:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    parts = [r.full()[0] for r in zero_readers]
    cand = np.unique(np.concatenate(parts))
    if mask is not None and len(cand):
        cand = cand[~np.isin(cand, mask, assume_unique=True)]
    return cand[:k], np.zeros(min(len(cand), k), np.float64)


def _score_candidates(infos, cand, tfn):
    """Exact additive scores for sorted-unique candidate docs; absent-term
    tfs come from seek-decoding exactly the blocks the candidates touch."""
    score = np.zeros(len(cand), np.float64)
    for w, r, dls, avgdl, _ub, _g in infos:
        if len(cand) == 0:
            break
        tf = r.lookup_tfs(cand)
        nz = tf > 0
        if nz.any():
            score[nz] += w * tfn(tf[nz], dls[cand[nz] - 1], avgdl)
    return score


def _zero_fill_and_select(cand, score, zero_readers, k, mask):
    """Phase 3 + final selection: zero-weight docs score exactly 0, below
    every positive score — their lists are decoded ONLY when they could
    still make the top-k (fewer than k positive candidates, or the k-th
    kept rounded score is <= 0 so the 0-tier doc-asc tie-break decides)."""
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
                zdocs = zdocs[~np.isin(zdocs, np.sort(cand))]
            cand = np.concatenate([cand, zdocs])
            score = np.concatenate(
                [score, np.zeros(len(zdocs), np.float64)]
            )
    if len(cand) > k:
        sel = np.lexsort((cand, -score))[:k]
        return cand[sel], score[sel]
    return cand, score


def or_terms_topk(
    terms: list[tuple[float, TermPostings, np.ndarray, float]],
    k: int,
    tfn,
    mask: np.ndarray | None = None,
    score_round: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k of a weighted term disjunction with dynamic-θ block-max
    pruning (iterated threshold tightening — see module docstring).

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
    infos, zero_readers = _prep_terms(terms, tfn)
    if not infos:
        return _zero_only_topk(zero_readers, k, mask)
    total_gub = sum(i[5] for i in infos)

    # flatten every (term, block) with its score upper bound
    # sb_t(B) = ub_t(B) + Σ_{t'≠t} gub_{t'}
    t_parts, b_parts, sb_parts = [], [], []
    for ti, (_w, _r, _dls, _avgdl, ub_blocks, gub) in enumerate(infos):
        nb = len(ub_blocks)
        t_parts.append(np.full(nb, ti, np.int64))
        b_parts.append(np.arange(nb, dtype=np.int64))
        sb_parts.append(ub_blocks + (total_gub - gub))
    t_arr = np.concatenate(t_parts)
    b_arr = np.concatenate(b_parts)
    sb_arr = np.concatenate(sb_parts)
    order = np.argsort(-sb_arr, kind="stable")
    sb_desc = sb_arr[order]
    n = len(order)

    # MAXSCORE essential-list split (Turtle & Flood; the Block-Max-
    # Maxscore hybrid): once θ is known, the terms with the SMALLEST
    # global upper bounds whose bounds sum below θ − ε are non-essential —
    # a doc appearing ONLY in them scores at most that sum, so candidates
    # need only come from essential lists; non-essential lists are still
    # seek-probed for exact scoring of candidates found elsewhere. θ only
    # rises, so the essential set only SHRINKS and a skipped block stays
    # skippable.
    gubs = np.array([i[5] for i in infos])
    gub_order = np.argsort(gubs, kind="stable")
    gub_csum = np.cumsum(gubs[gub_order])

    def essential_mask(th: float) -> np.ndarray:
        ess = np.ones(len(infos), bool)
        if th != -np.inf:
            ne = gub_order[gub_csum < th - EPS]
            ess[ne] = False
        return ess

    cand = np.empty(0, np.int64)
    score = np.empty(0, np.float64)  # unrounded, parallel to cand
    theta = -np.inf
    pos = 0
    # bootstrap chunk: a couple of blocks per scored term reaches ~k
    # candidates fast; geometric growth bounds rounds to O(log n_blocks)
    chunk = max(4, 2 * len(infos), (k + 127) // 128)
    while pos < n:
        # blocks at or past `end` can never hold a top-k doc under the
        # CURRENT θ; θ only rises, so the cut is final once reached
        end = (
            n
            if theta == -np.inf
            else int(np.searchsorted(-sb_desc, -(theta - EPS), side="right"))
        )
        if pos >= end:
            break
        take = order[pos : min(pos + chunk, end)]
        pos = min(pos + chunk, end)
        chunk *= 2
        # drop blocks of currently non-essential terms (permanently safe:
        # non-essential only grows as θ rises)
        ess = essential_mask(theta)
        take = take[ess[t_arr[take]]]
        if not len(take):
            continue
        # decode this round's blocks grouped per term
        parts = []
        take_t = t_arr[take]
        for ti in np.unique(take_t):
            bidx = np.sort(b_arr[take[take_t == ti]])
            docs_b, _ = infos[ti][1].decode_blocks(bidx)
            if len(docs_b):
                parts.append(docs_b)
        if not parts:
            continue
        new = np.unique(np.concatenate(parts))
        if mask is not None and len(new):
            new = new[~np.isin(new, mask, assume_unique=True)]
        if len(cand) and len(new):
            new = new[~np.isin(new, np.sort(cand))]
        if not len(new):
            continue
        # MAXSCORE partial-scoring cutoff: score the essential lists
        # first; a candidate whose partial score plus the SUM of the
        # non-essential global bounds cannot reach θ is provably outside
        # the top-k, so it is discarded WITHOUT probing the (possibly
        # huge) non-essential lists — the probe cost collapses from
        # |candidates| to |near-top candidates|.
        es_idx = np.flatnonzero(ess)
        ne_idx = np.flatnonzero(~ess)
        s_new = _score_candidates([infos[i] for i in es_idx], new, tfn)
        if len(ne_idx):
            ne_sum = float(gubs[ne_idx].sum())
            if theta != -np.inf:
                keep = s_new + ne_sum >= theta - EPS
                new, s_new = new[keep], s_new[keep]
            if len(new):
                s_new = s_new + _score_candidates(
                    [infos[i] for i in ne_idx], new, tfn
                )
        if not len(new):
            continue
        cand = np.concatenate([cand, new])
        score = np.concatenate([score, s_new])
        if len(score) >= k:
            theta = float(np.partition(score, len(score) - k)[len(score) - k])

    # round BEFORE truncation so the kept k under ties match the
    # exhaustive path's (rounded score desc, doc asc) selection exactly
    if score_round is not None:
        score = np.round(score, score_round)
    return _zero_fill_and_select(cand, score, zero_readers, k, mask)


def _or_topk_static(
    terms: list[tuple[float, TermPostings, np.ndarray, float]],
    k: int,
    tfn,
    mask: np.ndarray | None = None,
    score_round: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """The previous static-θ two-phase variant, kept as the measurement
    baseline for the pruning-rate bench: θ is bootstrapped by fully
    scoring the single highest-upper-bound term, then every term's blocks
    are filtered ONCE against that fixed θ. Exact like the dynamic
    variant, but prunes strictly less (θ never tightens)."""
    infos, zero_readers = _prep_terms(terms, tfn)
    if not infos:
        return _zero_only_topk(zero_readers, k, mask)
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
    score = _score_candidates(infos, cand, tfn)
    if score_round is not None:
        score = np.round(score, score_round)
    return _zero_fill_and_select(cand, score, zero_readers, k, mask)


def _score_groups(ginfos, cand, tfn):
    """Exact additive scores of conjunction groups over sorted-unique
    candidate docs.  Each group contributes Σ w·tfn only to docs where
    EVERY member is present; members are probed rarest-first so hot
    members seek-decode only the blocks the survivors touch.  Returns
    (score, matched): matched marks docs where at least one group's
    conjunction holds — needed because, unlike the pure-term disjunction,
    presence in a lead list does not imply a match, and a zero-weight
    group's matches legitimately score 0."""
    score = np.zeros(len(cand), np.float64)
    matched = np.zeros(len(cand), bool)
    for members_orig, members_df, _lead, _ub, _g in ginfos:
        alive = np.arange(len(cand))
        # presence pass rarest-first: hot members seek only blocks the
        # shrinking survivor set touches
        for _w, r, _dls, _avgdl in members_df:
            if len(alive) == 0:
                break
            alive = alive[r.lookup_tfs(cand[alive]) > 0]
        if len(alive) == 0:
            continue
        # scoring pass in ORIGINAL member order so float accumulation
        # associates exactly like the exhaustive And evaluation (the
        # decoded blocks are cached, so these lookups re-decode nothing)
        sub = cand[alive]
        gsc = np.zeros(len(sub), np.float64)
        for w, r, dls, avgdl in members_orig:
            if w > 0.0:
                gsc += w * tfn(r.lookup_tfs(sub), dls[sub - 1], avgdl)
        score[alive] += gsc
        matched[alive] = True
    return score, matched


def or_groups_topk(
    groups: list[list[tuple[float, TermPostings, np.ndarray, float]]],
    k: int,
    tfn,
    mask: np.ndarray | None = None,
    score_round: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k of a min_match=1 disjunction of CONJUNCTION GROUPS
    with dynamic-θ block-max pruning — the one-boolean-level extension of
    `or_terms_topk` ([up] core/search/boolean_filter.cpp composes
    disjunction-over-conjunction the same way; bound propagation follows
    the Block-Max-Maxscore recipe applied to each group as a virtual
    posting list).

    Each group is [(weight, reader, dls, avgdl), ...] whose terms must
    ALL be present for the group to contribute (singleton groups = plain
    disjuncts, recovering `or_terms_topk` semantics; a doc matching
    several groups sums their contributions, matching the exhaustive Or
    evaluation).

    Virtual-list bounds: a group's candidate generator is its RAREST
    member (any group match must appear in every member, so the rarest
    list covers the group).  For that lead's block B the group's score is
    at most ub_lead(B) + Σ_{other members} gub — tfn is monotone
    increasing in tf and decreasing in dl, so per-block (max_tf, min_dl)
    metadata bounds the lead's contribution exactly as in `_prep_terms`.
    Adding Σ_{other groups} gub yields the total-score bound sb_g(B);
    blocks are processed in descending sb with iterated θ tightening and
    a MAXSCORE essential-group split, both monotone-safe because sb is
    static and θ only rises.  Results are EXACTLY the unpruned top-k
    under the (rounded score desc, doc asc) selection."""
    # (members_orig, members_df_asc, lead_reader, lead_ub_blocks, gub)
    ginfos = []
    for g in groups:
        members = []
        for w, r, dls, avgdl in g:
            if r is None or len(r.skip) == 0:
                members = None  # an absent member empties the conjunction
                break
            members.append((w, r, dls, avgdl))
        if not members:
            continue
        members_orig = list(members)
        members.sort(key=lambda m: m[1].df)
        gub = 0.0
        for w, r, dls, avgdl in members:
            if w > 0.0:
                ub = w * tfn(
                    r.bmax[:, 0].astype(np.float64),
                    r.bmax[:, 1].astype(np.float64),
                    avgdl,
                )
                gub += float(ub.max())
        wl, rl, dlsl, avgdll = members[0]
        if wl > 0.0:
            lead_ub = wl * tfn(
                rl.bmax[:, 0].astype(np.float64),
                rl.bmax[:, 1].astype(np.float64),
                avgdll,
            )
            rest = gub - float(lead_ub.max())
            ub_blocks = lead_ub + rest
        else:
            ub_blocks = np.full(len(rl.skip), gub, np.float64)
        ginfos.append((members_orig, members, rl, ub_blocks, gub))
    if not ginfos:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    total_gub = sum(gi[4] for gi in ginfos)

    # flatten every (group, lead-block) with its total-score upper bound
    t_parts, b_parts, sb_parts = [], [], []
    for gi, (_mo, _m, rl, ub_blocks, gub) in enumerate(ginfos):
        nb = len(ub_blocks)
        t_parts.append(np.full(nb, gi, np.int64))
        b_parts.append(np.arange(nb, dtype=np.int64))
        sb_parts.append(ub_blocks + (total_gub - gub))
    t_arr = np.concatenate(t_parts)
    b_arr = np.concatenate(b_parts)
    sb_arr = np.concatenate(sb_parts)
    order = np.argsort(-sb_arr, kind="stable")
    sb_desc = sb_arr[order]
    n = len(order)

    gubs = np.array([gi[4] for gi in ginfos])
    gub_order = np.argsort(gubs, kind="stable")
    gub_csum = np.cumsum(gubs[gub_order])

    def essential_mask(th: float) -> np.ndarray:
        ess = np.ones(len(ginfos), bool)
        if th != -np.inf:
            ne = gub_order[gub_csum < th - EPS]
            ess[ne] = False
        return ess

    cand = np.empty(0, np.int64)
    score = np.empty(0, np.float64)
    theta = -np.inf
    pos = 0
    chunk = max(4, 2 * len(ginfos), (k + 127) // 128)
    while pos < n:
        end = (
            n
            if theta == -np.inf
            else int(np.searchsorted(-sb_desc, -(theta - EPS), side="right"))
        )
        if pos >= end:
            break
        take = order[pos : min(pos + chunk, end)]
        pos = min(pos + chunk, end)
        chunk *= 2
        ess = essential_mask(theta)
        take = take[ess[t_arr[take]]]
        if not len(take):
            continue
        parts = []
        take_t = t_arr[take]
        for gi in np.unique(take_t):
            bidx = np.sort(b_arr[take[take_t == gi]])
            docs_b, _ = ginfos[gi][2].decode_blocks(bidx)
            if len(docs_b):
                parts.append(docs_b)
        if not parts:
            continue
        new = np.unique(np.concatenate(parts))
        if mask is not None and len(new):
            new = new[~np.isin(new, mask, assume_unique=True)]
        if len(cand) and len(new):
            new = new[~np.isin(new, np.sort(cand))]
        if not len(new):
            continue
        es_idx = np.flatnonzero(ess)
        ne_idx = np.flatnonzero(~ess)
        s_new, m_new = _score_groups([ginfos[i] for i in es_idx], new, tfn)
        if len(ne_idx):
            # MAXSCORE cutoff on the essential partial score, then ONE
            # full re-score over ALL groups in original order — summing
            # essential and non-essential parts separately would change
            # the float association order vs the exhaustive evaluation
            # (the re-probe is cheap: every touched block is cached)
            ne_sum = float(gubs[ne_idx].sum())
            if theta != -np.inf:
                keep = s_new + ne_sum >= theta - EPS
                new = new[keep]
            if len(new):
                s_new, m_new = _score_groups(ginfos, new, tfn)
            else:
                s_new = np.empty(0, np.float64)
                m_new = np.empty(0, bool)
        # candidates that match NO group are not hits at all (presence in
        # a lead list does not imply the conjunction holds) — drop them
        # so they neither enter θ nor the final selection; matched docs
        # are kept even at score 0 (all-zero-weight groups).
        new, s_new = new[m_new], s_new[m_new]
        if not len(new):
            continue
        cand = np.concatenate([cand, new])
        score = np.concatenate([score, s_new])
        if len(score) >= k:
            theta = float(np.partition(score, len(score) - k)[len(score) - k])

    if score_round is not None:
        score = np.round(score, score_round)
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
