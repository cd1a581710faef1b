"""Block-max WAND / seek-conjunction kernels vs brute force — randomized,
pure numpy (mirrors [up] tests/search/ exact-ordering style, plus the
formats seek tests of [up] tests/formats/formats_test_case_base.hpp)."""

from __future__ import annotations

import numpy as np
import pytest

from iresearch_spark import BM25_B, BM25_K1
from iresearch_spark.codec.postings import encode_postings
from iresearch_spark.query.wand import (
    TermPostings,
    _or_topk_static,
    and_terms,
    or_terms_topk,
)


def _mk_reader(rng, n_docs, df) -> tuple[TermPostings, np.ndarray, np.ndarray]:
    docs = np.sort(rng.choice(np.arange(1, n_docs + 1), size=df, replace=False))
    tfs = rng.integers(1, 8, size=df)
    return docs, tfs


def _build(docs, tfs, dls):
    blob, skip, bmax = encode_postings(
        docs.astype("<u4"), tfs.astype("<u4"), dls[docs - 1].astype("<u4")
    )
    return TermPostings(blob, skip, bmax, len(docs))


def _tfn():
    def tfn(tf, dl, avgdl):
        return (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        )

    return tfn


@pytest.mark.parametrize("kern", [or_terms_topk, _or_topk_static])
@pytest.mark.parametrize("seed", range(8))
def test_or_topk_matches_bruteforce(seed, kern):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(200, 2000))
    dls = rng.integers(5, 400, size=n_docs).astype(np.float64)
    avgdl = float(dls.mean())
    tfn = _tfn()
    n_terms = int(rng.integers(2, 6))
    k = int(rng.integers(1, 25))
    mask = (
        np.sort(rng.choice(np.arange(1, n_docs + 1), size=n_docs // 10, replace=False))
        if seed % 2
        else None
    )
    pairs, brute = [], {}
    for _ in range(n_terms):
        df = int(rng.integers(1, n_docs))
        docs, tfs = _mk_reader(rng, n_docs, df)
        w = float(rng.uniform(0.1, 3.0))
        pairs.append((w, _build(docs, tfs, dls), dls, avgdl))
        for d, tf in zip(docs, tfs):
            if mask is not None and d in mask:
                continue
            brute[d] = brute.get(d, 0.0) + w * tfn(float(tf), dls[d - 1], avgdl)

    got_docs, got_scores = kern(pairs, k, tfn, mask=mask, score_round=6)
    expect = sorted(brute.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    got = sorted(zip(got_docs, got_scores), key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (gd, gs), (ed, es) in zip(got, expect):
        assert abs(gs - round(es, 6)) < 1e-9, (gd, ed)


@pytest.mark.parametrize("seed", range(6))
def test_and_matches_bruteforce(seed):
    rng = np.random.default_rng([seed, 99])
    n_docs = int(rng.integers(200, 1500))
    dls = rng.integers(5, 400, size=n_docs).astype(np.float64)
    avgdl = float(dls.mean())
    tfn = _tfn()
    readers, sets, weights, tfmaps = [], [], [], []
    for _ in range(int(rng.integers(2, 5))):
        df = int(rng.integers(n_docs // 3, n_docs))
        docs, tfs = _mk_reader(rng, n_docs, df)
        w = float(rng.uniform(0.1, 3.0))
        readers.append((w, _build(docs, tfs, dls), dls, avgdl))
        sets.append(set(docs.tolist()))
        weights.append(w)
        tfmaps.append(dict(zip(docs.tolist(), tfs.tolist())))
    common = sorted(set.intersection(*sets))
    got_docs, got_scores = and_terms(readers, tfn)
    order = np.argsort(got_docs)
    assert got_docs[order].tolist() == common
    for d, s in zip(got_docs[order], got_scores[order]):
        expect = sum(
            w * tfn(float(tm[int(d)]), dls[int(d) - 1], avgdl)
            for w, tm in zip(weights, tfmaps)
        )
        assert abs(s - expect) < 1e-9


def test_seek_decodes_only_needed_blocks():
    """lookup_tfs must not decode the whole list (the P1 seek invariant)."""
    rng = np.random.default_rng(7)
    n_docs = 100_000
    dls = np.full(n_docs, 50.0)
    docs = np.arange(1, n_docs + 1, 2, dtype=np.int64)  # df = 50k, many blocks
    tfs = rng.integers(1, 5, size=len(docs))
    r = _build(docs, tfs, dls)
    cand = np.array([1, 3, 99_999], dtype=np.int64)
    tf = r.lookup_tfs(cand)
    assert tf[0] == tfs[0] and tf[1] == tfs[1] and tf[2] == tfs[-1]
    assert r._full is None, "seek path must not fully decode"
    # absent docs -> 0
    assert r.lookup_tfs(np.array([2, 4]))[0] == 0.0

@pytest.mark.parametrize("kern", [or_terms_topk, _or_topk_static])
@pytest.mark.parametrize("seed", range(8))
def test_or_topk_with_zero_weight_members(seed, kern):
    """F17 matched-but-unscored members through the WAND fast path: docs
    matching only weight-0 terms surface with score 0 exactly when the
    brute-force (score desc, doc asc) selection keeps them."""
    rng = np.random.default_rng([seed, 17])
    n_docs = int(rng.integers(100, 1200))
    dls = rng.integers(5, 400, size=n_docs).astype(np.float64)
    avgdl = float(dls.mean())
    tfn = _tfn()
    # few scored terms (sometimes none) + several unscored expansions
    n_pos = int(rng.integers(0, 3))
    n_zero = int(rng.integers(1, 4))
    k = int(rng.integers(1, 30))
    mask = (
        np.sort(
            rng.choice(np.arange(1, n_docs + 1), size=n_docs // 10, replace=False)
        )
        if seed % 2
        else None
    )
    pairs, brute = [], {}
    for i in range(n_pos + n_zero):
        df = int(rng.integers(1, n_docs))
        docs, tfs = _mk_reader(rng, n_docs, df)
        w = float(rng.uniform(0.1, 3.0)) if i < n_pos else 0.0
        pairs.append((w, _build(docs, tfs, dls), dls, avgdl))
        for d, tf in zip(docs, tfs):
            if mask is not None and d in mask:
                continue
            brute[d] = brute.get(d, 0.0) + w * tfn(float(tf), dls[d - 1], avgdl)

    got_docs, got_scores = kern(pairs, k, tfn, mask=mask, score_round=6)
    expect = sorted(brute.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    got = sorted(zip(got_docs, got_scores), key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in got] == [d for d, _ in expect], (n_pos, n_zero, k)
    for (gd, gs), (_ed, es) in zip(got, expect):
        assert abs(gs - round(es, 6)) < 1e-9, gd


def test_zero_weight_lists_not_decoded_when_k_scored_exist():
    """The point of the fast path: once k positively-scored docs exist the
    unscored expansion's postings are never touched."""
    dls = np.full(10_000, 50.0)
    avgdl = 50.0
    tfn = _tfn()
    docs_pos = np.arange(1, 5001, dtype=np.int64)
    tfs_pos = np.full(5000, 3, dtype=np.int64)
    r_pos = _build(docs_pos, tfs_pos, dls)
    docs_zero = np.arange(5001, 10001, dtype=np.int64)
    r_zero = _build(docs_zero, np.ones(5000, dtype=np.int64), dls)

    def boom(*_a, **_k):  # any decode attempt is a fast-path violation
        raise AssertionError("unscored list decoded")

    r_zero.full = boom
    r_zero.decode_blocks = boom
    got_docs, got_scores = or_terms_topk(
        [(1.5, r_pos, dls, avgdl), (0.0, r_zero, dls, avgdl)],
        10,
        tfn,
        score_round=6,
    )
    assert len(got_docs) == 10 and (got_scores > 0).all()


def test_zero_weight_fill_when_few_scored_docs():
    """Regression: a positive term matching FEWER than k docs must not
    suppress the matched-but-unscored tail — the remaining slots are
    filled with the smallest zero-weight doc ids at score 0, exactly the
    exhaustive (score desc, doc asc) selection."""
    dls = np.full(1000, 50.0)
    avgdl = 50.0
    tfn = _tfn()
    docs_pos = np.array([7, 12, 400], dtype=np.int64)
    r_pos = _build(docs_pos, np.full(3, 2, dtype=np.int64), dls)
    docs_zero = np.arange(100, 160, dtype=np.int64)
    r_zero = _build(docs_zero, np.ones(60, dtype=np.int64), dls)
    got_docs, got_scores = or_terms_topk(
        [(1.5, r_pos, dls, avgdl), (0.0, r_zero, dls, avgdl)],
        10,
        tfn,
        score_round=6,
    )
    order = np.lexsort((got_docs, -got_scores))
    got = list(zip(got_docs[order], got_scores[order]))
    assert [d for d, _ in got[:3]] == [7, 12, 400]
    assert all(s > 0 for _, s in got[:3])
    # remaining 7 slots: smallest zero-weight docs at score 0
    assert [d for d, _ in got[3:]] == list(range(100, 107))
    assert all(s == 0.0 for _, s in got[3:])


def _fresh(pairs):
    """Rebuild readers so decode instrumentation starts clean."""
    return [
        (w, TermPostings(r.blob, r.skip_bytes, b"", r.df), dls, avgdl)
        for (w, r, dls, avgdl) in pairs
    ]


def test_dynamic_theta_prunes_more_than_static():
    """The point of iterated θ tightening: on a long-tail workload (one
    hot term with flat tf + a small high-scoring term) the dynamic kernel
    must decode STRICTLY fewer blocks than the static baseline, with
    identical results."""
    rng = np.random.default_rng(42)
    n_docs = 200_000
    dls = np.full(n_docs, 50.0)
    avgdl = 50.0
    tfn = _tfn()
    # hot term: df 100k (782 blocks), tf=1 everywhere -> low, flat bounds;
    # once θ is known it is MAXSCORE-non-essential and never generates
    # candidates
    hot_docs = np.arange(1, n_docs + 1, 2, dtype=np.int64)
    hot_tfs = np.ones(len(hot_docs), dtype=np.int64)
    # rare term: df 2k, tf=1 almost everywhere but a cluster of tf=30
    # docs in a narrow doc range — the top-k lives in a handful of blocks
    rare_docs = np.sort(
        rng.choice(np.arange(1, n_docs + 1), size=2000, replace=False)
    )
    rare_tfs = np.ones(2000, dtype=np.int64)
    cluster = (rare_docs >= 1000) & (rare_docs < 15000)
    rare_tfs[cluster] = 30

    def mk():
        return [
            (1.0, _build(hot_docs, hot_tfs, dls), dls, avgdl),
            (3.0, _build(rare_docs, rare_tfs, dls), dls, avgdl),
        ]

    k = 10
    p_dyn = mk()
    d_docs, d_scores = or_terms_topk(p_dyn, k, tfn, score_round=6)
    dyn_decoded = sum(len(r.decoded) for _w, r, _d, _a in p_dyn)
    total = sum(r.n_blocks for _w, r, _d, _a in p_dyn)

    p_sta = mk()
    s_docs, s_scores = _or_topk_static(p_sta, k, tfn, score_round=6)
    sta_decoded = sum(len(r.decoded) for _w, r, _d, _a in p_sta)

    got_d = sorted(zip(d_docs, d_scores), key=lambda kv: (-kv[1], kv[0]))
    got_s = sorted(zip(s_docs, s_scores), key=lambda kv: (-kv[1], kv[0]))
    assert got_d == got_s
    # static phase-0 fully decodes one list; dynamic must beat it clearly
    assert dyn_decoded < sta_decoded, (dyn_decoded, sta_decoded, total)
    assert dyn_decoded < total // 4, (dyn_decoded, total)


def test_block_decode_cache_no_redecode(monkeypatch):
    """Each 128-block is decompressed at most once across the dynamic
    loop's rounds + candidate seek-scoring."""
    import iresearch_spark.query.wand as wand_mod

    rng = np.random.default_rng(3)
    n_docs = 50_000
    dls = np.full(n_docs, 50.0)
    docs = np.arange(1, n_docs + 1, 3, dtype=np.int64)
    tfs = rng.integers(1, 6, size=len(docs))
    r = _build(docs, tfs, dls)

    calls = []
    orig = wand_mod.decode_postings

    def counting(blob, block_indices=None, skip=None):
        if block_indices is not None:
            calls.extend(np.asarray(block_indices).tolist())
        return orig(blob, block_indices=block_indices, skip=skip)

    monkeypatch.setattr(wand_mod, "decode_postings", counting)
    r.decode_blocks(np.array([0, 2, 5]))
    r.decode_blocks(np.array([2, 5, 7]))  # 2 and 5 must come from cache
    r.decode_blocks(np.array([0, 7]))  # fully cached
    assert calls == [0, 2, 5, 7]
    assert sorted(r.decoded) == [0, 2, 5, 7]


def test_seek_entries_matches_full_and_is_frugal():
    """seek_entries must return the same (ordinal, tf) a full decode
    would, while touching only the blocks the candidates live in —
    ordinals stay valid for the position-offsets blob because non-final
    blocks hold exactly BLOCK_SIZE docs."""
    rng = np.random.default_rng(11)
    n_docs = 120_000
    dls = np.full(n_docs, 50.0)
    docs = np.sort(
        rng.choice(np.arange(1, n_docs + 1), size=60_000, replace=False)
    )
    tfs = rng.integers(1, 9, size=len(docs))
    r = _build(docs, tfs, dls)
    cand = np.sort(rng.choice(docs, size=40, replace=False))
    absent = np.array([d for d in range(1, 200) if d not in set(docs.tolist())][:10])
    cand_all = np.unique(np.concatenate([cand, absent]))
    present, ords, got_tfs = r.seek_entries(cand_all)
    # ground truth from the raw arrays
    pos_in_full = {int(d): i for i, d in enumerate(docs)}
    exp_present = np.array([int(d) in pos_in_full for d in cand_all])
    assert present.tolist() == exp_present.tolist()
    exp_ords = [pos_in_full[int(d)] for d in cand_all[exp_present]]
    assert ords.tolist() == exp_ords
    assert got_tfs.tolist() == [int(tfs[o]) for o in exp_ords]
    # frugality: candidates touch at most |cand| blocks of ~470
    assert r._full is None
    assert len(r.decoded) <= len(cand_all), (len(r.decoded), r.n_blocks)
    assert r.n_blocks > 400


@pytest.mark.parametrize("seed", range(10))
def test_or_groups_topk_matches_bruteforce(seed):
    """Or-of-And conjunction groups: the one-boolean-level bound
    propagation must return EXACTLY the exhaustive top-k under (rounded
    score desc, doc asc) — a doc matching several groups sums their
    contributions, a group matches only when every member is present."""
    from iresearch_spark.query.wand import or_groups_topk

    rng = np.random.default_rng([seed, 7])
    n_docs = int(rng.integers(200, 2000))
    dls = rng.integers(5, 400, size=n_docs).astype(np.float64)
    avgdl = float(dls.mean())
    tfn = _tfn()
    k = int(rng.integers(1, 25))
    mask = (
        np.sort(
            rng.choice(
                np.arange(1, n_docs + 1), size=n_docs // 10, replace=False
            )
        )
        if seed % 2
        else None
    )
    n_groups = int(rng.integers(2, 5))
    groups, raw = [], []
    for _ in range(n_groups):
        sz = int(rng.integers(1, 4))  # mix singletons and conjunctions
        members, mraw = [], []
        for _ in range(sz):
            df = int(rng.integers(1, n_docs))
            docs, tfs = _mk_reader(rng, n_docs, df)
            w = float(rng.uniform(0.1, 3.0))
            members.append((w, _build(docs, tfs, dls), dls, avgdl))
            mraw.append((w, dict(zip(docs.tolist(), tfs.tolist()))))
        groups.append(members)
        raw.append(mraw)

    brute = {}
    for mraw in raw:
        common = set(mraw[0][1])
        for _w, post in mraw[1:]:
            common &= set(post)
        for d in common:
            if mask is not None and d in mask:
                continue
            s = sum(
                w * tfn(float(post[d]), dls[d - 1], avgdl)
                for w, post in mraw
            )
            brute[d] = brute.get(d, 0.0) + s

    got_docs, got_scores = or_groups_topk(
        groups, k, tfn, mask=mask, score_round=6
    )
    expect = sorted(
        brute.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
    )[:k]
    got = sorted(zip(got_docs, got_scores), key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (gd, gs), (ed, es) in zip(got, expect):
        assert abs(gs - round(es, 6)) < 1e-9, (gd, ed)


def test_or_groups_topk_zero_weight_group_and_missing_member():
    """A group whose every weight is 0 still MATCHES (score 0, below all
    positives); a group with a missing (None) member is dropped whole."""
    from iresearch_spark.query.wand import or_groups_topk

    rng = np.random.default_rng(123)
    n_docs = 600
    dls = rng.integers(5, 400, size=n_docs).astype(np.float64)
    avgdl = float(dls.mean())
    tfn = _tfn()
    d1, t1 = _mk_reader(rng, n_docs, 40)
    d2, t2 = _mk_reader(rng, n_docs, 300)
    d3, t3 = _mk_reader(rng, n_docs, 500)
    groups = [
        [(1.5, _build(d1, t1, dls), dls, avgdl)],
        # zero-weight conjunction: matches score exactly 0
        [
            (0.0, _build(d2, t2, dls), dls, avgdl),
            (0.0, _build(d3, t3, dls), dls, avgdl),
        ],
        # missing member -> group contributes nothing at all
        [(2.0, None, dls, avgdl), (1.0, _build(d1, t1, dls), dls, avgdl)],
    ]
    k = 200
    got_docs, got_scores = or_groups_topk(groups, k, tfn, score_round=6)
    brute = {}
    for d, tf in zip(d1, t1):
        brute[d] = brute.get(d, 0.0) + 1.5 * tfn(
            float(tf), dls[d - 1], avgdl
        )
    for d in set(d2.tolist()) & set(d3.tolist()):
        brute.setdefault(d, 0.0)
    expect = sorted(
        brute.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
    )[:k]
    got = sorted(zip(got_docs, got_scores), key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in got] == [d for d, _ in expect]
