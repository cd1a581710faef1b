"""Seeded randomized filter-algebra rank-identity: generate bounded random
query trees over the full node set (Term/Terms/Prefix/Wildcard/Regexp/
Fuzzy/TermRange/Phrase incl. gap offsets/SamePosition/NgramSimilarity/
And/Or/Not/Boost/Nested/AllDocs) and assert the Spark engine reproduces the
pure-Python oracle exactly — scores AND order. This is the combinatorial
guard the per-feature suites can't give: every composite evaluator path
(kernel eval_node, WAND flattenings, scored-head elision re-runs,
expansion rewrite) must agree on arbitrary compositions, mirroring the
reference's randomized boolean-filter tests ([up]
tests/search/boolean_filter_tests.cpp's generated clause sets).

Deterministic: a fixed seed list, no time/entropy dependence.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from iresearch_spark.build import build_index
from iresearch_spark.fields import FieldSpec
from iresearch_spark.oracle.model import OracleIndex
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher
from iresearch_spark.store import SnapshotStore

WORDS = [
    "table", "scan", "hash", "join", "merge", "data", "dup", "order",
    "filter", "spark", "index", "query",
]


def _corpus(n=120, seed=11):
    rng = random.Random(seed)
    urls, texts, kinds, nums = [], [], [], []
    for i in range(n // 3):
        pfx = f"{i:04d}"
        for j in range(2):
            urls.append(f"{pfx}#c{j}")
            texts.append(" ".join(rng.choices(WORDS, k=rng.randint(3, 10))))
            kinds.append("c")
        urls.append(f"{pfx}~p")
        texts.append(" ".join(rng.choices(WORDS, k=rng.randint(0, 4))))
        kinds.append("p")
    # deterministic signed ints for the A7 numeric field (F5 leaves)
    nums = [len(t) * 7 - 300 for t in texts]
    return urls, texts, kinds, nums


@pytest.fixture(scope="module")
def rnd_index(spark, tmp_path_factory):
    urls, texts, kinds, nums = _corpus()
    store = SnapshotStore(str(tmp_path_factory.mktemp("rnd_idx")))
    sdf = spark.createDataFrame(
        list(zip(urls, texts, kinds, [str(v) for v in nums])),
        "url string, text string, kind string, num string",
    )
    fields = [
        FieldSpec("text", "__text__", "text"),
        FieldSpec("kind", "kind", "identity"),
        FieldSpec("num", "num", "numeric:8"),
    ]
    build_index(
        spark, sdf, store, n_segments=2, fields=fields, source="rnd",
        segment_key="substring(url, 1, 4)",
    )
    oracle = OracleIndex(
        urls, texts, n_segments=2,
        extra_fields=[
            ("kind", kinds, "identity"),
            ("num", [str(v) for v in nums], "numeric:8"),
        ],
        segment_keys=[u[:4] for u in urls],
    )
    return store, oracle


def _leaf(rng: random.Random) -> qf.Filter:
    w = rng.choice(WORDS)
    kind = rng.randrange(11)
    boost = rng.choice([1.0, 1.0, 0.5, 2.0])
    if kind == 0:
        return qf.Term(w, boost=boost)
    if kind == 1:
        ts = rng.sample(WORDS, rng.randint(1, 3))
        weights = [rng.choice([0.0, 1.0, 1.5]) for _ in ts]
        return qf.Terms(ts, boost=boost, weights=weights)
    if kind == 2:
        return qf.Prefix(w[: rng.randint(1, 3)], boost=boost,
                         scored_terms_limit=rng.choice([2, 64]))
    if kind == 3:
        return qf.Wildcard("%" + w[-2:], boost=boost)
    if kind == 4:
        return qf.Fuzzy(w[:-1] + "x", max_distance=1, boost=boost,
                        with_transpositions=rng.random() < 0.5)
    if kind == 5:
        lo, hi = sorted(rng.sample(WORDS, 2))
        return qf.TermRange(lo, hi, boost=boost)
    if kind == 6:
        n_slots = rng.randint(2, 3)
        slots: list = rng.choices(WORDS, k=n_slots)
        if rng.random() < 0.4:
            slots[-1] = qf.Prefix(rng.choice(WORDS)[:2])
        offsets = None
        if rng.random() < 0.5:
            offs, at = [0], 0
            for _ in range(n_slots - 1):
                at += rng.randint(1, 2)
                offs.append(at)
            offsets = tuple(offs)
        return qf.Phrase(slots, boost=boost, offsets=offsets)
    if kind == 7:
        return qf.NgramSimilarity(w, threshold=0.5, n=2, boost=boost,
                                  field="text")
    if kind == 8:
        # F5 granular numeric range (values span roughly [-300, 200])
        lo, hi = sorted(rng.sample(range(-320, 220), 2))
        return qf.GranularRange(
            lo, hi, step=8, field="num", boost=boost,
            include_lo=rng.random() < 0.8, include_hi=rng.random() < 0.3,
            scored_terms_limit=rng.choice([3, 64]),
        )
    if kind == 9:
        # portable full-match regex subset (JVM rlike == re.fullmatch)
        pat = rng.choice([
            w[:2] + "[a-z]*",
            "(" + "|".join(rng.sample(WORDS, 2)) + ")",
            w[:1] + ".{2,5}",
            "[dfh][a-z]+",
        ])
        return qf.Regexp(pat, boost=boost,
                         scored_terms_limit=rng.choice([2, 64]))
    return qf.AllDocs(boost=boost)


def _tree(rng: random.Random, depth: int) -> qf.Filter:
    if depth <= 0 or rng.random() < 0.35:
        return _leaf(rng)
    kind = rng.randrange(5)
    boost = rng.choice([1.0, 1.0, 2.0])
    if kind == 0:
        kids = [_tree(rng, depth - 1) for _ in range(rng.randint(2, 3))]
        return qf.And(*kids, boost=boost)
    if kind == 1:
        kids = [_tree(rng, depth - 1) for _ in range(rng.randint(2, 4))]
        mm = rng.randint(1, len(kids))
        return qf.Or(*kids, min_match=mm, boost=boost)
    if kind == 2:
        return qf.Not(_tree(rng, depth - 1), _tree(rng, depth - 1), boost)
    if kind == 3:
        return qf.Boost(_tree(rng, depth - 1), 1.5)
    return qf.Nested(
        qf.Term("p", field="kind"),
        _tree(rng, depth - 1),
        min_children=rng.randint(1, 2),
        max_children=rng.choice([None, 2]),
        merge=rng.choice(["sum", "max", "min", "avg", "none"]),
        boost=boost,
    )


def test_random_trees_rank_identical(spark, rnd_index):
    store, oracle = rnd_index
    s = IndexSearcher(spark, store)
    rng = random.Random(2026)
    trees = {qid: _tree(rng, 3) for qid in range(40)}
    res = s.search_batch(trees, k=15, with_urls=True)
    got: dict[int, list] = {}
    for r in res.collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["seg_id"], r["doc_id"], r["url"], r["score"])
        )
    for v in got.values():
        v.sort()
    n_nonempty = 0
    for qid, tree in trees.items():
        want = oracle.search(tree, k=15)
        have = got.get(qid, [])
        if want:
            n_nonempty += 1
        assert len(have) == len(want), (qid, tree, len(have), len(want))
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url) == (oseg, odoc, ourl), (qid, tree, rank)
            assert score == oscore, (qid, tree, rank, score, oscore)
    assert n_nonempty >= 20, n_nonempty  # the generator must exercise the index


def test_or_of_and_groups_rank_identical(spark, rnd_index):
    """Dedicated coverage for the or_groups_topk dispatch (one boolean
    level of And under a min_match=1 Or): every generated tree flattens
    to conjunction groups, so the pruned kernel — not eval_node — answers
    it, and must stay rank-identical to the pure-Python oracle."""
    from iresearch_spark.query.executor import _flatten_or_groups

    store, oracle = rnd_index
    s = IndexSearcher(spark, store)
    rng = random.Random(515)
    trees = {}
    for qid in range(25):
        kids = []
        n_kids = rng.randint(2, 4)
        has_conj = False
        for _ in range(n_kids):
            if rng.random() < 0.6 or not has_conj:
                members = [
                    qf.Term(w, boost=rng.choice([1.0, 0.5, 2.0]))
                    for w in rng.sample(WORDS, rng.randint(2, 3))
                ]
                kids.append(
                    qf.And(*members, boost=rng.choice([1.0, 1.5]))
                )
                has_conj = True
            else:
                kids.append(
                    qf.Term(rng.choice(WORDS),
                            boost=rng.choice([1.0, 0.5]))
                )
        tree = qf.Or(*kids, boost=rng.choice([1.0, 2.0]))
        gs = _flatten_or_groups(tree)
        assert gs is not None and any(len(g) > 1 for g in gs), tree
        trees[qid] = tree
    res = s.search_batch(trees, k=15, with_urls=True)
    got: dict[int, list] = {}
    for r in res.collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["seg_id"], r["doc_id"], r["url"], r["score"])
        )
    for v in got.values():
        v.sort()
    n_nonempty = 0
    for qid, tree in trees.items():
        want = oracle.search(tree, k=15)
        have = got.get(qid, [])
        if want:
            n_nonempty += 1
        assert len(have) == len(want), (qid, tree, len(have), len(want))
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url) == (oseg, odoc, ourl), (qid, tree, rank)
            assert score == oscore, (qid, tree, rank, score, oscore)
    assert n_nonempty >= 15, n_nonempty
