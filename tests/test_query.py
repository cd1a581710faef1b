"""End-to-end rank-identity: the Spark executor must reproduce the oracle's
top-k docIDs AND float64 BM25 scores EXACTLY on the frozen query set
(BASELINE.json:14 'rank-identical'; FIXTURES.md §2)."""

import pytest

from iresearch_spark.fixtures import gen_queries
from iresearch_spark.fixtures.queries import build_filter
from iresearch_spark.query import And, Boost, Not, Or, Phrase, Term
from iresearch_spark.query.executor import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, unit_index):
    store, sid, _oracle = unit_index
    return IndexSearcher(spark, store, sid)


def _spark_results(searcher, queries, k=10):
    df = searcher.search_batch(queries, k=k, with_urls=True)
    out = {}
    for r in df.collect():
        out.setdefault(r["qid"], []).append(
            (r["rank"], r["seg_id"], r["doc_id"], r["url"], r["score"])
        )
    for v in out.values():
        v.sort()
    return out


def test_rank_identical_full_query_set(searcher, unit_index, unit_corpus):
    _store, _sid, oracle = unit_index
    specs = gen_queries(unit_corpus["text"].tolist(), n_queries=100)
    queries = {s["qid"]: build_filter(s["kind"], s["terms"]) for s in specs}
    got = _spark_results(searcher, queries, k=10)
    n_nonempty = 0
    mismatches = []
    for s in specs:
        qid = s["qid"]
        want = oracle.search(queries[qid], k=10)
        have = got.get(qid, [])
        if want:
            n_nonempty += 1
        if len(want) != len(have):
            mismatches.append((qid, s["kind"], "len", len(want), len(have)))
            continue
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            if (seg, doc, url) != (oseg, odoc, ourl) or score != oscore:
                mismatches.append(
                    (qid, s["kind"], (seg, doc, score), (oseg, odoc, oscore))
                )
                break
    assert not mismatches, mismatches[:5]
    assert n_nonempty >= 60  # the query set must actually exercise the index


def test_composite_trees_match_oracle(searcher, unit_index):
    _store, _sid, oracle = unit_index
    trees = {
        0: Or(And(Term("w0"), Term("w1")), Phrase(["w2", "w3"]), min_match=1),
        1: Not(Or(Term("w0"), Term("w4")), Term("w2")),
        2: Boost(And(Term("w5"), Or(Term("w6"), Term("w7"))), 2.0),
        3: Or(Term("w0"), Term("w1"), Term("w2"), Term("w3"), min_match=3),
    }
    got = _spark_results(searcher, trees, k=20)
    for qid, tree in trees.items():
        want = oracle.search(tree, k=20)
        have = got.get(qid, [])
        assert len(have) == len(want), qid
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url, score) == (oseg, odoc, ourl, oscore), qid


def test_same_position_filter(spark, unit_index):
    """F10 by_same_position: engine matches the oracle; distinct terms in a
    single-valued field share no position (empty), identical terms reduce
    to the term's own positions (hits == tf)."""
    from iresearch_spark.query import filters as qf
    from iresearch_spark.query.executor import IndexSearcher

    store, sid, oracle = unit_index
    s = IndexSearcher(spark, store, sid)
    # distinct terms -> empty in both
    flt = qf.SamePosition(["w1", "w2"])
    got = s.search(flt, k=20, with_urls=False).collect()
    assert got == [] and oracle.search(flt, k=20) == []
    # degenerate same-term pair -> equals oracle exactly
    flt2 = qf.SamePosition(["w3", "w3"])
    got2 = [
        (r["seg_id"], r["doc_id"], round(r["score"], 9))
        for r in s.search(flt2, k=15, with_urls=False).collect()
    ]
    exp2 = [
        (seg, doc, round(score, 9))
        for seg, doc, _url, score in oracle.search(flt2, k=15)
    ]
    assert got2 == exp2 and got2
