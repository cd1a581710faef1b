"""explain_score: exact per-term score decomposition (Lucene Explanation).

The invariant under test: for every supported filter shape, the sum of a
hit's per-term `contribution` rows equals the hit's search score (the
kernel's scorers are per-term additive), and each row's (tf, df, weight)
match what the corpus/filter say they should be.
"""

import math

import pytest

from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, unit_index):
    store, sid, _oracle = unit_index
    return IndexSearcher(spark, store, sid)


def _check_sums(searcher, flt, k=10, scorer_kw=None):
    s = searcher
    if scorer_kw:
        s = IndexSearcher(searcher.spark, searcher.store, **scorer_kw)
    rows = s.explain_score(flt, k=k).collect()
    hits = {
        (r["seg_id"], r["doc_id"]): r["score"]
        for r in s.search(flt, k=k).collect()
    }
    assert rows, "explain produced no rows"
    by_doc: dict = {}
    for r in rows:
        key = (r["seg_id"], r["doc_id"])
        by_doc.setdefault(key, 0.0)
        by_doc[key] += r["contribution"]
        assert r["score"] == pytest.approx(hits[key], abs=1e-9)
    assert set(by_doc) == set(hits)
    for key, total in by_doc.items():
        # contributions are individually rounded to 6 dp, so the sum can
        # differ from the score by ~n_terms ulps of 1e-6
        assert total == pytest.approx(hits[key], abs=5e-5), key
    return rows


def test_or_decomposition(searcher):
    rows = _check_sums(searcher, qf.Or(qf.Term("w0"), qf.Term("w4")))
    assert {r["term"] for r in rows} <= {"w0", "w4"}
    assert all(r["weight"] == 1.0 for r in rows)


def test_and_decomposition(searcher):
    rows = _check_sums(searcher, qf.And(qf.Term("w0"), qf.Term("w1")))
    # every And hit must carry BOTH terms
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault((r["seg_id"], r["doc_id"]), set()).add(r["term"])
    assert all(ts == {"w0", "w1"} for ts in by_doc.values())


def test_min_match_and_cnf(searcher):
    _check_sums(
        searcher,
        qf.Or(qf.Term("w0"), qf.Term("w1"), qf.Term("w2"), min_match=2),
    )
    _check_sums(
        searcher,
        qf.And(qf.Or(qf.Term("w0"), qf.Term("w4")), qf.Term("w1")),
    )


def test_boost_folds_into_weight(searcher):
    rows = _check_sums(
        searcher, qf.And(qf.Term("w0", boost=2.0), qf.Term("w1"))
    )
    w = {r["term"]: r["weight"] for r in rows}
    assert w["w0"] == pytest.approx(2.0) and w["w1"] == pytest.approx(1.0)


def test_root_not(searcher):
    rows = _check_sums(searcher, qf.Not(qf.Term("w0"), qf.Term("w1")))
    assert {r["term"] for r in rows} == {"w0"}


def test_multiterm_expansion_with_unscored_tail(searcher):
    rows = _check_sums(
        searcher, qf.Prefix("w1", scored_terms_limit=3), k=10
    )
    weights = {r["term"]: r["weight"] for r in rows}
    assert len([w for w in weights.values() if w > 0]) <= 3
    # the F17 tail surfaces as explicit zero-weight/zero-contribution rows
    tail = [r for r in rows if r["weight"] == 0.0]
    assert all(r["contribution"] == 0.0 for r in tail)


def test_scorer_variants(searcher):
    flt = qf.Or(qf.Term("w0"), qf.Term("w4"))
    _check_sums(searcher, flt, scorer_kw={"scorer": "tfidf"})
    _check_sums(searcher, flt, scorer_kw={"b": 0.0})  # BM15
    _check_sums(searcher, flt, scorer_kw={"b": 1.0})  # BM11


def test_idf_and_tf_values(searcher, unit_corpus):
    from iresearch_spark.analysis.tokenizer import tokenize

    toks_by_url = {
        u: tokenize(t)
        for u, t in zip(unit_corpus["url"], unit_corpus["text"])
    }
    n = len(toks_by_url)
    df = sum(1 for ts in toks_by_url.values() if "w4" in ts)
    rows = _check_sums(searcher, qf.Term("w4"))
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    for r in rows:
        assert r["df"] == df
        assert r["tf"] == toks_by_url[r["url"]].count("w4")
        # contribution = idf * tfn with weight 1; tfn < k1+1 bound
        assert 0.0 < r["contribution"] <= idf * (searcher.k1 + 1.0) + 1e-9


def test_rejects_non_decomposable(searcher):
    with pytest.raises(ValueError):
        searcher.explain_score(qf.Phrase(["w2", "w3"]))
    with pytest.raises(ValueError):
        searcher.explain_score(
            qf.Or(qf.And(qf.Term("w0"), qf.Term("w1")), qf.Term("w2"))
        )
