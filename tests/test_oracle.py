"""Oracle model tests: hand-computed BM25 micro-fixture (FIXTURES.md §3,
mirroring [up] tests/search/bm25_test.cpp's exact-score style) plus filter
semantics sanity."""

import math

import pytest

from iresearch_spark.oracle import OracleIndex, levenshtein, wildcard_to_regex
from iresearch_spark.query import filters as qf

# 8 docs: dl = {3,5,5,8,13,21,34,55} tokens, query term 'zz' tf =
# {1,2,0,1,5,0,1,3}; filler tokens fNN_M are unique per doc.
DLS = [3, 5, 5, 8, 13, 21, 34, 55]
TFS = [1, 2, 0, 1, 5, 0, 1, 3]


def _micro_corpus():
    urls, texts = [], []
    for i, (dl, tf) in enumerate(zip(DLS, TFS)):
        fill = [f"f{i}x{j}" for j in range(dl - tf)]
        toks = ["zz"] * tf + fill
        urls.append(f"https://m.example/{i:02d}")
        texts.append(" ".join(toks))
    return urls, texts


@pytest.mark.parametrize("k1,b", [(1.2, 0.75), (1.2, 0.0), (1.2, 1.0)])
def test_bm25_exact_scores(k1, b):
    urls, texts = _micro_corpus()
    idx = OracleIndex(urls, texts, n_segments=1, k1=k1, b=b)
    n, df = 8, 6
    avgdl = sum(DLS) / n
    assert idx.n_docs == n and idx.df[("text", "zz")] == df and idx.avgdl == avgdl
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    got = {doc: s for (_seg, doc), s in idx.evaluate(qf.Term("zz")).items()}
    # docIDs are 1-based in url order (urls sort in doc index order here)
    for i, (dl, tf) in enumerate(zip(DLS, TFS)):
        doc = i + 1
        if tf == 0:
            assert doc not in got
        else:
            # canonical association: (boost*idf) * tfn, tfn = (tf*(k1+1))/(..)
            want = (1.0 * idf) * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)))
            assert got[doc] == pytest.approx(want, abs=0, rel=0)  # exact


def test_topk_tie_break_order():
    # two docs with identical score -> order by (seg asc, doc asc)
    urls = ["https://a/1", "https://a/2"]
    texts = ["zz qq", "zz qq"]
    idx = OracleIndex(urls, texts, n_segments=1)
    res = idx.search(qf.Term("zz"), k=2)
    assert [r[1] for r in res] == [1, 2]
    assert res[0][3] == res[1][3]


def test_boolean_semantics():
    urls = [f"https://b/{i}" for i in range(4)]
    texts = ["aa bb", "aa cc", "bb cc", "dd ee"]
    idx = OracleIndex(urls, texts, n_segments=1)
    both = idx.evaluate(qf.And(qf.Term("aa"), qf.Term("bb")))
    assert len(both) == 1
    either = idx.evaluate(qf.Or(qf.Term("aa"), qf.Term("bb")))
    assert len(either) == 3
    # And score == sum of term scores
    (k, v), = both.items()
    ta = idx.evaluate(qf.Term("aa"))
    tb = idx.evaluate(qf.Term("bb"))
    assert v == ta[k] + tb[k]
    mm = idx.evaluate(qf.Or(qf.Term("aa"), qf.Term("bb"), qf.Term("cc"), min_match=2))
    assert len(mm) == 3  # every doc except dd/ee has 2 of 3
    ex = idx.evaluate(qf.Not(qf.Term("aa"), qf.Term("cc")))
    assert len(ex) == 1 and ex == {k: ta[k] for k in ex}
    boosted = idx.evaluate(qf.Boost(qf.Term("aa"), 2.5))
    assert all(boosted[k] == pytest.approx(2.5 * ta[k], rel=0) for k in ta)


def test_phrase_semantics():
    urls = [f"https://p/{i}" for i in range(3)]
    texts = ["xx yy zz", "yy xx", "xx qq yy"]
    idx = OracleIndex(urls, texts, n_segments=1)
    hits = idx.evaluate(qf.Phrase(["xx", "yy"]))
    assert len(hits) == 1
    ((seg, doc),) = hits.keys()
    assert idx.doc_url[(seg, doc)] == "https://p/0"


def test_expansion_filters():
    urls = [f"https://e/{i}" for i in range(3)]
    texts = ["cat cap car", "dog dig", "cat cut"]
    idx = OracleIndex(urls, texts, n_segments=1)
    assert idx.expand(qf.Prefix("ca")) == ["cap", "car", "cat"]
    assert idx.expand(qf.TermRange("cap", "cut")) == ["cap", "car", "cat"]
    assert idx.expand(qf.TermRange("cap", "cut", include_hi=True)) == [
        "cap", "car", "cat", "cut",
    ]
    assert idx.expand(qf.Wildcard("c_t")) == ["cat", "cut"]
    assert idx.expand(qf.Wildcard("d%")) == ["dig", "dog"]
    assert idx.expand(qf.Fuzzy("cat", max_distance=1)) == ["cap", "car", "cat", "cut"]
    # scored_terms_limit keeps highest-df terms (cat df=2 beats others)
    assert idx.expand(qf.Prefix("c", scored_terms_limit=1)) == ["cat"]


def test_levenshtein_and_wildcard_helpers():
    assert levenshtein("kitten", "sitting", 3) == 3
    assert levenshtein("abc", "abc", 0) == 0
    assert levenshtein("abc", "abcd", 0) == 1  # early exit returns >max_d
    assert wildcard_to_regex("a%b_c") == "a.*b.c"


def test_segmented_index_same_scores_as_single():
    """Global stats (N, df, avgdl) make scores segment-layout-independent."""
    from iresearch_spark.fixtures import gen_corpus_pandas

    corpus = gen_corpus_pandas(300, seed=42)
    i1 = OracleIndex.from_corpus(corpus, n_segments=1)
    i4 = OracleIndex.from_corpus(corpus, n_segments=4)
    q = qf.Or(qf.Term("w0"), qf.Term("w5"))
    r1 = {url: s for _, _, url, s in i1.search(q, k=50)}
    r4 = {url: s for _, _, url, s in i4.search(q, k=50)}
    assert r1 == r4
