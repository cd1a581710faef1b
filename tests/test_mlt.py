"""MoreLikeThis: seed-doc term selection + BM25 similarity search.

Ground truth: re-implement the frozen selection rule (tf·idf rounded to
6 dp desc, term asc, top max_query_terms) in pure Python over the corpus
and compare the engine's result to the OracleIndex run of the same
disjunction with the seed excluded.
"""

import math

import pytest

from iresearch_spark.analysis.tokenizer import tokenize
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher


@pytest.fixture(scope="module")
def mlt_index(spark, tmp_path_factory):
    from iresearch_spark.build import build_index
    from iresearch_spark.fixtures import gen_corpus_pandas
    from iresearch_spark.oracle import OracleIndex
    from iresearch_spark.store import SnapshotStore

    corpus = gen_corpus_pandas(400, seed=11)
    store = SnapshotStore(str(tmp_path_factory.mktemp("mlt")))
    build_index(
        spark, spark.createDataFrame(corpus), store, n_segments=3,
        source="mlt", stored_cols=("text",),
    )
    oracle = OracleIndex.from_corpus(corpus, n_segments=3)
    return store, corpus, oracle


def _python_mlt_terms(corpus, seed_url, n_terms=10):
    toks = {u: tokenize(t) for u, t in zip(corpus["url"], corpus["text"])}
    n = len(toks)
    seed = toks[seed_url]
    tf = {}
    for t in seed:
        tf[t] = tf.get(t, 0) + 1
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in tf}
    idf = {
        t: math.log(1.0 + (n - d + 0.5) / (d + 0.5)) for t, d in df.items()
    }
    ranked = sorted((-round(tf[t] * idf[t], 6), t) for t in tf)
    return [t for _m, t in ranked[:n_terms]]


def test_mlt_matches_oracle(spark, mlt_index):
    store, corpus, oracle = mlt_index
    s = IndexSearcher(spark, store)
    seed_url = corpus["url"].iloc[5]
    top = _python_mlt_terms(corpus, seed_url)
    want = [
        (seg, doc, u, sc)
        for seg, doc, u, sc in oracle.search(qf.Terms(top), k=11)
        if u != seed_url
    ][:10]
    rows = s.more_like_this(seed_url, k=10).collect()
    got = [(r["seg_id"], r["doc_id"], r["url"], r["score"]) for r in rows]
    assert got == want
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["url"] != seed_url for r in rows)


def test_mlt_min_df_filters_rare_terms(spark, mlt_index):
    store, corpus, _oracle = mlt_index
    s = IndexSearcher(spark, store)
    seed_url = corpus["url"].iloc[0]
    # with a very high min_df only corpus-common terms survive; the query
    # still runs and never returns the seed
    rows = s.more_like_this(seed_url, k=5, min_df=50).collect()
    assert all(r["url"] != seed_url for r in rows)


def test_mlt_errors(spark, mlt_index, unit_index):
    store, corpus, _oracle = mlt_index
    s = IndexSearcher(spark, store)
    with pytest.raises(ValueError, match="no doc with url"):
        s.more_like_this("nope")
    with pytest.raises(ValueError, match="unknown field"):
        s.more_like_this(corpus["url"].iloc[0], field="zz")
    # an index without the stored source column refuses up front
    ustore, usid, _o = unit_index
    u = IndexSearcher(spark, ustore, usid)
    with pytest.raises(ValueError, match="stored column"):
        u.more_like_this("anything")
