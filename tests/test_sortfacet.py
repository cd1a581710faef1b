"""Query-time attribute sort (sort_by_topk) and range facets.

Ground truth is a pandas re-evaluation over the corpus: matched docs from
the frozen tokenizer, ordered/bucketed the same way.
"""

import pandas as pd
import pytest

from iresearch_spark.analysis.tokenizer import tokenize
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, unit_index):
    store, sid, _oracle = unit_index
    return IndexSearcher(spark, store, sid)


def _matching_urls(corpus: pd.DataFrame, term: str) -> set:
    return {
        u
        for u, t in zip(corpus["url"], corpus["text"])
        if term in tokenize(t)
    }


def test_recency_sort_matches_pandas(searcher, unit_corpus):
    urls = _matching_urls(unit_corpus, "w0")
    sub = unit_corpus[unit_corpus["url"].isin(urls)]
    want = (
        sub.sort_values(["warc_ts", "url"], ascending=[False, True])
        .head(7)["url"]
        .tolist()
    )
    got = searcher.sort_by_topk(qf.Term("w0"), by="warc_ts", k=7, ascending=False)
    rows = got.collect()
    assert [r["url"] for r in rows] == want
    assert [r["rank"] for r in rows] == list(range(1, len(want) + 1))
    # ascending flips the order of the same candidate set
    got_asc = searcher.sort_by_topk(qf.Term("w0"), by="warc_ts", k=7).collect()
    want_asc = (
        sub.sort_values(["warc_ts", "url"]).head(7)["url"].tolist()
    )
    assert [r["url"] for r in got_asc] == want_asc


def test_sort_rejects_unknown_column(searcher):
    with pytest.raises(ValueError):
        searcher.sort_by_topk(qf.Term("w0"), by="nosuch")
    with pytest.raises(ValueError):
        searcher.range_facets(qf.Term("w0"), "fdls", [(None, None)])
    with pytest.raises(ValueError):
        searcher.range_facets(qf.Term("w0"), "lang", [])


@pytest.fixture(scope="module")
def stored_num_index(spark, tmp_path_factory):
    from iresearch_spark.build import build_index
    from iresearch_spark.fixtures import gen_corpus_pandas
    from iresearch_spark.store import SnapshotStore

    corpus = gen_corpus_pandas(300, seed=7)
    corpus["nch"] = corpus["text"].str.len().astype("int64")
    store = SnapshotStore(str(tmp_path_factory.mktemp("sortnum")))
    sdf = spark.createDataFrame(corpus)
    build_index(
        spark, sdf, store, n_segments=3, source="sortnum",
        stored_cols=("nch",),
    )
    return store, corpus


def test_numeric_sort_on_stored_col(spark, stored_num_index):
    store, corpus = stored_num_index
    s = IndexSearcher(spark, store)
    urls = _matching_urls(corpus, "w1")
    sub = corpus[corpus["url"].isin(urls)]
    want = (
        sub.sort_values(["nch", "url"], ascending=[False, True])
        .head(5)[["url", "nch"]]
        .values.tolist()
    )
    rows = s.sort_by_topk(qf.Term("w1"), by="nch", k=5, ascending=False).collect()
    assert [[r["url"], r["nch"]] for r in rows] == want


def test_range_facets_match_pandas(spark, stored_num_index):
    store, corpus = stored_num_index
    s = IndexSearcher(spark, store)
    urls = _matching_urls(corpus, "w0")
    sub = corpus[corpus["url"].isin(urls)]
    lo, hi = int(sub["nch"].quantile(0.3)), int(sub["nch"].quantile(0.7))
    ranges = [(None, lo), (lo, hi), (hi, None), (10**9, None)]
    rows = s.range_facets(qf.Term("w0"), "nch", ranges).collect()
    assert [r["bucket"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["n_docs"] == int((sub["nch"] < lo).sum())
    assert rows[1]["n_docs"] == int(((sub["nch"] >= lo) & (sub["nch"] < hi)).sum())
    assert rows[2]["n_docs"] == int((sub["nch"] >= hi).sum())
    assert rows[3]["n_docs"] == 0  # empty ranges still emit a row
    # overlapping ranges double-count by design (ES range agg semantics)
    over = s.range_facets(
        qf.Term("w0"), "nch", [(None, None), (None, None)]
    ).collect()
    assert over[0]["n_docs"] == over[1]["n_docs"] == len(sub)
