"""search_after cursor pagination + histogram facets.

Cursor invariant: paging through with (score, url) cursors reproduces the
oracle's global ranking exactly, page by page, and never repeats or skips
a doc across page boundaries (the failure mode of offset pagination under
ties that cursors exist to fix).
"""

import math

import pytest

from iresearch_spark.analysis.tokenizer import tokenize
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, unit_index):
    store, sid, _oracle = unit_index
    return IndexSearcher(spark, store, sid)


def _oracle_pages(oracle, flt, total):
    want = oracle.search(flt, k=total)
    # engine cursors compare ROUNDED scores; mirror that here
    return [(u, round(sc, 6)) for _seg, _doc, u, sc in want]


def test_cursor_pages_reproduce_global_ranking(searcher, unit_index):
    _store, _sid, oracle = unit_index
    flt = qf.Or(qf.Term("w0"), qf.Term("w1"))
    want = _oracle_pages(oracle, flt, 30)
    got: list = []
    after = None
    for _page in range(3):
        rows = searcher.search_after(flt, k=10, after=after).collect()
        if not rows:
            break
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        got += [(r["url"], r["score"]) for r in rows]
        after = (rows[-1]["score"], rows[-1]["url"])
    assert got == want[: len(got)]
    assert len(got) == min(30, len(want))
    # no duplicates across page boundaries
    assert len({u for u, _s in got}) == len(got)


def test_cursor_page_equals_offset_page(searcher):
    """search_after page 2 must equal search_page(offset=k) — same total
    order, different cost model."""
    flt = qf.Term("w2")
    p1 = searcher.search_after(flt, k=10).collect()
    after = (p1[-1]["score"], p1[-1]["url"])
    cursor_page = [
        (r["url"], r["score"])
        for r in searcher.search_after(flt, k=10, after=after).collect()
    ]
    offset_page = [
        (r["url"], r["score"])
        for r in searcher.search_page(
            flt, k=10, offset=10, tie="url", score_round=6
        ).collect()
    ]
    assert cursor_page == offset_page


def test_cursor_exhaustion_and_sorted_guard(spark, searcher, tmp_path_factory):
    flt = qf.Term("w0")
    n = searcher.count_docs(flt)
    # a cursor past the last doc yields an empty page, not an error
    tail = searcher.search_after(flt, k=n + 10).collect()
    last = (tail[-1]["score"], tail[-1]["url"])
    assert searcher.search_after(flt, k=5, after=last).collect() == []

    from iresearch_spark.build import build_index
    from iresearch_spark.fixtures import gen_corpus_pandas
    from iresearch_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path_factory.mktemp("cursor_sorted")))
    build_index(
        spark, spark.createDataFrame(gen_corpus_pandas(100, seed=3)), store,
        n_segments=2, source="cs", sort_by="lang",
    )
    s2 = IndexSearcher(spark, store)
    with pytest.raises(ValueError, match="primary-sorted"):
        s2.search_after(qf.Term("w0"))


def test_histogram_facets_match_pandas(spark, unit_index, unit_corpus):
    store, sid, _oracle = unit_index
    s = IndexSearcher(spark, store, sid)
    # histogram over doc length proxy: use the built-in lang column? needs
    # numeric — histogram over warc_ts epoch is the date_histogram case
    urls = {
        u
        for u, t in zip(unit_corpus["url"], unit_corpus["text"])
        if "w0" in tokenize(t)
    }
    sub = unit_corpus[unit_corpus["url"].isin(urls)]
    interval = 3600.0  # hourly buckets over warc_ts seconds
    epochs = sub["warc_ts"].astype("datetime64[s]").astype("int64")
    want = (
        (epochs // interval).astype("int64").value_counts().sort_index()
    )
    got = s.histogram_facets(
        qf.Term("w0"), "warc_ts", interval=interval
    ).collect()
    assert [(r["bucket"], r["n_docs"]) for r in got] == [
        (int(b), int(c)) for b, c in want.items()
    ]
    for r in got:
        assert r["lo"] == pytest.approx(r["bucket"] * interval)
        assert math.isclose(r["lo"] % interval, 0.0, abs_tol=1e-9)
    with pytest.raises(ValueError):
        s.histogram_facets(qf.Term("w0"), "warc_ts", interval=0)
