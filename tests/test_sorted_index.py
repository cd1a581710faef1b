"""Index sort / primary sort ([up] core/index/comparer.hpp — index_writer
constructed with a comparer; merge_writer re-sorts with it; ArangoSearch's
primarySort): build_index(sort_by=<SQL expr over stored doc columns>)
assigns per-segment docIDs by (sort_by, url), the spec is frozen in the
snapshot manifest, maintenance merges preserve it, rankings stay
rank-identical to the oracle (BM25 is docID-permutation-invariant in
everything but tie order — the oracle models the same order), and
sorted_topk reads the first-k matches in index order without scoring.
"""

from __future__ import annotations

import pandas as pd
import pytest

from iresearch_spark.build import build_index
from iresearch_spark.build.merge import delete_by_query, merge_segments
from iresearch_spark.fields import FieldSpec
from iresearch_spark.oracle.model import OracleIndex
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher
from iresearch_spark.store import SnapshotStore

WORDS = [
    "table", "scan", "hash", "join", "merge", "data", "dup", "order",
]
LANGS = ["de", "en", "fr", "it", "pt"]


def _corpus(n=90):
    import random

    rng = random.Random(7)
    return pd.DataFrame(
        {
            "url": [f"{i:04d}" for i in range(n)],
            "warc_ts": pd.to_datetime(["2026-01-01"] * n),
            "html": [None] * n,
            # lang deliberately NOT aligned with url order
            "lang": [LANGS[(i * 7 + 3) % 5] for i in range(n)],
            "text": [
                " ".join(rng.choices(WORDS, k=rng.randint(3, 9)))
                for _ in range(n)
            ],
        }
    )


SCHEMA = "url string, warc_ts timestamp, html binary, lang string, text string"


@pytest.fixture(scope="module")
def sorted_index(spark, tmp_path_factory):
    pdf = _corpus()
    store = SnapshotStore(str(tmp_path_factory.mktemp("sorted_idx")))
    build_index(
        spark,
        spark.createDataFrame(pdf, schema=SCHEMA),
        store,
        n_segments=3,
        source="sorted_unit",
        sort_by="lang",
    )
    oracle = OracleIndex(
        pdf["url"].tolist(),
        pdf["text"].tolist(),
        n_segments=3,
        sort_keys=pdf["lang"].tolist(),
    )
    return store, oracle, pdf


def test_docid_order_is_sort_order(spark, sorted_index):
    store, _oracle, _pdf = sorted_index
    rows = (
        store.read_docs(spark, None)
        .select("seg_id", "doc_id", "lang", "url")
        .collect()
    )
    by_seg: dict[int, list] = {}
    for r in rows:
        by_seg.setdefault(r["seg_id"], []).append(
            (r["doc_id"], (r["lang"], r["url"]))
        )
    assert len(by_seg) > 1
    saw_nontrivial = False
    for seg, docs in by_seg.items():
        docs.sort()
        keys = [k for _d, k in docs]
        assert keys == sorted(keys), seg  # docID order == (lang, url) order
        urls = [u for _d, (_l, u) in docs]
        if urls != sorted(urls):
            saw_nontrivial = True  # the sort actually reordered vs url
    assert saw_nontrivial
    assert store.sort_spec() == "lang"


def test_sorted_rankings_match_oracle(spark, sorted_index):
    store, oracle, _pdf = sorted_index
    s = IndexSearcher(spark, store)
    assert s.sort == "lang"
    trees = {
        0: qf.Term("table"),
        1: qf.And(qf.Term("scan"), qf.Term("hash")),
        2: qf.Or(qf.Term("dup"), qf.Term("merge"), min_match=1),
        3: qf.Phrase(["table", "scan"]),
        4: qf.Prefix("d", scored_terms_limit=2),
    }
    res = s.search_batch(trees, k=15, with_urls=True)  # reference tie order
    got: dict[int, list] = {}
    for r in res.collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["seg_id"], r["doc_id"], r["url"], r["score"])
        )
    for v in got.values():
        v.sort()
    for qid, tree in trees.items():
        want = oracle.search(tree, k=15)
        have = got.get(qid, [])
        assert len(have) == len(want), (qid, len(have), len(want))
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url) == (oseg, odoc, ourl), (qid, rank)
            assert score == oscore, (qid, rank)


def test_sorted_topk_matches_oracle(spark, sorted_index):
    store, oracle, pdf = sorted_index
    s = IndexSearcher(spark, store)
    for flt in [qf.Term("table"), qf.Or(qf.Term("dup"), qf.Term("data"))]:
        got = [
            (r["seg_id"], r["doc_id"], r["url"])
            for r in s.sorted_topk(flt, k=12).collect()
        ]
        want = oracle.sorted_topk(flt, k=12)
        assert got == want, (flt, got, want)
    # the head really is (lang, url)-minimal over ALL matches
    langs = dict(zip(pdf["url"], pdf["lang"]))
    all_match = {
        u for _s, _d, u in oracle.sorted_topk(qf.Term("table"), k=10**6)
    }
    head = [u for _s, _d, u in oracle.sorted_topk(qf.Term("table"), k=12)]
    assert head == sorted(all_match, key=lambda u: (langs[u], u))[:12]


def test_url_tie_rejected_on_sorted_index(spark, sorted_index):
    store, _oracle, _pdf = sorted_index
    s = IndexSearcher(spark, store)
    with pytest.raises(ValueError, match="primary-sorted"):
        s.search_batch({0: qf.Term("table")}, k=5, tie="url")


def test_append_sort_mismatch_rejected(spark, sorted_index, tmp_path_factory):
    store, _oracle, pdf = sorted_index
    import shutil

    root2 = str(tmp_path_factory.mktemp("sorted_append"))
    shutil.copytree(store.root, root2, dirs_exist_ok=True)
    store2 = SnapshotStore(root2)
    extra = spark.createDataFrame(pdf.head(3), schema=SCHEMA)
    with pytest.raises(ValueError, match="primary sort"):
        build_index(spark, extra, store2, n_segments=1, mode="append",
                    source="x2")


def test_merge_preserves_primary_sort(spark, sorted_index, tmp_path_factory):
    """Delete some docs, consolidate all segments: the merged segment's
    docID order must still be (lang, url), and rankings + sorted_topk
    must equal a FRESH sorted build over the survivors — the
    merged-equals-fresh invariant under a comparer ([up] merge_writer
    with comparer)."""
    import shutil

    store, _oracle, pdf = sorted_index
    root2 = str(tmp_path_factory.mktemp("sorted_del"))
    shutil.copytree(store.root, root2, dirs_exist_ok=True)
    store2 = SnapshotStore(root2)
    delete_by_query(spark, store2, qf.Term("dup"))
    seg_ids = [int(s["seg_id"]) for s in store2.snapshot()["segments"]]
    merge_segments(spark, store2, seg_ids)
    assert store2.sort_spec() == "lang"  # carried through maintenance

    # fresh oracle over survivors, single segment, same sort
    from iresearch_spark.analysis.analyzers import analyze_one

    keep = [
        i for i, t in enumerate(pdf["text"])
        if "dup" not in [tok for tok, _p in analyze_one(t, "text")]
    ]
    oracle2 = OracleIndex(
        [pdf["url"][i] for i in keep],
        [pdf["text"][i] for i in keep],
        n_segments=1,
        sort_keys=[pdf["lang"][i] for i in keep],
    )
    s2 = IndexSearcher(spark, store2)
    res = s2.search_batch({0: qf.Term("table")}, k=20, with_urls=True)
    have = sorted(
        [(r["rank"], r["url"], r["score"]) for r in res.collect()]
    )
    want = oracle2.search(qf.Term("table"), k=20)
    assert [u for _r, u, _s in have] == [u for _s_, _d, u, _sc in want]
    for (_rank, _u, score), (_s_, _d, _u2, oscore) in zip(have, want):
        assert score == pytest.approx(oscore, rel=1e-12)
    got_head = [
        (r["url"]) for r in s2.sorted_topk(qf.Term("table"), k=8).collect()
    ]
    want_head = [u for _s_, _d, u in oracle2.sorted_topk(qf.Term("table"), k=8)]
    assert got_head == want_head
