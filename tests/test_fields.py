"""Field-qualified indexing + querying (SURVEY.md §1.1, §2c: every filter
takes a field; per-field postings, norms, df/avgdl statistics — the
document model of [up] core/index/index_writer.hpp). End-to-end
rank-identity of the Spark engine vs the multi-field oracle, analyzer
fields included, plus the F17 matched-but-unscored expansion semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from iresearch_spark.build import build_index
from iresearch_spark.build.merge import delete_by_query, merge_segments
from iresearch_spark.fields import FieldSpec
from iresearch_spark.oracle.model import OracleIndex
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher
from iresearch_spark.store import SnapshotStore

CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "source string"
)

FIELDS = [
    FieldSpec("text", "__text__", "text", offsets=True),
    FieldSpec("src", "source", "delimiter:-"),
    FieldSpec("srcng", "source", "ngram:2,3"),
    FieldSpec("stem", "text", "text|stem"),
    FieldSpec("mh", "__text__", "minhash:4(text)"),
]


def _corpus(n=80, seed=3):
    rng = np.random.default_rng(seed)
    words = [
        "table", "scan", "hash", "join", "merge", "data", "dup", "order",
        "filter", "running", "caresses", "spark",
    ]
    texts = [
        " ".join(rng.choice(words, rng.integers(3, 14))) for _ in range(n)
    ]
    srcs = [f"cc-main-{2020 + i % 4}-{i % 3}" for i in range(n)]
    return pd.DataFrame(
        {
            "url": [f"{i:04d}" for i in range(n)],
            "warc_ts": pd.to_datetime(["2026-01-01"] * n),
            "html": [None] * n,
            "text": texts,
            "lang": ["en"] * n,
            "source": srcs,
        }
    )


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    pdf = _corpus()
    store = SnapshotStore(str(tmp_path_factory.mktemp("mf_idx")))
    build_index(
        spark,
        spark.createDataFrame(pdf, schema=CORPUS_SCHEMA),
        store,
        n_segments=3,
        fields=FIELDS,
        source="mf",
    )
    oracle = OracleIndex(
        pdf["url"].tolist(),
        pdf["text"].tolist(),
        n_segments=3,
        extra_fields=[
            ("src", pdf["source"].tolist(), "delimiter:-"),
            ("srcng", pdf["source"].tolist(), "ngram:2,3"),
            ("stem", pdf["text"].tolist(), "text|stem"),
            ("mh", pdf["text"].tolist(), "minhash:4(text)"),
        ],
    )
    return store, oracle, pdf


def _mh_terms(s: str) -> list[str]:
    from iresearch_spark.analysis.analyzers import analyze_one

    return [t for t, _p in analyze_one(s, "minhash:4(text)")]


QUERY_SET = {
    0: qf.Term("table"),
    1: qf.And(qf.Term("table"), qf.Term("main", field="src")),
    2: qf.Term("2021", field="src"),
    3: qf.Or(qf.Term("dup"), qf.Term("cc", field="srcng"), qf.Term("2022", field="src")),
    4: qf.SamePosition(["ma", "mai"], field="srcng"),
    5: qf.Phrase(["cc", "main"], field="src"),
    6: qf.Phrase(["table", qf.Prefix("ha")], field="text"),
    7: qf.Prefix("20", field="src"),
    8: qf.Fuzzy("tble", max_distance=1, with_transpositions=True),
    9: qf.Term("runn", field="stem"),
    10: qf.Phrase(["order", qf.Fuzzy("filt", max_distance=1)], field="stem"),
    11: qf.Not(qf.Term("main", field="src"), qf.Term("dup")),
    12: qf.NgramSimilarity("cc-main", threshold=0.6, n=2, field="srcng"),
    # A10 minhash field: idf-weighted signature overlap via plain Terms
    13: qf.Terms(_mh_terms("table scan hash join"), field="mh"),
    # exact-set probe: a doc-identical token set shares the whole signature
    14: qf.Or(
        qf.Terms(_mh_terms("merge data dup"), field="mh"),
        qf.Term("spark"),
        min_match=1,
    ),
}


def _compare(spark, store, oracle, queries, k=12):
    s = IndexSearcher(spark, store)
    res = s.search_batch(queries, k=k, with_urls=True)
    got = {}
    for r in res.collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["seg_id"], r["doc_id"], r["url"], r["score"])
        )
    for v in got.values():
        v.sort()
    for qid, tree in queries.items():
        want = oracle.search(tree, k=k)
        have = got.get(qid, [])
        assert len(have) == len(want), (qid, len(have), len(want))
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url) == (oseg, odoc, ourl), qid
            assert score == pytest.approx(oscore, abs=1e-12), qid


def test_multifield_rank_identical(spark, mf_index):
    store, oracle, _ = mf_index
    _compare(spark, store, oracle, QUERY_SET)
    # sanity: the cross-field queries actually match something
    assert oracle.search(QUERY_SET[1], k=5)
    assert oracle.search(QUERY_SET[4], k=5)
    assert oracle.search(QUERY_SET[9], k=5)


def test_field_stats_are_per_field(spark, mf_index):
    store, oracle, _ = mf_index
    s = IndexSearcher(spark, store)
    assert set(s.field_names) == {"text", "src", "srcng", "stem", "mh"}
    for f in s.field_names:
        assert s.avgdl_by_field[f] == pytest.approx(oracle.avgdl_by_field[f])
    # distinct per-field dictionaries in the postings table
    fields = {
        r["field"]
        for r in store.read_postings(spark).select("field").distinct().collect()
    }
    assert fields == {"text", "src", "srcng", "stem", "mh"}


def test_matched_unscored_expansion(spark, mf_index):
    """F17: expansions beyond scored_terms_limit still MATCH but score 0
    ([up] core/search/multiterm_query.cpp limited_sample_collector)."""
    store, oracle, _ = mf_index
    s = IndexSearcher(spark, store)
    capped = qf.Prefix("20", field="src", scored_terms_limit=2)
    full = qf.Prefix("20", field="src", scored_terms_limit=64)
    # 4 year terms exist (2020..2023) -> capped scores only the top-2 by df
    tw = dict(oracle.expand_weighted(capped))
    assert len(tw) == 4 and sum(1 for w in tw.values() if w > 0) == 2
    n_capped = s.match_docs(capped).count()
    n_full = s.match_docs(full).count()
    assert n_capped == n_full == oracle.n_docs  # every doc has a year term
    _compare(spark, store, oracle, {0: capped, 1: qf.And(qf.Term("table"), capped)})


def test_postings_scan_pushdown(spark, mf_index):
    """The (field, term) predicates must reach the parquet scan as pushed
    filters — on the term-sorted files this is what gives the burst-trie-
    style block skipping at scale (SURVEY.md §1.6)."""
    store, _oracle, _pdf = mf_index
    from pyspark.sql import functions as F

    post = store.read_postings(spark)
    plan = (
        post.filter((F.col("field") == "text") & (F.col("term") == "table"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters") :][:200]
    assert "term" in pushed and "field" in pushed, pushed


def test_offsets_spans(spark, mf_index):
    """A8: occurrences() returns exact (pos, start, length) spans for the
    offsets-enabled field, and -1 sentinels for fields without the
    feature."""
    from iresearch_spark.analysis.analyzers import analyze_one_spans

    store, oracle, pdf = mf_index
    s = IndexSearcher(spark, store)
    texts = dict(zip(pdf["url"], pdf["text"]))
    docs = {
        (r["seg_id"], r["doc_id"]): r["url"]
        for r in store.read_docs(spark).select("seg_id", "doc_id", "url").collect()
    }
    occ = s.occurrences("table", "text").collect()
    assert occ
    for r in occ:
        text = texts[docs[(r["seg_id"], r["doc_id"])]]
        spans = {
            p: (st, ln)
            for t, p, st, ln in analyze_one_spans(text, "text")
            if t == "table"
        }
        assert spans[r["pos"]] == (r["start"], r["length"])
        assert text[r["start"] : r["start"] + r["length"]] == "table"
    # src field was indexed without offsets -> -1 sentinels
    occ2 = s.occurrences("main", "src").limit(5).collect()
    assert occ2 and all(r["start"] == -1 and r["length"] == -1 for r in occ2)


def test_offsets_survive_merge(spark, mf_index, tmp_path):
    """Spans must be remapped and preserved through delete + merge."""
    import shutil

    store, _oracle, pdf = mf_index
    work = str(tmp_path / "mf_span_copy")
    shutil.copytree(store.root, work)
    wstore = SnapshotStore(work)
    delete_by_query(spark, wstore, qf.Term("2020", field="src"))
    seg_ids = [int(x["seg_id"]) for x in wstore.snapshot()["segments"]]
    merge_segments(spark, wstore, seg_ids)
    s = IndexSearcher(spark, wstore)
    texts = dict(zip(pdf["url"], pdf["text"]))
    docs = {
        (r["seg_id"], r["doc_id"]): r["url"]
        for r in wstore.read_docs(spark).select("seg_id", "doc_id", "url").collect()
    }
    occ = s.occurrences("table", "text").collect()
    assert occ
    for r in occ:
        text = texts[docs[(r["seg_id"], r["doc_id"])]]
        assert text[r["start"] : r["start"] + r["length"]] == "table"


def test_multifield_maintenance_roundtrip(spark, mf_index, tmp_path):
    """Delete + merge on a multi-field index keeps per-field stats exact:
    the compacted index equals a fresh build over the survivors."""
    import shutil

    store, oracle, pdf = mf_index
    work = str(tmp_path / "mf_copy")
    shutil.copytree(store.root, work)
    wstore = SnapshotStore(work)
    victims = {
        r["url"]
        for r in IndexSearcher(spark, wstore)
        .search_batch({0: qf.Term("2020", field="src")}, k=1 << 30, with_urls=True)
        .collect()
    }
    assert victims
    delete_by_query(spark, wstore, qf.Term("2020", field="src"))
    seg_ids = [int(x["seg_id"]) for x in wstore.snapshot()["segments"]]
    merge_segments(spark, wstore, seg_ids)
    survivors = pdf[~pdf["url"].isin(victims)]
    fresh = SnapshotStore(str(tmp_path / "mf_fresh"))
    build_index(
        spark,
        spark.createDataFrame(survivors, schema=CORPUS_SCHEMA),
        fresh,
        n_segments=2,
        fields=FIELDS,
        source="fresh",
    )
    fr_oracle = OracleIndex(
        survivors["url"].tolist(),
        survivors["text"].tolist(),
        n_segments=2,
        extra_fields=[
            ("src", survivors["source"].tolist(), "delimiter:-"),
            ("srcng", survivors["source"].tolist(), "ngram:2,3"),
            ("stem", survivors["text"].tolist(), "text|stem"),
        ],
    )

    def ranked(st):
        s = IndexSearcher(spark, st)
        res = s.search_batch(
            {qid: t for qid, t in QUERY_SET.items()},
            k=10,
            with_urls=True,
            tie="url",
        )
        return [
            (r["qid"], r["rank"], r["url"], round(r["score"], 9))
            for r in res.collect()
        ]

    assert ranked(wstore) == ranked(fresh)
    # and the fresh build itself is oracle-exact
    _compare(spark, fresh, fr_oracle, {0: QUERY_SET[1], 1: QUERY_SET[9]})


def test_phrase_gap_offsets(spark, mf_index):
    """F6 with explicit slot offsets ([up] by_phrase push_back offs):
    (0, 2) matches term0, any token, term1 — a strict superset of the
    consecutive phrase only when the corpus has gapped occurrences."""
    store, oracle, _ = mf_index
    gapped = qf.Phrase(["table", "hash"], offsets=(0, 2))
    part_gap = qf.Phrase(["table", qf.Prefix("ha")], offsets=(0, 3))
    _compare(spark, store, oracle, {0: gapped, 1: part_gap}, k=30)
    assert oracle.search(gapped, k=5)  # the corpus must exercise the gap
    # offsets are anchored on differences: (5, 7) == (0, 2)
    assert oracle.evaluate(qf.Phrase(["table", "hash"], offsets=(5, 7))) == \
        oracle.evaluate(gapped)
    with pytest.raises(ValueError):
        qf.Phrase(["a", "b"], offsets=(0,))
    with pytest.raises(ValueError):
        qf.Phrase(["a", "b"], offsets=(2, 2))


def test_wildcard_escape(spark, tmp_path_factory):
    """F7 escape syntax ([up] wildcard_utils): '\\%'/'\\_' match the
    literal chars — meaningful on identity-analyzed fields whose terms
    contain '%' and '_'."""
    vals = ["a%b", "axb", "a_b", "aXb", "100%", "100x", r"back\slash"]
    urls = [f"{i:02d}" for i in range(len(vals))]
    store = SnapshotStore(str(tmp_path_factory.mktemp("wc_idx")))
    sdf = spark.createDataFrame(
        list(zip(urls, vals, vals)), "url string, text string, source string"
    )
    fields = [
        FieldSpec("text", "__text__", "text"),
        FieldSpec("srcid", "source", "identity"),
    ]
    build_index(spark, sdf, store, n_segments=2, fields=fields, source="wc")
    oracle = OracleIndex(
        urls, vals, n_segments=2,
        extra_fields=[("srcid", vals, "identity")],
    )
    queries = {
        0: qf.Wildcard(r"a\%b", field="srcid"),   # only the literal a%b
        1: qf.Wildcard("a%b", field="srcid"),     # a%b, axb, a_b, aXb
        2: qf.Wildcard(r"a\_b", field="srcid"),   # only a_b
        3: qf.Wildcard(r"100\%", field="srcid"),
        4: qf.Wildcard(r"back\\%", field="srcid"),  # literal backslash + any
        5: qf.Wildcard("back\\", field="srcid"),  # lenient trailing escape
    }
    s = IndexSearcher(spark, store)
    res = s.search_batch(queries, k=20, with_urls=True)
    got: dict[int, set] = {}
    for r in res.collect():
        got.setdefault(r["qid"], set()).add(r["url"])
    for qid, tree in queries.items():
        want = {u for _s, _d, u, _sc in oracle.search(tree, k=20)}
        assert got.get(qid, set()) == want, (qid, got.get(qid), want)
    assert got[0] == {"00"}
    assert got[1] == {"00", "01", "02", "03"}
    assert got[2] == {"02"}
    assert got[3] == {"04"}
    assert got[4] == {"06"}
