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


def test_plain_query_skips_driver_stats(spark, unit_index):
    """Stats-job fusion: a plain term/And/Or query must not run a driver
    stats job — idf is derived in-kernel from the fused global-df column,
    so the searcher's df cache stays empty. Phrase slot keys, whose
    weights sum idf over variants a segment may not hold, ARE resolved
    driver-side."""
    store, _sid, oracle = unit_index
    s = IndexSearcher(spark, store)
    rows = s.search_batch(
        {0: Or(Term("w3"), Term("w7"))}, k=5, with_urls=True
    ).collect()
    assert ("text", "w3") not in s._df_cache
    assert ("text", "w7") not in s._df_cache
    want = oracle.search(Or(Term("w3"), Term("w7")), k=5)
    got = sorted(
        (r["rank"], r["seg_id"], r["doc_id"], r["url"], r["score"])
        for r in rows
    )
    assert [(seg, doc, url, sc) for _rank, seg, doc, url, sc in got] == want
    s.search_batch({1: Phrase(["w1", "w2"])}, k=5).count()
    assert ("text", "w1") in s._df_cache and ("text", "w2") in s._df_cache


def test_fuzzy_transpositions_rank_identical(searcher, unit_index):
    """F8 with_transpositions: OSA expansion differs from plain Levenshtein
    (w21 is one adjacent swap from w12) and the engine matches the oracle
    for both metrics."""
    from iresearch_spark.query import filters as qf

    _store, _sid, oracle = unit_index
    trees = {
        0: qf.Fuzzy("w12", max_distance=1, with_transpositions=True),
        1: qf.Fuzzy("w12", max_distance=1, with_transpositions=False),
        2: qf.Fuzzy("w102", max_distance=2, with_transpositions=True),
    }
    assert "w21" in oracle.expand(trees[0])
    assert "w21" not in oracle.expand(trees[1])
    got = _spark_results(searcher, trees, k=15)
    for qid, tree in trees.items():
        want = oracle.search(tree, k=15)
        have = got.get(qid, [])
        assert len(have) == len(want), qid
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url, score) == (oseg, odoc, ourl, oscore), qid


def test_column_exists_is_distributed(spark, unit_index, monkeypatch):
    """F11 must never materialize the existence set on the driver: the
    whole-corpus existence set (1000 docs) resolves with ZERO
    DataFrame.collect calls on the match path."""
    from pyspark.sql import DataFrame

    from iresearch_spark.query import filters as qf
    from iresearch_spark.query.executor import IndexSearcher

    store, sid, oracle = unit_index
    s = IndexSearcher(spark, store, sid)
    collected: list[int] = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    n = s.match_docs(qf.ColumnExists("lang")).count()
    assert n == oracle.n_docs
    assert collected == [], "ColumnExists resolution collected rows to the driver"


def test_column_exists_and_docset(spark, unit_index):
    """F11 column-existence + F18 cached doc-set filters."""
    from iresearch_spark.query import filters as qf
    from iresearch_spark.query.executor import IndexSearcher

    store, sid, oracle = unit_index
    s = IndexSearcher(spark, store, sid)
    # lang is non-null for every doc: ColumnExists alone matches all docs
    n = s.search(qf.ColumnExists("lang"), k=1 << 30, with_urls=False).count()
    assert n == oracle.n_docs
    # And(term, exists) = term ranking with every score shifted by +1.0
    base = [
        (r["seg_id"], r["doc_id"], round(r["score"], 9))
        for r in s.search(qf.Term("w3"), k=10, with_urls=False).collect()
    ]
    shifted = [
        (r["seg_id"], r["doc_id"], round(r["score"] - 1.0, 9))
        for r in s.search(
            qf.And(qf.Term("w3"), qf.ColumnExists("lang")), k=10, with_urls=False
        ).collect()
    ]
    assert base == shifted
    # explicit DocSet: exactly the requested ids at boost score
    ds = qf.DocSet({0: [1, 2, 3], 1: [5]}, boost=2.5)
    got = sorted(
        (r["seg_id"], r["doc_id"], r["score"])
        for r in s.search(ds, k=10, with_urls=False).collect()
    )
    assert got == [(0, 1, 2.5), (0, 2, 2.5), (0, 3, 2.5), (1, 5, 2.5)]


def test_ngram_similarity(spark, tmp_path):
    """F9: longest positional gram chain / gram count >= threshold.
    The corpus simulates an ngram-analyzed field (A4): doc text IS the
    char-bigram stream of the original value."""
    import pandas as pd

    from iresearch_spark.build import build_index
    from iresearch_spark.query import filters as qf
    from iresearch_spark.query.executor import IndexSearcher
    from iresearch_spark.store import SnapshotStore

    corpus = pd.DataFrame(
        {
            "url": ["a", "b", "c", "d"],
            "warc_ts": pd.to_datetime(["2026-01-01"] * 4),
            "html": [None] * 4,
            # target "table" -> grams: ta ab bl le
            "text": [
                "ta ab bl le xx",   # full in-order chain: sim 1.0
                "ta bl ab le",      # best chain ta,bl,le (or ta,ab,le): 0.75
                "le bl ab ta",      # reversed: best chain length 1: 0.25
                "zz yy",            # no grams: no match
            ],
            "lang": ["en"] * 4,
        }
    )
    store = SnapshotStore(str(tmp_path / "ngram_idx"))
    build_index(spark, spark.createDataFrame(corpus), store, n_segments=1, source="t")
    s = IndexSearcher(spark, store)
    flt = qf.NgramSimilarity("table", threshold=0.7, n=2)
    got = {
        r["url"]: round(r["score"], 6)
        for r in s.search(flt, k=10, with_urls=True).collect()
    }
    assert got == {"a": 1.0, "b": 0.75}
    # low threshold admits the reversed doc at 0.25
    flt2 = qf.NgramSimilarity("table", threshold=0.2, n=2)
    got2 = {
        r["url"]: round(r["score"], 6)
        for r in s.search(flt2, k=10, with_urls=True).collect()
    }
    assert got2 == {"a": 1.0, "b": 0.75, "c": 0.25}


def test_ngram_similarity_batched_lis_vs_bruteforce(spark, tmp_path):
    """The batched matrix-LIS (phase 2) must equal a doc-at-a-time
    patience LIS on random gram streams — including repeated grams,
    repeated positions and low thresholds where EVERY doc survives the
    count prefilter (VERDICT r2 item 3)."""
    import bisect
    import random

    import pandas as pd

    from iresearch_spark.build import build_index
    from iresearch_spark.query import filters as qf
    from iresearch_spark.query.executor import IndexSearcher
    from iresearch_spark.store import SnapshotStore

    rng = random.Random(1234)
    target = "table"
    grams = [target[i : i + 2] for i in range(len(target) - 1)]  # ta ab bl le
    vocab = grams + ["zz", "qq"]
    n = 60
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 14)))
        for _ in range(n)
    ]
    corpus = pd.DataFrame(
        {
            "url": [f"{i:04d}" for i in range(n)],
            "warc_ts": pd.to_datetime(["2026-01-01"] * n),
            "html": [None] * n,
            "text": texts,
            "lang": ["en"] * n,
        }
    )
    store = SnapshotStore(str(tmp_path / "ng_rand"))
    build_index(spark, spark.createDataFrame(corpus), store, n_segments=3, source="t")
    s = IndexSearcher(spark, store)

    def ref_sim(toks: list[str]) -> float:
        tails: list[int] = []
        for g in grams:
            for p in sorted(
                (i for i, t in enumerate(toks) if t == g), reverse=True
            ):
                j = bisect.bisect_left(tails, p)
                if j == len(tails):
                    tails.append(p)
                else:
                    tails[j] = p
        return len(tails) / len(grams)

    for thr in (0.2, 0.5, 0.75, 1.0):
        want = {
            f"{i:04d}": round(ref_sim(texts[i].split()), 6)
            for i in range(n)
            if ref_sim(texts[i].split()) >= thr
        }
        got = {
            r["url"]: round(r["score"], 6)
            for r in s.search(
                qf.NgramSimilarity(target, threshold=thr, n=2),
                k=1 << 20,
                with_urls=True,
            ).collect()
        }
        assert got == want, f"threshold {thr}"


def test_ngram_similarity_common_gram_prefilter(spark, tmp_path):
    """F9 at skew: a gram matching >50% of the corpus must be pruned by the
    vectorized count prefilter, not fed to the per-candidate chain search —
    results stay exact either way."""
    import pandas as pd

    from iresearch_spark.build import build_index
    from iresearch_spark.query import filters as qf
    from iresearch_spark.query.executor import IndexSearcher
    from iresearch_spark.store import SnapshotStore

    n = 120
    texts = []
    for i in range(n):
        if i < 3:
            texts.append("ta ab bl le")  # full chain, sim 1.0
        elif i < 6:
            texts.append("ta ab zz")  # half chain, sim 0.5
        else:
            texts.append("ta qq rr")  # common gram only, sim 0.25
    corpus = pd.DataFrame(
        {
            "url": [f"{i:04d}" for i in range(n)],
            "warc_ts": pd.to_datetime(["2026-01-01"] * n),
            "html": [None] * n,
            "text": texts,
            "lang": ["en"] * n,
        }
    )
    store = SnapshotStore(str(tmp_path / "ng_skew"))
    build_index(spark, spark.createDataFrame(corpus), store, n_segments=2, source="t")
    s = IndexSearcher(spark, store)
    # threshold 0.7 -> need >= 3 gram slots: the 114 'ta'-only docs are
    # prefiltered; only the 3 full-chain docs match
    got = {
        r["url"]: round(r["score"], 6)
        for r in s.search(
            qf.NgramSimilarity("table", threshold=0.7, n=2), k=50, with_urls=True
        ).collect()
    }
    assert got == {f"{i:04d}": 1.0 for i in range(3)}
    # threshold 0.5 admits the half-chain docs too
    got2 = {
        r["url"]: round(r["score"], 6)
        for r in s.search(
            qf.NgramSimilarity("table", threshold=0.5, n=2), k=50, with_urls=True
        ).collect()
    }
    assert got2 == {f"{i:04d}": (1.0 if i < 3 else 0.5) for i in range(6)}
    # threshold 0.25: every doc matches (the common gram alone qualifies)
    n_low = s.search(
        qf.NgramSimilarity("table", threshold=0.25, n=2), k=1 << 20, with_urls=False
    ).count()
    assert n_low == n


def test_duplicate_queries_dedup_and_fan_out(searcher):
    """Identical trees in a batch are evaluated once and fanned back out:
    every duplicate qid gets the full, identical result rows, and a tree
    differing only in boost is NOT merged with them."""
    base = Phrase(("w0", "w1"))
    batch = {
        7: Term("w2"),
        11: base,
        23: Phrase(("w0", "w1")),  # equal by value, distinct object
        31: Term("w2"),
        41: Term("w2", boost=2.0),  # must not dedup with qid 7/31
    }
    got = _spark_results(searcher, batch, k=5)
    for qid in batch:
        solo = _spark_results(searcher, {qid: batch[qid]}, k=5)
        assert got.get(qid, []) == solo.get(qid, []), qid
    assert got[7] == got[31]
    if got.get(7) and got.get(41):
        # same docs, doubled scores — proves the boosted twin ran separately
        assert [r[2] for r in got[7]] == [r[2] for r in got[41]]
        assert all(
            abs(a[4] * 2.0 - b[4]) < 1e-9 for a, b in zip(got[7], got[41])
        )


def test_tail_elision_two_pass_matches_ship_all(searcher):
    """The scored-head shuffle elision must be invisible: a capped
    expansion whose scored head cannot fill k (scored_terms_limit=1 →
    pass-2 triggers) and an uncapped one (pass-1 suffices) both return
    exactly what a full-shipping run returns, per tie mode."""
    from iresearch_spark.query.filters import Prefix

    batches = {
        "triggered": {0: Prefix("w", scored_terms_limit=1)},
        "untriggered": {0: Prefix("w", scored_terms_limit=64)},
        "mixed": {
            0: Prefix("w1", scored_terms_limit=1),
            1: Prefix("w2", scored_terms_limit=64),
            2: Term("w3"),
        },
    }
    for label, batch in batches.items():
        for tie in ("segdoc", "url"):
            lean = searcher.search_batch(
                batch, k=10, with_urls=True, tie=tie, score_round=6
            ).collect()
            full = searcher.search_batch(
                batch, k=10, with_urls=True, tie=tie, score_round=6,
                _ship_all=True,
            ).collect()
            assert [tuple(r) for r in lean] == [tuple(r) for r in full], (
                label,
                tie,
            )


def test_with_cols_stored_column_retrieval(searcher, unit_corpus):
    """Columnstore value reads ([up] core/formats/columnstore2 /
    ArangoSearch storedValues): with_cols appends stored doc columns to
    each hit via the same broadcast top-k join as urls — values must
    equal the source corpus row's, under both tie modes and with/without
    urls."""
    import pandas as pd

    flt = Term("w3")
    by_url = unit_corpus.set_index("url")
    for kw in (
        {"with_urls": True},
        {"with_urls": True, "tie": "url"},
        {"with_urls": False, "with_cols": ("url", "lang")},
    ):
        rows = searcher.search_batch(
            {0: flt}, k=8, with_cols=kw.pop("with_cols", ("lang", "warc_ts")),
            **kw,
        ).collect()
        assert rows
        for r in rows:
            src = by_url.loc[r["url"]]
            if "lang" in r.asDict():
                assert r["lang"] == src["lang"]
            if "warc_ts" in r.asDict():
                assert pd.Timestamp(r["warc_ts"]) == pd.Timestamp(src["warc_ts"])
    # ranks/scores are unchanged by the column fetch
    base = searcher.search_batch({0: flt}, k=8).collect()
    aug = searcher.search_batch({0: flt}, k=8, with_cols=("lang",)).collect()
    assert [(r["rank"], r["url"], r["score"]) for r in aug] == [
        (r["rank"], r["url"], r["score"]) for r in base
    ]
    # unknown column fails loudly
    with pytest.raises(ValueError, match="not a stored doc column"):
        searcher.search_batch({0: flt}, k=3, with_cols=("nosuch",))


def test_regexp_filter_rank_identical(searcher, unit_index):
    """Multiterm regexp (ArangoSearch REGEX_TEST / Lucene RegexpQuery):
    full-match dictionary expansion, scored like every multiterm node,
    composable with the rest of the algebra."""
    from iresearch_spark.query.filters import Regexp

    _store, _sid, oracle = unit_index
    trees = {
        0: Regexp("w1[0-9]"),
        1: Regexp("(w3|w7)"),
        2: Regexp("w1.{1,2}", scored_terms_limit=5),
        3: And(Term("w3"), Regexp("w4[0-9]")),
        4: Phrase(["w0", Regexp("w1[0-9]?")]),
    }
    got = _spark_results(searcher, trees, k=10)
    n_nonempty = 0
    for qid, t in trees.items():
        want = oracle.search(t, k=10)
        have = got.get(qid, [])
        if want:
            n_nonempty += 1
        assert len(have) == len(want), (qid, t)
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url) == (oseg, odoc, ourl), (qid, t, rank)
            assert score == oscore, (qid, t, rank)
    assert n_nonempty >= 3


def test_suggest_prefix_completion(searcher, unit_index):
    """S7 suggester: top-k dictionary completions by (global df desc,
    term asc), straight from the materialized term dictionary."""
    _store, _sid, oracle = unit_index
    rows = searcher.suggest("w1", k=8).collect()
    df = {
        t: d
        for (f, t), d in oracle.df.items()
        if f == "text" and t.startswith("w1")
    }
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    assert [(r["term"], r["df"]) for r in rows] == want
    assert len(rows) == 8


def test_search_page_and_count(searcher, unit_index):
    """Deep pagination: page 2 re-ranked 1..k equals ranks 11..20 of the
    global order; count_docs equals the oracle's full match-set size."""
    _store, _sid, oracle = unit_index
    flt = Term("w3")
    full = searcher.search_batch({0: flt}, k=20).collect()
    page = searcher.search_page(flt, k=10, offset=10).collect()
    assert [
        (r["rank"], r["seg_id"], r["doc_id"], r["score"]) for r in page
    ] == [
        (r["rank"] - 10, r["seg_id"], r["doc_id"], r["score"])
        for r in full
        if r["rank"] > 10
    ]
    with pytest.raises(ValueError, match="offset"):
        searcher.search_page(flt, k=5, offset=-1)
    n = searcher.count_docs(flt)
    assert n == len(oracle.search(flt, k=10**9))
    assert searcher.count_docs(Term("nosuchterm")) == 0


def test_fuzzy_prefix_option_rank_identical(searcher, unit_index):
    """F8 fixed-prefix option (by_edit_distance_options::prefix /
    LEVENSHTEIN_MATCH prefix): exact-prefix anchor + suffix DP, rank-
    identical to the oracle, and strictly narrower than the plain fuzzy."""
    from iresearch_spark.query.filters import Fuzzy

    _store, _sid, oracle = unit_index
    trees = {
        0: Fuzzy("23", max_distance=1, prefix="w1"),
        1: Fuzzy("23", max_distance=1, prefix="w1", with_transpositions=True),
        2: Fuzzy("1x", max_distance=1, prefix="w", scored_terms_limit=5),
    }
    got = _spark_results(searcher, trees, k=10)
    for qid, t in trees.items():
        want = oracle.search(t, k=10)
        have = got.get(qid, [])
        assert want, t  # the generator vocabulary must exercise the prefix
        assert len(have) == len(want), (qid, t)
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url) == (oseg, odoc, ourl), (qid, t, rank)
            assert score == oscore, (qid, t, rank)
    # the anchored expansion is a subset of the unanchored one
    anchored = set(oracle.expand_weighted(trees[0]))
    loose = {
        (t, w)
        for t, w in oracle.expand_weighted(Fuzzy("w123", max_distance=1))
    }
    assert {t for t, _ in anchored} <= {t for t, _ in loose} | {
        t for t, _ in anchored
    }


def test_grouped_topk_collapse(searcher, unit_index, unit_corpus):
    """Field collapse: exact global top-k with <= per_group hits per
    group value, verified against the oracle's full scored match set."""
    import pandas as pd

    _store, _sid, oracle = unit_index
    flt = Term("w3")
    res = searcher.grouped_topk(flt, "lang", k=8, per_group=2).collect()
    scores = oracle.evaluate(flt)
    lang_of = dict(zip(unit_corpus["url"], unit_corpus["lang"]))
    rows = [
        (oracle.doc_url[key], lang_of[oracle.doc_url[key]], sc)
        for key, sc in scores.items()
    ]
    df = (
        pd.DataFrame(rows, columns=["url", "lang", "score"])
        .sort_values(["score", "url"], ascending=[False, True])
        .reset_index(drop=True)
    )
    df["gr"] = df.groupby("lang").cumcount() + 1
    surv = df[df["gr"] <= 2].head(8)
    assert [(r["url"], r["lang"], r["score"]) for r in res] == [
        tuple(x) for x in surv[["url", "lang", "score"]].itertuples(index=False)
    ]
    assert [r["rank"] for r in res] == list(range(1, len(res) + 1))
    # per-group constraint holds
    langs = [r["lang"] for r in res]
    assert all(langs.count(v) <= 2 for v in set(langs))


def test_tail_elision_distributed_path_matches_collect(searcher, monkeypatch):
    """Above ELISION_COLLECT_MAX the pass-2 trigger check must stay a
    DataFrame (one count+min row per eligible query on the driver, never
    k·|queries| result rows). Forcing the threshold to 0 must change
    NOTHING about the results, triggered or not."""
    from iresearch_spark.query.filters import Prefix

    batches = {
        "triggered": {0: Prefix("w", scored_terms_limit=1)},
        "mixed": {
            0: Prefix("w1", scored_terms_limit=1),
            1: Prefix("w2", scored_terms_limit=64),
            2: Term("w3"),
        },
    }
    for label, batch in batches.items():
        for tie in ("segdoc", "url"):
            small = searcher.search_batch(
                batch, k=10, with_urls=True, tie=tie, score_round=6
            ).collect()
            monkeypatch.setattr(
                type(searcher), "ELISION_COLLECT_MAX", 0
            )
            big = searcher.search_batch(
                batch, k=10, with_urls=True, tie=tie, score_round=6
            ).collect()
            monkeypatch.undo()
            assert [tuple(r) for r in small] == [tuple(r) for r in big], (
                label,
                tie,
            )


def test_positional_topk_prunes_and_matches_exhaustive(spark, tmp_path):
    """Root Phrase top-k with per-block bounds: identical results to the
    exhaustive scored_all evaluation, while decoding strictly fewer lead
    blocks on a selective-anchor shape (high-scoring matches packed into
    early blocks, so θ fills fast and low-bound tail blocks are skipped)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from iresearch_spark import BM25_B, BM25_K1
    from iresearch_spark.build import build_index
    from iresearch_spark.oracle import OracleIndex
    from iresearch_spark.query import filters as qf
    from iresearch_spark.query import wand as wand_mod
    from iresearch_spark.query.executor import (
        IndexSearcher,
        _make_segment_kernel,
    )
    from iresearch_spark.store import SnapshotStore

    pad = "filler pad words here"
    urls, texts = [], []
    for i in range(2000):
        u = f"{i:05d}"
        if i < 50:  # high-tf phrase docs land in the FIRST lead blocks
            t = ("alpha beta " * 5) + pad
        elif i < 550:  # low-score matches: tf=1, long dl
            t = "alpha beta " + pad * 10
        else:
            t = "beta " + pad
        urls.append(u)
        texts.append(t)
    store = SnapshotStore(str(tmp_path / "idx"))
    sdf = spark.createDataFrame(
        list(zip(urls, texts)), "url string, text string"
    )
    sid = build_index(spark, sdf, store, n_segments=1, source="postopk")

    s = IndexSearcher(spark, store, sid)
    rows = (
        store.read_postings(spark, sid)
        .filter(F.col("term").isin(["alpha", "beta"]))
        .select(
            "seg_id", "field", "term", "blob", "skip", "bmax", "df",
            "pos_off", "pos_pay",
        )
        .collect()
    )
    pdf = pd.DataFrame(
        [
            {
                "field": r["field"],
                "term": r["term"],
                "blob": bytes(r["blob"]),
                "skip": bytes(r["skip"]),
                "bmax": bytes(r["bmax"]),
                "df": int(r["df"]),
                "pos_off": bytes(r["pos_off"]),
                "pos_pay": bytes(r["pos_pay"]) if r["pos_pay"] else b"",
            }
            for r in rows
        ]
    )
    norm = (
        store.read_norms(spark, sid)
        .filter(F.col("fidx") == 0)
        .select("seg_id", "fidx", "dls_bin")
        .collect()[0]
    )
    norms_pdf = pd.DataFrame(
        {
            "seg_id": [int(norm["seg_id"])],
            "fidx": [0],
            "dls_bin": [bytes(norm["dls_bin"])],
        }
    )
    tree = qf.Phrase(["alpha", "beta"], field="text")
    idf = {
        ("text", t): s.idf(
            int(pdf.loc[pdf["term"] == t, "df"].sum())
        )
        for t in ("alpha", "beta")
    }

    def run(scored_all):
        kern = _make_segment_kernel(
            {0: tree}, idf, {"text": s.avgdl}, ["text"],
            BM25_K1, BM25_B, 10, True, score_round=6,
            n_docs=s.n_docs, scored_all=scored_all,
        )
        wand_mod.INSTRUMENT = []
        try:
            out = kern(pdf, norms_pdf)
        finally:
            readers = wand_mod.INSTRUMENT
            wand_mod.INSTRUMENT = None
        dec = {  # decode counts keyed by df (alpha is the rarer lead)
            r.df: (len(r.decoded), r.n_blocks) for r in readers
        }
        res = sorted(
            (int(r.doc_id), float(r.score)) for r in out.itertuples()
        )
        return res, dec

    pruned, dec_p = run(False)
    full_all, dec_f = run(True)
    exhaustive_topk = sorted(
        sorted(full_all, key=lambda kv: (-kv[1], kv[0]))[:10]
    )
    assert pruned == exhaustive_topk
    alpha_df = int(pdf.loc[pdf["term"] == "alpha", "df"].sum())
    dec_alpha_p, nb_alpha = dec_p[alpha_df]
    dec_alpha_f, _ = dec_f[alpha_df]
    assert nb_alpha >= 4  # the lead list really spans multiple blocks
    assert dec_alpha_f == nb_alpha  # exhaustive path decodes the lead fully
    assert dec_alpha_p < dec_alpha_f  # pruned path skipped tail blocks


def test_tail_elision_large_batch_natural_threshold(searcher, unit_corpus):
    """VERDICT r4 #8: a genuinely large batch (200 queries x k=1000 ->
    k*|batch| = 200k > ELISION_COLLECT_MAX) must take the DataFrame-union
    large-batch branch NATURALLY (no forced threshold) and return exactly
    what a full-shipping run returns.  The persist slot doubles as the
    branch marker — only the large-batch path sets it."""
    from iresearch_spark.query.filters import Prefix

    words = sorted(
        {w for t in unit_corpus["text"].tolist()[:200] for w in t.split()}
    )
    prefixes = sorted({w[:2] for w in words if len(w) >= 2})
    batch = {
        qid: Prefix(
            prefixes[qid % len(prefixes)],
            scored_terms_limit=1 + (qid % 3),
        )
        for qid in range(200)
    }
    searcher.close()
    assert searcher._elision_persisted is None
    lean = searcher.search_batch(
        batch, k=1000, with_urls=False, score_round=6
    ).collect()
    assert searcher._elision_persisted is not None  # large branch taken
    full = searcher.search_batch(
        batch, k=1000, with_urls=False, score_round=6, _ship_all=True
    ).collect()
    key = lambda r: (r["qid"], r["rank"])
    assert sorted(map(tuple, lean), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, full), key=lambda t: (t[0], t[1])
    )
    searcher.close()
    assert searcher._elision_persisted is None
