"""A7 numeric token stream + F5 by_granular_range (SURVEY.md §2b/§2c;
[up] core/analysis/token_streams.hpp :: numeric_token_stream,
[up] core/search/granular_range_filter.cpp).

The trie invariant everything rests on: every value inside [lo, hi] is
covered by EXACTLY ONE decomposed sub-range (so multiterm scoring sees one
term per matching doc), every value outside by none."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from iresearch_spark.analysis.analyzers import (
    analyze_batch_spans,
    analyze_one_spans,
)
from iresearch_spark.analysis.numeric import (
    granular_term_ranges,
    numeric_term,
    numeric_terms,
    split_range_u64,
    to_unsigned,
)
from iresearch_spark.build import build_index
from iresearch_spark.fields import FieldSpec
from iresearch_spark.oracle.model import OracleIndex
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher
from iresearch_spark.store import SnapshotStore

I64_MIN, I64_MAX = -(1 << 63), (1 << 63) - 1


def test_encoding_order_preserving():
    rng = random.Random(7)
    vals = [rng.randrange(I64_MIN, I64_MAX + 1) for _ in range(500)]
    vals += [I64_MIN, -1, 0, 1, I64_MAX]
    terms = {v: numeric_term(0, to_unsigned(v)) for v in vals}
    sv = sorted(vals)
    st = sorted(vals, key=lambda v: terms[v])
    assert sv == st


def test_split_range_exact_cover():
    """Each in-range value covered exactly once, out-of-range never —
    randomized over steps, magnitudes, and edge alignments."""
    rng = random.Random(11)
    for step in (1, 2, 4, 8, 16, 32, 64):
        for _ in range(120):
            lo = rng.randrange(I64_MIN, I64_MAX + 1)
            span = rng.choice(
                [0, 1, rng.randrange(1, 1 << rng.randrange(1, 48))]
            )
            hi = min(lo + span, I64_MAX)
            ranges = split_range_u64(to_unsigned(lo), to_unsigned(hi), step)
            probes = {lo, hi, (lo + hi) // 2, lo - 1, hi + 1, lo + 1, hi - 1}
            for v in probes:
                if not I64_MIN <= v <= I64_MAX:
                    continue
                h = to_unsigned(v)
                n = sum(1 for s, a, b in ranges if a <= (h >> s) <= b)
                assert n == (1 if lo <= v <= hi else 0), (step, lo, hi, v)


def test_split_range_full_domain_and_empty():
    assert split_range_u64(0, (1 << 64) - 1, 16) == [(48, 0, 65535)]
    assert granular_term_ranges(5, 4, 16) == []
    # exclusive bounds collapse correctly
    assert granular_term_ranges(5, 5, 16, include_lo=True, include_hi=False) == []
    one = granular_term_ranges(5, 5, 16, include_lo=True, include_hi=True)
    assert len(one) == 1 and one[0][0] == one[0][1] == numeric_term(
        0, to_unsigned(5)
    )


def test_term_ranges_match_per_value_terms():
    """String-space agreement: v in range <=> exactly one of v's emitted
    terms falls inside one decomposed term range."""
    rng = random.Random(23)
    for step in (4, 8, 16):
        for _ in range(60):
            lo = rng.randrange(-10_000, 10_000)
            hi = lo + rng.randrange(0, 20_000)
            trs = granular_term_ranges(lo, hi, step)
            for v in (lo - 1, lo, (lo + hi) // 2, hi - 1, hi, hi + 1):
                terms = numeric_terms(v, step)
                n = sum(1 for a, b in trs for t in terms if a <= t <= b)
                assert n == (1 if lo <= v < hi else 0), (step, lo, hi, v)


def test_batch_kernel_twin():
    vals = [
        "42", "-7", None, "", "  123 ",
        str(I64_MAX), str(I64_MIN), "0", "-1",
    ]
    s = pd.Series(vals, dtype=object)
    for spec in ("numeric", "numeric:8", "numeric:32"):
        flat, counts, pos, starts, lens = analyze_batch_spans(s, spec)
        i = 0
        for v, c in zip(vals, counts):
            one = analyze_one_spans(v, spec)
            got = [
                (flat[j], int(pos[j]), int(starts[j]), int(lens[j]))
                for j in range(i, i + int(c))
            ]
            assert got == one, (v, spec)
            i += int(c)


def test_bad_spec_and_bad_value():
    with pytest.raises(ValueError):
        analyze_one_spans("1", "numeric:0")
    with pytest.raises(ValueError):
        analyze_one_spans("notanint", "numeric:16")


# ----------------------------------------------------- engine vs oracle

CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "price string"
)

NUM_FIELDS = [
    FieldSpec("text", "__text__", "text"),
    FieldSpec("num", "price", "numeric:8"),
]


def _corpus(n=90, seed=5):
    rng = np.random.default_rng(seed)
    words = ["table", "scan", "hash", "join", "data", "dup"]
    texts = [
        " ".join(rng.choice(words, rng.integers(3, 10))) for _ in range(n)
    ]
    # cluster prices so coarse trie levels get real df spread; include
    # negatives and repeats
    prices = [int(rng.integers(-500, 4000)) for _ in range(n - 3)]
    prices += [0, -500, 3999]
    return pd.DataFrame(
        {
            "url": [f"{i:04d}" for i in range(n)],
            "warc_ts": pd.to_datetime(["2026-01-01"] * n),
            "html": [None] * n,
            "text": texts,
            "lang": ["en"] * n,
            "price": [str(p) for p in prices],
        }
    )


@pytest.fixture(scope="module")
def num_index(spark, tmp_path_factory):
    pdf = _corpus()
    store = SnapshotStore(str(tmp_path_factory.mktemp("num_idx")))
    build_index(
        spark,
        spark.createDataFrame(pdf, schema=CORPUS_SCHEMA),
        store,
        n_segments=3,
        fields=NUM_FIELDS,
        source="num",
    )
    oracle = OracleIndex(
        pdf["url"].tolist(),
        pdf["text"].tolist(),
        n_segments=3,
        extra_fields=[("num", pdf["price"].tolist(), "numeric:8")],
    )
    return store, oracle, pdf


GRANULAR_QUERIES = {
    0: qf.GranularRange(100, 1000, step=8, field="num"),
    1: qf.GranularRange(-200, 50, step=8, field="num", include_hi=True),
    2: qf.GranularRange(None, 0, step=8, field="num"),  # open lower
    3: qf.GranularRange(3000, None, step=8, field="num"),  # open upper
    4: qf.GranularRange(
        0, 4000, step=8, field="num", scored_terms_limit=3
    ),  # F17 matched-but-unscored tail
    5: qf.And(
        qf.Term("table"),
        qf.GranularRange(-500, 2000, step=8, field="num"),
    ),
    6: qf.Boost(qf.GranularRange(256, 512, step=8, field="num"), 2.5),
    7: qf.GranularRange(
        77, 77, step=8, field="num", include_hi=True
    ),  # point range
    8: qf.GranularRange(4100, 9000, step=8, field="num"),  # empty
}


def test_granular_rank_identical(spark, num_index):
    store, oracle, _pdf = num_index
    s = IndexSearcher(spark, store)
    res = s.search_batch(GRANULAR_QUERIES, k=15, with_urls=True)
    got: dict[int, list] = {}
    for r in res.collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["seg_id"], r["doc_id"], r["url"], r["score"])
        )
    for v in got.values():
        v.sort()
    for qid, tree in GRANULAR_QUERIES.items():
        want = oracle.search(tree, k=15)
        have = got.get(qid, [])
        assert len(have) == len(want), (qid, len(have), len(want))
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url) == (oseg, odoc, ourl), (qid, rank)
            assert score == pytest.approx(oscore, rel=1e-6), (qid, rank)


def test_granular_match_set_is_exact(spark, num_index):
    """The decomposition's MATCH SET equals a brute-force value filter —
    every doc in [lo, hi) matched (weight-0 tail included), none outside."""
    store, _oracle, pdf = num_index
    s = IndexSearcher(spark, store)
    lo, hi = -100, 1500
    node = qf.GranularRange(lo, hi, step=8, field="num", scored_terms_limit=2)
    rows = s.search(node, k=len(pdf) + 5, with_urls=True).collect()
    got_urls = {r["url"] for r in rows}
    want_urls = {
        u for u, p in zip(pdf["url"], pdf["price"]) if lo <= int(p) < hi
    }
    assert got_urls == want_urls
    assert len(want_urls) > 10  # the range is genuinely selective


# ----------------------------------------------------- f64 (numericd)


def test_double_sortable_order_and_adjacency():
    from iresearch_spark.analysis.numeric import double_to_sortable

    rng = random.Random(31)
    vals = [rng.uniform(-1e12, 1e12) for _ in range(400)]
    vals += [0.0, -0.0, 1.5, -1.5, 1e-300, -1e-300, float("inf"), float("-inf")]
    sv = sorted(set(vals))
    st = sorted(set(vals), key=double_to_sortable)
    assert sv == st
    # adjacency: the next representable double is sortable+1, so the
    # exclusive-bound +-1 adjustment is exact
    import math

    for v in (1.5, -2.25, 0.0, 1e300):
        nxt = math.nextafter(v, float("inf"))
        assert double_to_sortable(nxt) == double_to_sortable(v) + 1


def test_numericd_analyzer_twin():
    vals = ["1.5", "-2.25", None, "", "3", "1e10", "-0.0"]
    s = pd.Series(vals, dtype=object)
    for spec in ("numericd", "numericd:8"):
        flat, counts, pos, starts, lens = analyze_batch_spans(s, spec)
        i = 0
        for v, c in zip(vals, counts):
            one = analyze_one_spans(v, spec)
            got = [
                (flat[j], int(pos[j]), int(starts[j]), int(lens[j]))
                for j in range(i, i + int(c))
            ]
            assert got == one, (v, spec)
            i += int(c)


def test_granular_f64_rank_identical(spark, tmp_path):
    rng = np.random.default_rng(9)
    n = 70
    words = ["table", "scan", "hash", "join"]
    scores = [round(float(x), 3) for x in rng.uniform(-5.0, 5.0, n)]
    pdf = pd.DataFrame(
        {
            "url": [f"{i:04d}" for i in range(n)],
            "warc_ts": pd.to_datetime(["2026-01-01"] * n),
            "html": [None] * n,
            "text": [
                " ".join(rng.choice(words, rng.integers(2, 8)))
                for _ in range(n)
            ],
            "lang": ["en"] * n,
            "score": [str(s) for s in scores],
        }
    )
    store = SnapshotStore(str(tmp_path / "f64idx"))
    build_index(
        spark,
        spark.createDataFrame(
            pdf,
            schema=(
                "url string, warc_ts timestamp, html binary, text string, "
                "lang string, score string"
            ),
        ),
        store,
        n_segments=2,
        fields=[
            FieldSpec("text", "__text__", "text"),
            FieldSpec("sc", "score", "numericd:8"),
        ],
        source="f64",
    )
    oracle = OracleIndex(
        pdf["url"].tolist(),
        pdf["text"].tolist(),
        n_segments=2,
        extra_fields=[("sc", pdf["score"].tolist(), "numericd:8")],
    )
    queries = {
        0: qf.GranularRange(-1.0, 2.5, step=8, dtype="f64", field="sc"),
        1: qf.GranularRange(
            0.0, None, step=8, dtype="f64", field="sc", include_lo=False
        ),
        2: qf.GranularRange(
            -5.0, 5.0, step=8, dtype="f64", field="sc",
            include_hi=True, scored_terms_limit=4,
        ),
    }
    s = IndexSearcher(spark, store)
    res = s.search_batch(queries, k=80, with_urls=True)
    got: dict[int, list] = {}
    for r in res.collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["seg_id"], r["doc_id"], r["url"], r["score"])
        )
    for v in got.values():
        v.sort()
    for qid, tree in queries.items():
        want = oracle.search(tree, k=80)
        have = got.get(qid, [])
        assert len(have) == len(want), (qid, len(have), len(want))
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url) == (oseg, odoc, ourl), (qid, rank)
            assert score == pytest.approx(oscore, rel=1e-6), (qid, rank)
    # match set vs raw values for q0
    want_urls = {
        u for u, sc in zip(pdf["url"], scores) if -1.0 <= sc < 2.5
    }
    assert {u for _, _, _, u, _ in got.get(0, [])} == want_urls
