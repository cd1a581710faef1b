"""Stored user columns (ArangoSearch storedValues / [up]
core/formats/columnstore2 user columns) + the highlights surface:
stored_cols ride the docs table verbatim, survive merges, are encrypted
at rest when string-typed, and highlights() returns A8 offset spans plus
snippets cut from the stored source column."""

import re

import pandas as pd
import pytest

from iresearch_spark.build import build_index
from iresearch_spark.build.merge import delete_by_query, merge_segments
from iresearch_spark.fields import FieldSpec
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher
from iresearch_spark.store import SnapshotStore

SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "site string, n_chars int"
)

FIELDS = [FieldSpec("text", "__text__", "text", offsets=True)]

_WORDS = [
    "alpha", "merge", "tables", "customer", "quick", "zebra", "index",
    "spark", "query", "delta",
]


def _corpus(n=40):
    texts = [
        " ".join(_WORDS[(i + j) % len(_WORDS)] for j in range(5 + i % 4))
        for i in range(n)
    ]
    return pd.DataFrame(
        {
            "url": [f"u{i:03d}" for i in range(n)],
            "warc_ts": pd.to_datetime(["2026-01-01"] * n),
            "html": [None] * n,
            "text": texts,
            "lang": ["en"] * n,
            "site": [f"site{i % 3}.example" for i in range(n)],
            "n_chars": [len(t) for t in texts],
        }
    )


@pytest.fixture(scope="module")
def stored_index(spark, tmp_path_factory):
    pdf = _corpus()
    store = SnapshotStore(str(tmp_path_factory.mktemp("storedidx")))
    build_index(
        spark,
        spark.createDataFrame(pdf, SCHEMA),
        store,
        n_segments=2,
        fields=FIELDS,
        source="stored",
        stored_cols=("text", "site", "n_chars"),
    )
    return store, pdf


def test_stored_cols_retrieved_via_with_cols(spark, stored_index):
    store, pdf = stored_index
    s = IndexSearcher(spark, store)
    rows = s.search_batch(
        {0: qf.Term("merge")}, k=10, with_cols=("text", "site", "n_chars")
    ).collect()
    assert rows
    by_url = pdf.set_index("url")
    for r in rows:
        src = by_url.loc[r["url"]]
        assert r["text"] == src["text"]
        assert r["site"] == src["site"]
        assert r["n_chars"] == src["n_chars"]


def test_stored_cols_in_manifest_and_append_contract(spark, stored_index):
    store, _ = stored_index
    snap = store.snapshot()
    assert snap["stored"] == [
        {"name": "text", "type": "string"},
        {"name": "site", "type": "string"},
        {"name": "n_chars", "type": "int"},
    ]
    extra = _corpus(4)
    extra["url"] = [f"x{i}" for i in range(4)]
    with pytest.raises(ValueError, match="stored_cols"):
        build_index(
            spark,
            spark.createDataFrame(extra, SCHEMA),
            store,
            n_segments=1,
            fields=FIELDS,
            mode="append",
            source="stored_bad_append",
        )


def test_stored_cols_reserved_and_missing_fail_fast(spark, tmp_path):
    pdf = _corpus(4)
    store = SnapshotStore(str(tmp_path / "badstored"))
    sdf = spark.createDataFrame(pdf, SCHEMA)
    with pytest.raises(ValueError, match="collides"):
        build_index(spark, sdf, store, stored_cols=("dl",), source="b1")
    with pytest.raises(ValueError, match="not a corpus column"):
        build_index(spark, sdf, store, stored_cols=("nosuch",), source="b2")


def test_stored_cols_survive_delete_and_merge(spark, stored_index, tmp_path):
    """Merged segments keep the full columnstore surface: delete some
    docs, consolidate all segments into one, stored values still equal
    the source corpus rows."""
    store, pdf = stored_index
    clone = SnapshotStore(str(tmp_path / "mergestored"))
    build_index(
        spark,
        spark.createDataFrame(pdf, SCHEMA),
        clone,
        n_segments=2,
        fields=FIELDS,
        source="stored_m",
        stored_cols=("text", "site", "n_chars"),
    )
    delete_by_query(spark, clone, qf.Term("zebra"))
    seg_ids = [int(s["seg_id"]) for s in clone.snapshot()["segments"]]
    merge_segments(spark, clone, seg_ids)
    s = IndexSearcher(spark, clone)
    rows = s.search_batch(
        {0: qf.Term("merge")}, k=20, with_cols=("text", "site", "n_chars")
    ).collect()
    assert rows
    by_url = pdf.set_index("url")
    for r in rows:
        src = by_url.loc[r["url"]]
        assert r["text"] == src["text"]
        assert r["site"] == src["site"]
        assert r["n_chars"] == src["n_chars"]
        assert "zebra" not in r["text"]


def test_stored_string_cols_encrypted_at_rest(spark, tmp_path):
    """String-typed stored columns must not appear in plaintext anywhere
    under the index root; retrieval round-trips through the cipher."""
    from iresearch_spark.store.crypto import derive_key

    pdf = _corpus(12)
    marker = "zzsecretmarkerzz"
    pdf.loc[0, "site"] = marker
    store = SnapshotStore(str(tmp_path / "encstored"), key=derive_key("k1"))
    build_index(
        spark,
        spark.createDataFrame(pdf, SCHEMA),
        store,
        n_segments=1,
        fields=FIELDS,
        source="enc_stored",
        stored_cols=("site",),
    )
    import pathlib

    blob = b"".join(
        p.read_bytes()
        for p in pathlib.Path(store.root).rglob("*")
        if p.is_file()
    )
    assert marker.encode() not in blob
    s = IndexSearcher(spark, store)
    rows = s.search_batch(
        {0: qf.Term(_WORDS[0])}, k=40, with_cols=("site",)
    ).collect()
    got = {r["url"]: r["site"] for r in rows}
    assert got.get("u000") == marker


def _expected_spans(text: str, terms: set[str]):
    out = []
    for m in re.finditer(r"[a-z0-9]+", text.lower()):
        if m.group(0) in terms:
            out.append((m.start(), m.end() - m.start()))
    return out


def test_highlights_spans_and_snippet(spark, stored_index):
    store, pdf = stored_index
    s = IndexSearcher(spark, store)
    flt = qf.Or(qf.Term("merge"), qf.Term("customer"))
    rows = s.highlights(
        flt, k=10, source_col="text", context=10, max_spans=8
    ).collect()
    assert rows
    by_url = pdf.set_index("url")
    for r in rows:
        text = by_url.loc[r["url"]]["text"]
        exp = _expected_spans(text, {"merge", "customer"})
        got = [(sp["start"], sp["length"]) for sp in r["spans"]]
        assert got == exp[:8]
        assert r["n_matches"] == len(exp)
        st, ln = exp[0]
        lo = max(0, st - 10)
        assert r["snippet"] == text[lo : st + ln + 10]
        # the snippet really contains a matched surface form
        assert any(w in r["snippet"] for w in ("merge", "customer"))
    # ranks/scores identical to the plain top-k
    plain = s.search_batch({0: flt}, k=10).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in rows] == [
        (r["rank"], r["doc_id"], r["score"]) for r in plain
    ]


def test_highlights_expansion_terms_are_highlighted(spark, stored_index):
    """Multiterm queries highlight their RESOLVED expansions: a prefix
    query's spans cover every term the prefix expanded to."""
    store, pdf = stored_index
    s = IndexSearcher(spark, store)
    rows = s.highlights(
        qf.Prefix("qu"), k=10, source_col="text", context=6
    ).collect()
    assert rows
    by_url = pdf.set_index("url")
    for r in rows:
        text = by_url.loc[r["url"]]["text"]
        exp = _expected_spans(text, {"quick", "query"})
        got = [(sp["start"], sp["length"]) for sp in r["spans"]]
        assert got == exp[:8]


def test_highlights_without_source_col(spark, stored_index):
    store, _ = stored_index
    s = IndexSearcher(spark, store)
    rows = s.highlights(qf.Term("merge"), k=5).collect()
    assert rows
    assert "snippet" not in rows[0].asDict()
    assert all(r["n_matches"] >= 1 and len(r["spans"]) >= 1 for r in rows)


def _toks(text: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def test_facets_over_stored_col(spark, stored_index):
    """Facets group the FULL match set (not top-k) by a stored user
    column with default n_docs/sum_dl aggregates."""
    store, pdf = stored_index
    s = IndexSearcher(spark, store)
    rows = s.facets(qf.Term("merge"), group_by=("site",)).collect()
    m = pdf[pdf["text"].str.contains(r"\bmerge\b")]
    exp = {
        site: (len(g), sum(len(_toks(t)) for t in g["text"]))
        for site, g in m.groupby("site")
    }
    got = {r["site"]: (r["n_docs"], r["sum_dl"]) for r in rows}
    assert got == exp
    assert [r["site"] for r in rows] == sorted(got)


def test_facets_custom_aggs_and_alldocs(spark, stored_index):
    from pyspark.sql import functions as F

    store, pdf = stored_index
    s = IndexSearcher(spark, store)
    rows = s.facets(
        qf.AllDocs(),
        group_by=("lang",),
        aggs={
            "n_docs": F.count(F.lit(1)).cast("long"),
            "max_chars": F.max("n_chars").cast("int"),
        },
    ).collect()
    assert len(rows) == 1
    assert rows[0]["lang"] == "en"
    assert rows[0]["n_docs"] == len(pdf)
    assert rows[0]["max_chars"] == int(pdf["n_chars"].max())


def test_facets_unknown_column_fails(spark, stored_index):
    store, _ = stored_index
    s = IndexSearcher(spark, store)
    with pytest.raises(ValueError, match="not stored doc columns"):
        s.facets(qf.Term("merge"), group_by=("nosuch",))
