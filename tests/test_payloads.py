"""A8 payload attribute ([up] core/analysis/token_attributes.hpp ::
payload): per-occurrence surface-form blobs ride the index next to
positions/offsets, survive merges, and surface via occurrences()."""

import pandas as pd
import pytest

from iresearch_spark.build import build_index
from iresearch_spark.build.merge import merge_segments
from iresearch_spark.fields import FieldSpec
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher
from iresearch_spark.store import SnapshotStore

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _corpus(texts):
    n = len(texts)
    return pd.DataFrame(
        {
            "url": [f"u{i:03d}" for i in range(n)],
            "warc_ts": pd.to_datetime(["2026-01-01"] * n),
            "html": [None] * n,
            "text": texts,
            "lang": ["en"] * n,
        }
    )


FIELDS = [
    FieldSpec("text", "__text__", "text", offsets=True),
    FieldSpec("stempay", "text", "text|stem", offsets=True, payloads=True),
]


@pytest.fixture(scope="module")
def pay_index(spark, tmp_path_factory):
    # 'merged' and 'merging' both stem to 'merg' — one term, two distinct
    # per-occurrence payloads
    texts = [
        ("tables merged quickly" if i % 2 == 0 else "merging customer tables")
        for i in range(30)
    ]
    store = SnapshotStore(str(tmp_path_factory.mktemp("payidx")))
    build_index(
        spark,
        spark.createDataFrame(_corpus(texts), SCHEMA),
        store,
        n_segments=2,
        fields=FIELDS,
        source="pay",
    )
    return store, texts


def test_payloads_carry_surface_forms(spark, pay_index):
    store, texts = pay_index
    s = IndexSearcher(spark, store)
    occ = s.occurrences("merg", "stempay").collect()
    assert len(occ) == 30
    assert {r["payload"] for r in occ} == {"merged", "merging"}
    # span length matches the payload length (decode contract)
    assert all(len(r["payload"]) == r["length"] for r in occ)
    # non-payload field: payload is null, spans still real
    occ_text = s.occurrences("tables", "text").collect()
    assert occ_text and all(r["payload"] is None for r in occ_text)
    assert all(r["start"] >= 0 for r in occ_text)


def test_payloads_survive_merge_and_scoring_unchanged(spark, pay_index, tmp_path):
    import shutil

    store, _texts = pay_index
    dst = str(tmp_path / "copy")
    shutil.copytree(store.root, dst)
    store2 = SnapshotStore(dst)
    s1 = IndexSearcher(spark, store2)
    before = sorted(
        (r["pos"], r["payload"]) for r in s1.occurrences("merg", "stempay").collect()
    )
    rank_before = [
        (r["rank"], r["url"], round(r["score"], 9))
        for r in s1.search_batch(
            {0: qf.Term("merg", field="stempay")}, k=10, with_urls=True, tie="url"
        ).collect()
    ]
    seg_ids = [int(x["seg_id"]) for x in store2.snapshot()["segments"]]
    merge_segments(spark, store2, seg_ids)
    s2 = IndexSearcher(spark, store2)
    after = sorted(
        (r["pos"], r["payload"]) for r in s2.occurrences("merg", "stempay").collect()
    )
    assert after == before
    rank_after = [
        (r["rank"], r["url"], round(r["score"], 9))
        for r in s2.search_batch(
            {0: qf.Term("merg", field="stempay")}, k=10, with_urls=True, tie="url"
        ).collect()
    ]
    assert rank_after == rank_before


def test_payload_requires_offsets():
    with pytest.raises(ValueError):
        FieldSpec("x", "text", "text", offsets=False, payloads=True)


def test_analyzer_payload_twins():
    """Pure-Python vs vectorized payload surfaces agree on every analyzer
    family, and surface length always equals the span length."""
    import numpy as np

    from iresearch_spark.analysis.analyzers import (
        analyze_batch_payloads,
        analyze_one_payloads,
    )

    vals = ["Customers Buying tables", None, "running quickly", "", "a b a"]
    for spec in (
        "text",
        "text|stem",
        "stem",
        "identity",
        "delimiter: ",
        "ngram:2,3",
        "text|ngram:2,2",
    ):
        ref = [t for v in vals for t in analyze_one_payloads(v, spec)]
        flat, counts, pos, sts, lns, surf = analyze_batch_payloads(
            pd.Series(vals, dtype=object), spec
        )
        got = list(
            zip(list(flat), pos.tolist(), sts.tolist(), lns.tolist(), list(surf))
        )
        assert got == ref, spec
        assert int(counts.sum()) == len(ref)
        assert all(len(u) == l for _t, _p, _s, l, u in got), spec
        assert np.array_equal(
            np.fromiter((len(u) for u in surf), dtype=np.int64, count=len(surf)),
            lns,
        )
