"""F19 by_nested (parent/child block join, [up]
core/search/nested_filter.cpp): engine-vs-oracle rank identity over a
block-ingested corpus, merge-type algebra, match ranges, and survival of
the block structure through delete + merge maintenance.

Block ingestion convention (mirrors the reference indexing a block as one
transaction — children first, parent last): every block shares a
fixed-width url prefix; child urls `<pfx>#c<j>` sort before the parent's
`<pfx>~p`, and `build_index(segment_key="substring(url, 1, 4)")` routes
whole blocks to one segment, so within a segment children are contiguous
and immediately precede their parent in docID order.
"""

from __future__ import annotations

import pytest

from iresearch_spark.build import build_index
from iresearch_spark.fields import FieldSpec
from iresearch_spark.oracle import OracleIndex
from iresearch_spark.query import filters as qf
from iresearch_spark.query.executor import IndexSearcher
from iresearch_spark.store import SnapshotStore

N_SEG = 3
SEG_KEY_SQL = "substring(url, 1, 4)"

WORDS = [
    "apple", "berry", "cedar", "delta", "ember", "frost", "grove", "haze",
]


def _block_rows():
    """40 blocks: block i has (i % 3) + 1 children; block 37 deliberately
    has NO parent row (its children are absorbed by the next live parent
    in docID order, or fall off the segment end — either way both systems
    must agree). Parent rows carry searchable text too, so a child filter
    that also matches parent docs exercises the parents-are-not-children
    rule."""
    urls, texts, kinds = [], [], []
    for i in range(40):
        pfx = f"{i:04d}"
        n_children = (i % 3) + 1
        for j in range(n_children):
            urls.append(f"{pfx}#c{j}")
            # deterministic overlapping vocab: child j of block i
            texts.append(
                f"{WORDS[(i + j) % 8]} {WORDS[(i * 3 + j) % 8]} "
                f"{WORDS[j % 8]} filler common"
            )
            kinds.append("c")
        if i != 37:
            urls.append(f"{pfx}~p")
            texts.append(f"{WORDS[i % 8]} parenttext common")
            kinds.append("p")
    return urls, texts, kinds


@pytest.fixture(scope="module")
def nested_index(spark, tmp_path_factory):
    urls, texts, kinds = _block_rows()
    root = str(tmp_path_factory.mktemp("index_nested"))
    store = SnapshotStore(root)
    sdf = spark.createDataFrame(
        list(zip(urls, texts, kinds)), "url string, text string, kind string"
    )
    fields = [
        FieldSpec("text", "__text__", "text"),
        FieldSpec("kind", "kind", "identity"),
    ]
    sid = build_index(
        spark, sdf, store, n_segments=N_SEG, fields=fields,
        source="nested_unit", segment_key=SEG_KEY_SQL,
    )
    oracle = OracleIndex(
        urls, texts, n_segments=N_SEG,
        extra_fields=[("kind", kinds, "identity")],
        segment_keys=[u[:4] for u in urls],
    )
    return store, sid, oracle


PARENT = qf.Term("p", field="kind")


def _compare(spark, store, sid, oracle, trees, k=50):
    s = IndexSearcher(spark, store, sid)
    df = s.search_batch(trees, k=k, with_urls=True)
    got: dict[int, list] = {}
    for r in df.collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["seg_id"], r["doc_id"], r["url"], r["score"])
        )
    for v in got.values():
        v.sort()
    for qid, tree in trees.items():
        want = oracle.search(tree, k=k)
        have = got.get(qid, [])
        assert len(have) == len(want), (qid, len(have), len(want))
        for (rank, seg, doc, url, score), (oseg, odoc, ourl, oscore) in zip(
            have, want
        ):
            assert (seg, doc, url) == (oseg, odoc, ourl), (qid, rank, url, ourl)
            assert score == oscore, (qid, rank, url, score, oscore)
    return got


def test_blocks_are_contiguous_per_segment(spark, nested_index):
    """The ingestion convention must actually hold: within each segment,
    docID order is url order and every block's children immediately
    precede its parent."""
    store, sid, _ = nested_index
    rows = (
        store.read_docs(spark, sid)
        .select("seg_id", "doc_id", "url")
        .collect()
    )
    by_seg: dict[int, list] = {}
    for r in rows:
        by_seg.setdefault(r["seg_id"], []).append((r["doc_id"], r["url"]))
    assert len(by_seg) > 1  # segment_key actually spread the blocks
    for seg, docs in by_seg.items():
        docs.sort()
        urls = [u for _, u in docs]
        assert urls == sorted(urls)
        # all members of one block share a segment: block pfx -> one seg
        for _, u in docs:
            pfx = u[:4]
            others = [
                s for s, ds in by_seg.items() if any(x[1][:4] == pfx for x in ds)
            ]
            assert set(others) == {seg}


def test_nested_merge_types_match_oracle(spark, nested_index):
    store, sid, oracle = nested_index
    trees = {
        i: qf.Nested(PARENT, qf.Term("apple"), merge=m)
        for i, m in enumerate(["sum", "max", "min", "avg", "none"])
    }
    got = _compare(spark, store, sid, oracle, trees)
    assert got, "nested queries matched nothing — corpus mis-designed"
    assert any(len(v) > 2 for v in got.values())


def test_nested_match_ranges_and_composites(spark, nested_index):
    store, sid, oracle = nested_index
    trees = {
        0: qf.Nested(PARENT, qf.Term("common"), min_children=2),
        1: qf.Nested(PARENT, qf.Term("common"), min_children=1, max_children=1),
        2: qf.Nested(PARENT, qf.Or(qf.Term("apple"), qf.Term("berry"))),
        3: qf.Nested(PARENT, qf.Phrase(["apple", "berry"])),
        # nested composed with a direct query on the parent's own text
        4: qf.And(
            qf.Nested(PARENT, qf.Term("apple")), qf.Term("parenttext")
        ),
        # boost folds through normalize onto the Nested node
        5: qf.Boost(qf.Nested(PARENT, qf.Term("apple")), 2.5),
        # child filter that ALSO matches parent docs ('common' is in both):
        # parent docs must not count as children of the next block
        6: qf.Nested(PARENT, qf.Term("common")),
        # parent filter matching nothing -> empty
        7: qf.Nested(qf.Term("nosuchkind", field="kind"), qf.Term("apple")),
        # multiterm child (expansion inside the nested child)
        8: qf.Nested(PARENT, qf.Prefix("app", scored_terms_limit=4)),
    }
    got = _compare(spark, store, sid, oracle, trees)
    assert 7 not in got  # empty parent bitset
    assert got.get(0) and got.get(2)
    # range sanity: min=2 and max=1 partition the min=1 result set
    all_p = {u for _, _, _, u, _ in got.get(6, [])}
    two_plus = {u for _, _, _, u, _ in got.get(0, [])}
    only_one = {u for _, _, _, u, _ in got.get(1, [])}
    assert two_plus | only_one == all_p
    assert not (two_plus & only_one)


def test_nested_boost_scales_scores(spark, nested_index):
    store, sid, oracle = nested_index
    base = oracle.search(qf.Nested(PARENT, qf.Term("apple")), k=50)
    boosted = oracle.search(
        qf.Boost(qf.Nested(PARENT, qf.Term("apple")), 2.5), k=50
    )
    assert [(s, d, u) for s, d, u, _ in base] == [
        (s, d, u) for s, d, u, _ in boosted
    ]
    for (_, _, _, b), (_, _, _, bb) in zip(base, boosted):
        assert bb == pytest.approx(2.5 * b, rel=1e-12)


def test_nested_validation():
    with pytest.raises(ValueError):
        qf.Nested(PARENT, qf.Term("x"), min_children=0)
    with pytest.raises(ValueError):
        qf.Nested(PARENT, qf.Term("x"), min_children=3, max_children=2)
    with pytest.raises(ValueError):
        qf.Nested(PARENT, qf.Term("x"), merge="median")
    # Empty child or parent normalizes the whole node away
    assert isinstance(
        qf.normalize(qf.Nested(qf.Empty(), qf.Term("x"))), qf.Empty
    )
    assert isinstance(
        qf.normalize(qf.Nested(PARENT, qf.Empty())), qf.Empty
    )


def test_nested_survives_delete_and_merge(spark, nested_index, tmp_path_factory):
    """Delete every child containing 'berry', merge all segments: nested
    results must equal a FRESH block-ingested build over the survivors
    (the merged-equals-fresh invariant extended to block structure —
    merge's global url sort preserves child-before-parent contiguity)."""
    import shutil

    from iresearch_spark.build.merge import delete_by_query, merge_segments

    store, sid, _ = nested_index
    root2 = str(tmp_path_factory.mktemp("index_nested_del"))
    shutil.copytree(store.root, root2, dirs_exist_ok=True)
    store2 = SnapshotStore(root2)
    delete_by_query(spark, store2, qf.Term("berry"))
    seg_ids = [int(s["seg_id"]) for s in store2.snapshot()["segments"]]
    merge_segments(spark, store2, seg_ids)

    urls, texts, kinds = _block_rows()
    # delete_by_query matches parents too ('berry' appears in parent text
    # when i % 8 == 1) — drop exactly what the filter matched
    keep = [i for i in range(len(urls)) if "berry" not in texts[i].split()]
    oracle2 = OracleIndex(
        [urls[i] for i in keep],
        [texts[i] for i in keep],
        n_segments=1,  # merged into one segment
        extra_fields=[("kind", [kinds[i] for i in keep], "identity")],
        segment_keys=None,  # single segment: key irrelevant
    )
    trees = {
        0: qf.Nested(PARENT, qf.Term("apple")),
        1: qf.Nested(PARENT, qf.Term("common"), min_children=2),
        2: qf.Nested(PARENT, qf.Or(qf.Term("cedar"), qf.Term("delta")), merge="max"),
    }
    s2 = IndexSearcher(spark, store2)
    df = s2.search_batch(trees, k=50, with_urls=True, tie="url")
    got: dict[int, list] = {}
    for r in df.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["url"], r["score"]))
    for v in got.values():
        v.sort()
    for qid, tree in trees.items():
        want = oracle2.search(tree, k=50)
        have = got.get(qid, [])
        assert len(have) == len(want), (qid, len(have), len(want))
        for (rank, url, score), (_, _, ourl, oscore) in zip(have, want):
            assert url == ourl, (qid, rank, url, ourl)
            assert score == pytest.approx(oscore, rel=1e-12), (qid, url)
