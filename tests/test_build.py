"""Segment build pipeline tests: the built index must structurally equal
the oracle's in-memory index (docIDs, postings, stats) — mirrors the
reference's index round-trip suites ([up] tests/index/index_tests.cpp)."""

import numpy as np
import pytest

from iresearch_spark.codec import decode_postings, decode_positions_for


def test_snapshot_committed(unit_index):
    store, sid, oracle = unit_index
    snap = store.snapshot(sid)
    assert snap["snapshot_id"] == sid
    assert snap["stats"]["n_docs"] == oracle.n_docs
    assert snap["stats"]["sum_dl"] == sum(oracle.doc_len["text"].values())
    assert snap["stats"]["field_sum_dl"]["text"] == snap["stats"]["sum_dl"]
    assert len(snap["segments"]) == 4
    assert snap["metrics"]["postings"] > 0
    assert snap["lineage"] and all("partition" in r for r in snap["lineage"])


def test_doc_table_matches_oracle(spark, unit_index):
    store, sid, oracle = unit_index
    docs = store.read_docs(spark, sid).select("seg_id", "doc_id", "url", "dl").collect()
    assert len(docs) == oracle.n_docs
    for r in docs:
        key = (r["seg_id"], r["doc_id"])
        assert oracle.doc_url[key] == r["url"]
        assert oracle.doc_len["text"][key] == r["dl"]


def test_postings_match_oracle(spark, unit_index):
    store, sid, oracle = unit_index
    rows = (
        store.read_postings(spark, sid)
        .select("seg_id", "term", "df", "cf", "blob", "skip", "pos_off", "pos_pay")
        .collect()
    )
    by_key = {(r["seg_id"], r["term"]): r for r in rows}
    # every oracle posting list is present and identical
    n_checked = 0
    for (field, term), by_seg in oracle.postings.items():
        for seg, (docs, tfs, poss) in by_seg.items():
            r = by_key.pop((seg, term))
            pl = decode_postings(bytes(r["blob"]))
            assert pl.doc_ids.tolist() == docs, (term, seg)
            assert pl.tfs.tolist() == tfs, (term, seg)
            n_checked += 1
            # positions spot-check on the first doc
            got_pos = decode_positions_for(
                bytes(r["pos_off"]), bytes(r["pos_pay"]), np.array([0]), np.array([tfs[0]])
            )[0]
            assert got_pos.tolist() == poss[0], (term, seg)
    assert not by_key, f"extra posting rows: {list(by_key)[:5]}"
    assert n_checked > 1000


def test_df_cf_match_oracle(spark, unit_index):
    from pyspark.sql import functions as F

    store, sid, oracle = unit_index
    agg = (
        store.read_postings(spark, sid)
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .collect()
    )
    got_df = {("text", r["term"]): r["df"] for r in agg}
    assert got_df == oracle.df


def test_build_determinism_across_parallelism(spark, unit_corpus, tmp_path):
    """Same corpus, different partitioning -> byte-identical blobs and
    identical docIDs (the N-vs-4N invariant, SURVEY.md §7 hard-part (c))."""
    from pyspark.sql import functions as F

    from iresearch_spark.build import build_index
    from iresearch_spark.store import SnapshotStore

    def fingerprint(store, sid):
        rows = (
            store.read_postings(spark, sid)
            .select("seg_id", "term", F.md5(F.col("blob")).alias("h"))
            .collect()
        )
        return sorted((r["seg_id"], r["term"], r["h"]) for r in rows)

    s1 = SnapshotStore(str(tmp_path / "a"))
    s2 = SnapshotStore(str(tmp_path / "b"))
    df1 = spark.createDataFrame(unit_corpus).repartition(2)
    df2 = spark.createDataFrame(unit_corpus).repartition(13)
    sid1 = build_index(spark, df1, s1, n_segments=4, parts=3, source="a")
    sid2 = build_index(spark, df2, s2, n_segments=4, parts=11, source="b")
    assert fingerprint(s1, sid1) == fingerprint(s2, sid2)


def test_resume_from_checkpoint(spark, unit_corpus, tmp_path):
    """Interrupted build (docs written, postings not) resumes without
    rewriting docs (BASELINE.json:14 checkpoint resume)."""
    import json
    import os

    from iresearch_spark.build import build_index
    from iresearch_spark.store import SnapshotStore

    root = str(tmp_path / "resume")
    store = SnapshotStore(root)
    sdf = spark.createDataFrame(unit_corpus)
    sid = build_index(spark, sdf, store, n_segments=2, source="r1")
    snap1 = store.snapshot(sid)
    assert snap1["metrics"]["resumed_stages"] == {
        "docs": False,
        "postings": False,
        "norms": False,
    }

    # simulate an interrupted second build: stage dir with docs completed
    commit_dir = store.new_commit_dir()
    with open(os.path.join(root, "_staging.json"), "w") as f:
        from iresearch_spark.build.indexer import staging_key
        from iresearch_spark.fields import DEFAULT_FIELDS

        json.dump(
            {
                "key": staging_key("r2", 2, None, "replace", 0, DEFAULT_FIELDS),
                "dir": commit_dir,
            },
            f,
        )
    docs_dir = os.path.join(commit_dir, "docs")
    # "complete" the docs stage by building it once via a throwaway store
    tmp_store = SnapshotStore(str(tmp_path / "throwaway"))
    build_index(spark, sdf, tmp_store, n_segments=2, source="r2")
    import shutil

    src = tmp_store.snapshot(None)["segments"][0]["docs_path"]
    src_root = os.path.dirname(tmp_store.abs_path(src))
    shutil.copytree(src_root, docs_dir)
    assert os.path.exists(os.path.join(docs_dir, "_SUCCESS"))

    sid2 = build_index(spark, sdf, store, n_segments=2, source="r2")
    snap2 = store.snapshot(sid2)
    assert snap2["metrics"]["resumed_stages"]["docs"] is True
    assert snap2["stats"] == snap1["stats"]


def test_resume_docs_postings_done_norms_pending(
    spark, unit_corpus, tmp_path, monkeypatch
):
    """Regression: a build interrupted AFTER docs+postings finished but
    BEFORE norms (exactly the state the concurrent table writes make
    likely) must resume — the assigned checkpoint is still needed for the
    norms write, so it must not be skipped just because docs+postings
    carry _SUCCESS markers."""
    import pytest as _pytest

    from iresearch_spark.build import build_index, kernels
    from iresearch_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "resume_norms"))
    sdf = spark.createDataFrame(unit_corpus)

    orig = kernels.norms_builder

    def boom(key, pdf):
        raise RuntimeError("injected norms failure")

    monkeypatch.setattr(kernels, "norms_builder", boom)
    with _pytest.raises(Exception):
        build_index(spark, sdf, store, n_segments=2, source="rn")
    monkeypatch.setattr(kernels, "norms_builder", orig)

    sid = build_index(spark, sdf, store, n_segments=2, source="rn")
    snap = store.snapshot(sid)
    # docs+postings resumed from the interrupted attempt; norms was rerun
    assert snap["metrics"]["resumed_stages"] == {
        "docs": True,
        "postings": True,
        "norms": False,
    }
    fresh = SnapshotStore(str(tmp_path / "resume_norms_fresh"))
    build_index(spark, sdf, fresh, n_segments=2, source="rn")
    assert snap["stats"] == fresh.snapshot(None)["stats"]


def test_blob_determinism_across_paths(spark, unit_corpus, tmp_path):
    """Final blob bytes are independent of shuffle path and parallelism:
    one-level vs banded-salted builds at different partition counts must
    produce byte-identical postings (the N-vs-4N determinism requirement,
    SURVEY.md §7 hard-part (c))."""
    import hashlib

    import pyarrow.parquet as pq

    from iresearch_spark.build import build_index
    from iresearch_spark.store import SnapshotStore

    sdf = spark.createDataFrame(unit_corpus)

    def blob_sig(store, sid):
        rows = []
        for seg in store.snapshot(sid)["segments"]:
            t = pq.read_table(
                store.abs_path(seg["postings_path"]),
                columns=["seg_id", "term", "blob", "skip", "bmax"],
            )
            rows += sorted(
                zip(
                    t.column("seg_id").to_pylist(),
                    t.column("term").to_pylist(),
                    [
                        hashlib.md5(bytes(b)).hexdigest()
                        for b in t.column("blob").to_pylist()
                    ],
                    [
                        hashlib.md5(bytes(b)).hexdigest()
                        for b in t.column("skip").to_pylist()
                    ],
                )
            )
        return hashlib.md5(repr(rows).encode()).hexdigest()

    a = SnapshotStore(str(tmp_path / "one_level"))
    sa = build_index(spark, sdf, a, n_segments=4, source="a", parts=16)
    b = SnapshotStore(str(tmp_path / "banded"))
    sb = build_index(
        spark, sdf, b, n_segments=4, source="b", band_bits=6, parts=5
    )
    assert blob_sig(a, sa) == blob_sig(b, sb)


def test_salted_band_partition_spread(spark):
    """M1 skew defense (VERDICT r4 #4): with one term in ~50% of docs and
    few huge segments, the level-1 merge shuffle keyed WITH the doc-range
    band spreads the hot term's posting mass across reducers; keyed
    without it, the hot term concentrates per segment.  Asserts the
    salted layout's max/median entry-mass spread is bounded (<3) and
    strictly better than the unsalted layout's."""
    import statistics

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from iresearch_spark.build import kernels
    from iresearch_spark.fields import DEFAULT_FIELDS

    n_docs, n_segments, parts, band_bits = 20_000, 2, 32, 8
    corpus = (
        spark.range(n_docs)
        .select(
            F.format_string("%09d", F.col("id")).alias("url"),
            F.concat(
                F.when(F.col("id") % 2 == 0, F.lit("hotterm ")).otherwise(
                    F.lit("")
                ),
                F.format_string(
                    "w%d x%d",
                    F.col("id") % 4999,
                    (F.col("id") * 7) % 4999,
                ),
            ).alias("text"),
        )
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("warc_ts", F.lit(None).cast("timestamp"))
        .withColumn("lang", F.lit(None).cast("string"))
    )
    field_specs = list(DEFAULT_FIELDS)
    tokenized = (
        corpus.withColumn(
            "seg_id", (F.crc32(F.col("url")) % n_segments).cast("int")
        )
        .select("seg_id", "url", "warc_ts", "lang", "html", "text")
        .mapInArrow(
            kernels.make_tokenize_kernel(field_specs, ()),
            kernels.TOKENIZED_SCHEMA,
        )
    )
    assigned = (
        tokenized.repartition(n_segments, "seg_id")
        .withColumn(
            "doc_id",
            F.row_number()
            .over(W.partitionBy("seg_id").orderBy("url"))
            .cast("bigint"),
        )
        .select(
            "seg_id", "doc_id", "fdls", "terms", "tfids", "tfs",
            "positions", "ostarts", "olens", "pchars",
        )
    )
    partials = assigned.mapInArrow(
        kernels.make_partials_kernel(
            band_bits,
            [f.offsets for f in field_specs],
            [f.payloads for f in field_specs],
        ),
        kernels.PARTIAL_SCHEMA,
    ).localCheckpoint()

    def spread(keys):
        rows = (
            partials.repartition(parts, *keys)
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.sum("n").alias("mass"))
            .collect()
        )
        masses = sorted(int(r["mass"]) for r in rows)
        return masses[-1] / max(statistics.median(masses), 1)

    salted = spread(["seg_id", "fidx", "term", "band"])
    unsalted = spread(["seg_id", "fidx", "term"])
    assert salted < 3.0, salted
    assert salted < unsalted, (salted, unsalted)
