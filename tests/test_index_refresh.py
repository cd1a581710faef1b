"""Incremental refresh of the materialized ANN indexes: append and
dynamic-partition-overwrite upsert must leave the index equal to a fresh
build over the updated corpus, while touching ONLY the delta's partitions
(untouched partition files stay byte-for-byte in place)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from iresearch_spark.textops import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _key_rows(spark, path, key):
    return sorted(
        (int(r["vec_id"]), int(r[key]))
        for r in spark.read.parquet(path).select("vec_id", key).collect()
    )


def _part_files(index_dir, part_dir_name):
    d = os.path.join(index_dir, part_dir_name)
    if not os.path.isdir(d):
        return {}
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def _frozen_centroids(spark, index_dir):
    return spark.createDataFrame(
        [
            (int(c["cid"]), [float(x) for x in c["cv"]])
            for c in json.load(
                open(os.path.join(index_dir, similarity._IVF_META))
            )["centroids"]
        ],
        "cid long, cv array<float>",
    )


@pytest.mark.parametrize(
    "kind,key",
    [("ann", "bucket"), ("ivf", "list_id")],
)
def test_append_extends_index_under_frozen_quantizer(
    spark, emb, tmp_path, kind, key
):
    """Half-build + append(other half) holds every vector exactly where
    the index's FROZEN quantizer puts it (for LSH the planes are corpus-
    independent, so this also equals a one-shot full build — asserted),
    and a partition the delta does not touch keeps its exact files."""
    build = similarity.build_ann_index if kind == "ann" else similarity.build_ivf_index
    refresh = (
        similarity.refresh_ann_index if kind == "ann" else similarity.refresh_ivf_index
    )
    half = str(tmp_path / "half")
    mid = emb.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    old = emb.filter(F.col("vec_id") <= mid)
    delta = emb.filter(F.col("vec_id") > mid)
    build(old, half)

    if kind == "ann":
        keyed = similarity._bucket(
            emb,
            similarity.seeded_planes(
                spark, int(emb.select(F.size("embedding")).first()[0]), 8
            ),
        ).select("vec_id", F.col("bucket").alias(key))
    else:
        keyed = similarity.ivf_assign(
            emb, _frozen_centroids(spark, half)
        ).select("vec_id", F.col("list_id").alias(key))
    expected = sorted(
        (int(r["vec_id"]), int(r[key])) for r in keyed.collect()
    )
    delta_ids = {int(r["vec_id"]) for r in delta.select("vec_id").collect()}
    delta_keys = {k for v, k in expected if v in delta_ids}
    untouched = [
        d
        for d in os.listdir(half)
        if d.startswith(f"{key}=") and int(d.split("=")[1]) not in delta_keys
    ]
    before = {d: _part_files(half, d) for d in untouched}

    refresh(delta, half, mode="append")
    assert _key_rows(spark, half, key) == expected
    for d in untouched:
        assert _part_files(half, d) == before[d], f"{d} was rewritten"
    if kind == "ann":
        full = str(tmp_path / "full")
        build(emb, full)
        assert _key_rows(spark, full, key) == expected


@pytest.mark.parametrize(
    "kind,key",
    [("ann", "bucket"), ("ivf", "list_id")],
)
def test_upsert_reembed_equals_full_build(spark, emb, tmp_path, kind, key):
    """Re-embedding some vectors and upserting leaves every vector where
    the index's frozen quantizer puts its CURRENT embedding — including
    removal from the vec_id's OLD partition when the new embedding lands
    elsewhere (for LSH this also equals a fresh build, planes being
    corpus-independent)."""
    build = similarity.build_ann_index if kind == "ann" else similarity.build_ivf_index
    refresh = (
        similarity.refresh_ann_index if kind == "ann" else similarity.refresh_ivf_index
    )
    idx = str(tmp_path / "idx")
    build(emb, idx)

    # re-embed vec_ids 0..4 with vec_id+100's embedding (guaranteed to
    # exist and generally land in a different partition)
    src = emb.select(
        (F.col("vec_id") - 100).alias("vec_id"),
        F.col("embedding").alias("new_emb"),
    )
    delta = (
        emb.filter(F.col("vec_id") < 5)
        .join(src, "vec_id")
        .select("vec_id", F.col("new_emb").alias("embedding"), "label")
    )
    assert delta.count() == 5
    updated = (
        emb.join(delta.select("vec_id", F.col("embedding").alias("ne")), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("ne"), F.col("embedding")).alias("embedding"),
            "label",
        )
    )
    if kind == "ann":
        keyed = similarity._bucket(
            updated,
            similarity.seeded_planes(
                spark, int(emb.select(F.size("embedding")).first()[0]), 8
            ),
        ).select("vec_id", F.col("bucket").alias(key))
        fresh = str(tmp_path / "fresh")
        build(updated, fresh)
    else:
        keyed = similarity.ivf_assign(
            updated, _frozen_centroids(spark, idx)
        ).select("vec_id", F.col("list_id").alias(key))
    expected = sorted(
        (int(r["vec_id"]), int(r[key])) for r in keyed.collect()
    )
    refresh(delta, idx, mode="upsert")
    assert _key_rows(spark, idx, key) == expected
    if kind == "ann":
        assert _key_rows(spark, fresh, key) == expected
    # every vec_id appears exactly once (no stale row left in an old
    # partition)
    counts = (
        spark.read.parquet(idx).groupBy("vec_id").count().filter("count > 1").count()
    )
    assert counts == 0


def test_upsert_emptied_partition_is_dropped(spark, emb, tmp_path):
    """If an upsert moves EVERY vector out of a bucket, the emptied
    partition directory disappears (dynamic overwrite alone cannot delete
    a partition it writes zero rows into)."""
    idx = str(tmp_path / "idx")
    similarity.build_ann_index(emb, idx)
    stored = spark.read.parquet(idx)
    sizes = stored.groupBy("bucket").count().orderBy("count", "bucket").collect()
    small = int(sizes[0]["bucket"])
    big = int(sizes[-1]["bucket"])
    donor = stored.filter(F.col("bucket") == big).select("embedding").first()[
        "embedding"
    ]
    victims = [
        (int(r["vec_id"]), r["label"])
        for r in stored.filter(F.col("bucket") == small)
        .select("vec_id", "label")
        .collect()
    ]
    delta = spark.createDataFrame(
        [(v, [float(x) for x in donor], la) for v, la in victims],
        "vec_id long, embedding array<float>, label string",
    )
    similarity.refresh_ann_index(delta, idx, mode="upsert")
    assert not os.path.isdir(os.path.join(idx, f"bucket={small}"))
    # moved vectors are all present exactly once, in the donor's bucket
    victim_ids = [v for v, _ in victims]
    moved = spark.read.parquet(idx).filter(F.col("vec_id").isin(victim_ids))
    assert moved.count() == len(victims)
    assert {int(r["bucket"]) for r in moved.select("bucket").collect()} == {big}


def test_refreshed_index_answers_queries(spark, emb, tmp_path):
    """Queries against a half-built + appended index are rank-identical to
    the one-shot full index."""
    half = str(tmp_path / "half")
    full = str(tmp_path / "full")
    mid = emb.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    similarity.build_ann_index(emb.filter(F.col("vec_id") <= mid), half)
    similarity.build_ann_index(emb, full)
    similarity.refresh_ann_index(
        emb.filter(F.col("vec_id") > mid), half, mode="append"
    )
    for qid in (0, 17):
        want = similarity.lsh_ann_topk_indexed(
            spark, full, emb, query_vec_id=qid
        ).collect()
        got = similarity.lsh_ann_topk_indexed(
            spark, half, emb, query_vec_id=qid
        ).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in want]
