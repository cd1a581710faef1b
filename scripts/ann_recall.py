"""ANN recall@k / QPS bench at corpus scale (round-3 verdict item #3).

Correctness twins prove plan-equality on tiny corpora; this measures the
quality/speed tradeoff where ANN is the point: a >=1M-vector synthetic
embedding table with planted cluster structure, exact brute-force cosine
top-k as ground truth, then the two materialized index families —
hyperplane-LSH (probe_hamming 0/1/2) and IVF (nprobe 1/4/16) — reporting
recall@10 and amortized batch QPS for each.

Usage (repo root):
    python scripts/ann_recall.py gen  <root> <n_vecs> [dim]
    python scripts/ann_recall.py bench <root> [n_queries] [k]
Prints one JSON line per config + a summary line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

DIM_DEFAULT = 64
N_CENTERS = 256  # planted clusters (deterministic)


def _gen(root: str, n_vecs: int, dim: int) -> None:
    """Deterministic clustered embeddings: vec i belongs to center
    i % N_CENTERS; embedding = center + per-vector seeded noise."""
    spark = bench._mk_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    def make(pdfs):
        import pandas as pd

        centers = np.random.default_rng(7).normal(
            size=(N_CENTERS, dim)
        ).astype(np.float32)
        for pdf in pdfs:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), dim), np.float32)
            for j, i in enumerate(ids):
                rng = np.random.default_rng(int(i) + 1_000_003)
                out[j] = centers[int(i) % N_CENTERS] + 0.35 * rng.normal(
                    size=dim
                ).astype(np.float32)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": list(out),
                    "label": (ids % N_CENTERS).astype(np.int32),
                }
            )

    df = spark.range(n_vecs).repartition(256).mapInPandas(
        make, "vec_id long, embedding array<float>, label int"
    )
    df.write.parquet(os.path.join(root, "emb"), mode="overwrite")
    print(json.dumps({"generated": n_vecs, "dim": dim}))
    spark.stop()


def _exact_topk_batch(spark, emb, qids, k):
    """Ground truth: brute-force cosine top-k for all queries in ONE job
    (corpus x Q broadcast cross join)."""
    from pyspark.sql import Window, functions as F

    from iresearch_spark.textops.similarity import _dot, _norm

    q_df = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        emb.crossJoin(F.broadcast(q_df))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id")
    )


def _recall(got_rows, truth, k):
    got: dict[int, set] = {}
    for r in got_rows:
        got.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    vals = [
        len(got.get(q, set()) & t) / float(k) for q, t in truth.items()
    ]
    return round(float(np.mean(vals)), 4)


def _bench(root: str, n_queries: int, k: int) -> None:
    from pyspark.sql import functions as F

    from iresearch_spark.textops.similarity import (
        build_ann_index,
        build_ivf_index,
        ivf_ann_topk_batch,
        lsh_ann_topk_batch,
    )

    spark = bench._mk_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(root, "emb"))
    n_vecs = emb.count()
    # query ids spread across clusters, deterministic
    qids = [int(37 + 101 * i) for i in range(n_queries)]

    t0 = time.time()
    truth_rows = _exact_topk_batch(spark, emb, qids, k).collect()
    exact_s = time.time() - t0
    truth: dict[int, set] = {}
    for r in truth_rows:
        truth.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    print(
        json.dumps(
            {
                "config": "exact",
                "n_vecs": n_vecs,
                "batch_s": round(exact_s, 2),
                "qps": round(n_queries / exact_s, 2),
                "recall_at_k": 1.0,
            }
        )
    )

    results = [
        {
            "config": "exact", "recall_at_k": 1.0,
            "qps": round(n_queries / exact_s, 2),
        }
    ]

    lsh_dir = os.path.join(root, "lsh_index")
    t0 = time.time()
    if not os.path.exists(os.path.join(lsh_dir, "_ann_meta.json")):
        build_ann_index(emb, lsh_dir, n_planes=8)
    lsh_build_s = time.time() - t0
    for probe in (0, 1, 2):
        t0 = time.time()
        rows = lsh_ann_topk_batch(
            spark, lsh_dir, emb, qids, k=k, probe_hamming=probe
        ).collect()
        wall = time.time() - t0
        rec = _recall(rows, truth, k)
        row = {
            "config": f"lsh_probe{probe}",
            "build_s": round(lsh_build_s, 2),
            "batch_s": round(wall, 2),
            "qps": round(n_queries / wall, 2),
            "recall_at_k": rec,
        }
        results.append(row)
        print(json.dumps(row))

    ivf_dir = os.path.join(root, "ivf_index")
    t0 = time.time()
    if not os.path.exists(os.path.join(ivf_dir, "_ivf_meta.json")):
        build_ivf_index(emb, ivf_dir, n_lists=64, train_iters=2)
    ivf_build_s = time.time() - t0
    for nprobe in (1, 4, 16):
        t0 = time.time()
        rows = ivf_ann_topk_batch(
            spark, ivf_dir, emb, qids, nprobe=nprobe, k=k
        ).collect()
        wall = time.time() - t0
        rec = _recall(rows, truth, k)
        row = {
            "config": f"ivf_nprobe{nprobe}",
            "build_s": round(ivf_build_s, 2),
            "batch_s": round(wall, 2),
            "qps": round(n_queries / wall, 2),
            "recall_at_k": rec,
        }
        results.append(row)
        print(json.dumps(row))

    print(
        json.dumps(
            {
                "metric": "ann_recall_qps",
                "n_vecs": n_vecs,
                "dim": int(emb.select(F.size("embedding")).first()[0]),
                "k": k,
                "n_queries": n_queries,
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        _gen(
            sys.argv[2],
            int(sys.argv[3]),
            int(sys.argv[4]) if len(sys.argv) > 4 else DIM_DEFAULT,
        )
    else:
        _bench(
            sys.argv[2],
            int(sys.argv[3]) if len(sys.argv) > 3 else 32,
            int(sys.argv[4]) if len(sys.argv) > 4 else 10,
        )
