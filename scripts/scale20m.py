"""Disk-frugal corpus-scale build: 20M+ docs via segment-batched appends.

Round-3's single-shot 20M builds died on sandbox storage: ONE build's
tokenized checkpoint (token arrays ≈ 3-4x the text) + shuffle spill +
corpus + outputs overran the host's disk. The fix is the NRT shape the
engine already has: build in B append GENERATIONS. Each append stages,
commits, and then build_index deletes its own tokenized checkpoint
(indexer.py end-of-commit cleanup), so peak scratch is ONE batch's
checkpoint instead of the whole corpus's — disk high-water drops ~B x
on the dominant term. zstd shuffle/spill blocks (bench._mk_spark) buy
another ~1.4x on the shuffle side. The appended index is
query-equivalent to a single-shot build (tested: stream == batch build;
append generations share the manifest like any NRT writer).

Usage (repo root; put root on the biggest volume):
    python scripts/scale20m.py <root> <n_docs> <n_batches> <cpus>
Prints one JSON line per phase + a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    root, n_docs, n_batches, cpus = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
    )
    spark = bench._mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from iresearch_spark.build.indexer import build_index
    from iresearch_spark.fixtures.corpus import gen_corpus_spark
    from iresearch_spark.query import filters as qf
    from iresearch_spark.query.executor import IndexSearcher
    from iresearch_spark.store import SnapshotStore

    corpus_dir = os.path.join(root, "corpus")
    t0 = time.time()
    if not os.path.exists(corpus_dir):
        gen_corpus_spark(spark, n_docs).write.parquet(corpus_dir)
    gen_s = time.time() - t0
    corpus = spark.read.parquet(corpus_dir)
    print(json.dumps({"phase": "gen", "n_docs": n_docs, "s": round(gen_s, 1)}))

    store = SnapshotStore(os.path.join(root, "index"))
    seg_per_batch = max(64 // n_batches, 8)
    batch_col = F.abs(F.xxhash64("url")) % n_batches
    t0 = time.time()
    for b in range(n_batches):
        tb = time.time()
        build_index(
            spark,
            corpus.filter(batch_col == b),
            store,
            n_segments=seg_per_batch,
            source=f"scale20m-b{b}",
            mode="replace" if b == 0 else "append",
        )
        du = shutil.disk_usage(root)
        print(
            json.dumps(
                {
                    "phase": f"append_{b}",
                    "s": round(time.time() - tb, 1),
                    "disk_used_gb": round((du.total - du.free) / 2**30, 1),
                }
            )
        )
    build_s = time.time() - t0
    stats = store.global_stats()
    print(
        json.dumps(
            {
                "phase": "build_total",
                "n_docs": stats["n_docs"],
                "wall_s": round(build_s, 1),
                "docs_per_sec": round(stats["n_docs"] / build_s, 1),
                "n_batches": n_batches,
                "segments": len(store.snapshot()["segments"]),
            }
        )
    )

    # query sanity + amortized batch QPS on the appended index
    searcher = IndexSearcher(spark, store)
    searcher.search_batch(
        {0: qf.Term("warmup"), 1: qf.Prefix("zzzzwarmup")}, k=5,
        with_urls=False,
    ).count()
    batch = bench._synthetic_queries(300)
    t0 = time.time()
    searcher.search_batch(batch, k=10, with_urls=False).count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "phase": "query",
                "batch300_s": round(wall, 2),
                "qps": round(300 / wall, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
