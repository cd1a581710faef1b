"""NRT streaming-ingest throughput bench (VERDICT r4 #7).

Measures the Structured-Streaming micro-batch indexer
(streaming/ingest.py: readStream -> foreachBatch(build_index append) ->
consolidate) on 10 x 100k-doc micro-batches: end-to-end ingest docs/s,
p50/p95 per-batch commit-to-visible latency (the foreachBatch trigger
duration covers tokenize -> encode -> snapshot publish -> policy merge,
i.e. the instant a reopened reader sees the batch), and the final
segment count the consolidation policy held the index to.

Usage (repo root):
    python scripts/streaming_ingest_bench.py <root> [n_batches] [batch_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main(root: str, n_batches: int, batch_docs: int, policy: str = "count") -> None:
    from pyspark.sql import functions as F

    from iresearch_spark.build.policy import consolidate_count
    from iresearch_spark.fixtures.corpus import gen_corpus_spark
    from iresearch_spark.query.executor import IndexSearcher
    from iresearch_spark.store import SnapshotStore
    from iresearch_spark.streaming import start_index_stream

    spark = bench._mk_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    src_dir = os.path.join(root, "src")
    n_total = n_batches * batch_docs
    if not os.path.exists(src_dir):
        # one parquet file per micro-batch; urls disjoint across batches
        corpus = gen_corpus_spark(spark, n_total)
        corpus = corpus.withColumn(
            "chunk",
            (F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy("url")
            ) - 1) / batch_docs,
        )
        for i in range(n_batches):
            (
                corpus.filter(F.floor("chunk") == i)
                .drop("chunk")
                .coalesce(1)
                .write.parquet(os.path.join(src_dir, f"c{i}"), mode="overwrite")
            )
    schema = spark.read.parquet(os.path.join(src_dir, "c0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_dir, "c*"))
    )
    store = SnapshotStore(os.path.join(root, "index"))
    t0 = time.time()
    q = start_index_stream(
        stream,
        store,
        name="bench_ingest",
        checkpoint_dir=os.path.join(root, "ckpt"),
        n_segments=2,
        consolidate_policy=consolidate_count if policy == "count" else None,
        policy_kwargs={"max_segments": 8},
        available_now=True,
    )
    q.awaitTermination(3600)
    wall = time.time() - t0
    prog = [
        p
        for p in (q.recentProgress or [])
        if p and p.get("numInputRows", 0) > 0
    ]
    durs = sorted(
        p["durationMs"]["triggerExecution"] / 1000.0 for p in prog
    )
    rows_seen = sum(int(p["numInputRows"]) for p in prog)
    s = IndexSearcher(spark, store)
    out = {
        "metric": "streaming_ingest",
        "policy": policy,
        "n_batches": n_batches,
        "batch_docs": batch_docs,
        "docs_total": n_total,
        "rows_streamed": rows_seen,
        "wall_s": round(wall, 2),
        "docs_per_s": round(n_total / wall, 1),
        "batch_s_p50": round(statistics.median(durs), 2) if durs else None,
        "batch_s_p95": round(
            durs[max(0, int(len(durs) * 0.95) - 1)], 2
        ) if durs else None,
        "batch_s_max": round(durs[-1], 2) if durs else None,
        "final_segments": s.n_segments,
        "visible_docs": s.n_docs,
    }
    assert s.n_docs == n_total, (s.n_docs, n_total)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
        int(sys.argv[3]) if len(sys.argv) > 3 else 100_000,
        sys.argv[4] if len(sys.argv) > 4 else "count",
    )
