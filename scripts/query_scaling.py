"""Query-phase N-vs-4N scaling against ONE prebuilt index.

The index layout is byte-deterministic across build parallelism (tested:
tests/test_build.py parts-invariance), so the build width is immaterial
to query measurements — build once WIDE (fast), then time the same
300-query batch in fresh JVMs at local[N] and local[4N]. This isolates
the query phase's scaling from build-window noise and lets the corpus be
large enough (10M docs) that per-batch fixed costs (driver prepare, the
one expansion job's collect, job scheduling) amortize the way they would
at the north rule's 10^12-doc scale.

Usage (repo root; TMPDIR/SPARK_LOCAL_DIRS as desired):
    python scripts/query_scaling.py build <dir> <n_docs> <build_cpus>
    python scripts/query_scaling.py query <dir> <cpus>
Each prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _mk_spark config + query fixtures)


def main() -> None:
    mode, root = sys.argv[1], sys.argv[2]
    from iresearch_spark.store import SnapshotStore

    if mode == "build":
        n_docs, cpus = int(sys.argv[3]), int(sys.argv[4])
        spark = bench._mk_spark(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        from iresearch_spark.build.indexer import build_index
        from iresearch_spark.fixtures.corpus import gen_corpus_spark

        corpus_dir = os.path.join(root, "corpus")
        if not os.path.exists(corpus_dir):
            gen_corpus_spark(spark, n_docs).write.parquet(corpus_dir)
        store = SnapshotStore(os.path.join(root, "index"))
        t0 = time.time()
        sid = build_index(
            spark,
            spark.read.parquet(corpus_dir),
            store,
            n_segments=64,
            source=f"qscale-{n_docs}",
        )
        print(
            json.dumps(
                {"built": sid, "n_docs": n_docs, "build_s": round(time.time() - t0, 3)}
            )
        )
        spark.stop()
        return

    cpus = int(sys.argv[3])
    # optional 4th arg: pin a specific snapshot id (e.g. the pre-
    # consolidation 64-segment generation, so legs measure the same
    # layout regardless of later maintenance commits)
    sid = int(sys.argv[4]) if len(sys.argv) > 4 else None
    spark = bench._mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from iresearch_spark.query import filters as qf
    from iresearch_spark.query.executor import IndexSearcher

    store = SnapshotStore(os.path.join(root, "index"))
    searcher = IndexSearcher(spark, store, sid)
    bench._prewarm(spark, cpus)
    # reader-open warm-up: JVM/Arrow + term-dictionary materialization
    searcher.search_batch(
        {0: qf.Term("warmup"), 1: qf.Prefix("zzzzwarmup")}, k=5, with_urls=False
    ).count()
    n_q = int(os.environ.get("QS_BATCH", "300"))
    batch = bench._synthetic_queries(n_q)
    t0 = time.time()
    searcher.search_batch(batch, k=10, with_urls=False).count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "snapshot": searcher.sid,
                "n_queries": n_q,
                "batch_s": round(wall, 3),
                "qps": round(n_q / wall, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
