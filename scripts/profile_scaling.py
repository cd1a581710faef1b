"""Per-stage N-vs-4N scaling profile: where does the build's wall time go?

Generates the synthetic corpus ONCE to parquet, then runs the build +
300-query batch at local[8] and local[32] in fresh subprocesses (same
input files), printing each build stage's wall seconds from the snapshot's
metrics.timings plus query phase times. This is diagnosis tooling for the
BENCH.md scaling gate — bench.py --scaling remains the reported protocol.

Usage: python scripts/profile_scaling.py [ndocs] [--cpus 8,32]
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def single(cpus: int, corpus_dir: str) -> dict:
    """Runs in a child process: build + query, print one JSON line."""
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_ARENA_MAX", "4")
    from pyspark.sql import SparkSession

    from bench import _prewarm, _synthetic_queries
    from iresearch_spark.build.indexer import build_index
    from iresearch_spark.query.executor import IndexSearcher
    from iresearch_spark.query import filters as qf
    from iresearch_spark.store import SnapshotStore

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .appName(f"profile_{cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_dir)
    with tempfile.TemporaryDirectory(prefix="profile_idx_") as root:
        store = SnapshotStore(os.path.join(root, "index"))
        _prewarm(spark, cpus)
        t0 = time.time()
        sid = build_index(spark, corpus, store, n_segments=64, source="profile")
        build_wall = time.time() - t0
        snap = store.snapshot(sid)
        searcher = IndexSearcher(spark, store)
        searcher.search_batch({0: qf.Term("warmup")}, k=5, with_urls=False).count()
        batch = _synthetic_queries(300)
        t0 = time.time()
        searcher.search_batch(batch, k=10, with_urls=False).count()
        q_wall = time.time() - t0
        out = {
            "cpus": cpus,
            "build_wall_s": round(build_wall, 2),
            "query300_s": round(q_wall, 2),
            "timings": snap["metrics"]["timings"],
            "docs_per_sec": snap["metrics"]["docs_per_sec"],
        }
    spark.stop()
    return out


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        print(json.dumps(single(int(sys.argv[i + 1]), sys.argv[i + 2])))
        return
    ndocs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 600_000
    cpus_list = [8, 32]
    for a in sys.argv:
        if a.startswith("--cpus"):
            cpus_list = [int(x) for x in a.split("=", 1)[1].split(",")]

    with tempfile.TemporaryDirectory(prefix="profile_corpus_") as cdir:
        corpus_dir = os.path.join(cdir, "corpus")
        gen = subprocess.run(
            [sys.executable, "-c", f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession
from iresearch_spark.fixtures.corpus import gen_corpus_spark
spark = (SparkSession.builder.master('local[32]')
         .config('spark.ui.enabled','false').getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
gen_corpus_spark(spark, {ndocs}).write.parquet({corpus_dir!r})
spark.stop()
"""],
            check=True,
        )
        results = {}
        for cpus in cpus_list:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(cpus), corpus_dir],
                capture_output=True, text=True, check=True, cwd=REPO,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
            print(json.dumps(results[cpus]), flush=True)
        if len(results) == 2:
            lo, hi = sorted(results)
            ratio = len(results[lo]) and (results[lo]["build_wall_s"] / results[hi]["build_wall_s"])
            print(f"\nbuild speedup {lo}->{hi} cores: {ratio:.2f}x; per-stage:")
            for k in results[lo]["timings"]:
                a, b = results[lo]["timings"][k], results[hi]["timings"][k]
                if isinstance(a, (int, float)) and b:
                    print(f"  {k:22s} {a:8.2f}s -> {b:8.2f}s  ({a / b:.2f}x)")
            qa, qb = results[lo]["query300_s"], results[hi]["query300_s"]
            print(f"  {'query300':22s} {qa:8.2f}s -> {qb:8.2f}s  ({qa / qb:.2f}x)")


if __name__ == "__main__":
    main()
