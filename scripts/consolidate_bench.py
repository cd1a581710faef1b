"""Consolidation/merge benchmark at corpus scale (VERDICT r4 #2).

Two modes over an existing index (or a freshly built one):

* tier   — run `consolidate(consolidate_tier)` rounds on a many-segment
  index (the 64-segment scale20m build): measures merge wall time /
  docs-per-sec through the merge, disk high-water during the rounds,
  segments before/after, and asserts a 100-query batch returns the
  IDENTICAL (url, score) lists before and after (tie="url" — the total
  order that survives the docID remap).

* fresh  — byte-determinism: merge EVERY segment into one, build a
  fresh single-segment index over the same corpus, and assert the
  postings (blob/skip/bmax/positions), docs (urls per docID) and norms
  are byte-identical — the merged index IS the fresh index.  Run at 2M
  (one segment of 20M would be a single 25-min task; the determinism
  property is per-merge-kernel, not scale-dependent).

Usage (repo root):
    python scripts/consolidate_bench.py tier  <root> [max_segments]
    python scripts/consolidate_bench.py fresh <root> <n_docs>
`<root>` for tier mode must hold a scale20m-style index at <root>/index.
Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class _DiskWatch(threading.Thread):
    def __init__(self, path: str):
        super().__init__(daemon=True)
        self.path = path
        self.high_gb = 0.0
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            du = shutil.disk_usage(self.path)
            self.high_gb = max(
                self.high_gb, (du.total - du.free) / 2**30
            )
            self._stop.wait(2.0)

    def stop(self):
        self._stop.set()


def _query_results(spark, store, n_queries=100):
    from iresearch_spark.query.executor import IndexSearcher

    s = IndexSearcher(spark, store)
    batch = bench._synthetic_queries(n_queries)
    rows = s.search_batch(
        batch, k=10, with_urls=True, tie="url", score_round=6
    ).collect()
    return sorted(
        (int(r["qid"]), int(r["rank"]), r["url"], float(r["score"]))
        for r in rows
    )


def tier_mode(root: str, max_segments: int) -> None:
    from iresearch_spark.build.policy import consolidate, consolidate_tier
    from iresearch_spark.store import SnapshotStore

    spark = bench._mk_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    store = SnapshotStore(os.path.join(root, "index"))
    snap = store.snapshot()
    n_before = len(snap["segments"])
    n_docs = snap["stats"]["n_docs"]
    before = _query_results(spark, store)
    watch = _DiskWatch(root)
    watch.start()
    t0 = time.time()
    # max_segments_bytes stays at the policy DEFAULT (5 GB): the byte
    # cap bounds the OUTPUT segment, and a merged segment is encoded by
    # ONE task — an uncapped window (this bench first ran with a 60 GB
    # override) merges into 10 GB+ segments whose concurrent encodes
    # exhaust host RAM.  The cap is the scale discipline, not a tuning
    # knob.
    committed = consolidate(
        spark,
        store,
        consolidate_tier,
        max_segments=max_segments,
        min_score=0.0,
    )
    wall = time.time() - t0
    watch.stop()
    n_after = len(store.snapshot()["segments"])
    after = _query_results(spark, store)
    assert after == before, "query results changed across consolidation"
    print(
        json.dumps(
            {
                "metric": "consolidate_tier",
                "n_docs": n_docs,
                "segments_before": n_before,
                "segments_after": n_after,
                "merge_rounds": len(committed),
                "wall_s": round(wall, 1),
                "docs_per_sec_through_merge": round(n_docs / wall, 1),
                "disk_high_water_gb": round(watch.high_gb, 1),
                "query_identical_before_after": True,
            }
        )
    )
    spark.stop()


def fresh_mode(root: str, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from iresearch_spark.build.indexer import build_index
    from iresearch_spark.build.merge import merge_segments
    from iresearch_spark.fixtures.corpus import gen_corpus_spark
    from iresearch_spark.store import SnapshotStore

    spark = bench._mk_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    corpus_dir = os.path.join(root, "corpus")
    if not os.path.exists(corpus_dir):
        gen_corpus_spark(spark, n_docs).write.parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)

    multi = SnapshotStore(os.path.join(root, "multi"))
    if multi.snapshot() is None:
        build_index(spark, corpus, multi, n_segments=16, source="multi")
    t0 = time.time()
    seg_ids = [int(s["seg_id"]) for s in multi.snapshot()["segments"]]
    merge_segments(spark, multi, seg_ids)
    merge_s = time.time() - t0
    assert len(multi.snapshot()["segments"]) == 1

    fresh = SnapshotStore(os.path.join(root, "fresh"))
    if fresh.snapshot() is None:
        build_index(spark, corpus, fresh, n_segments=1, source="fresh")

    def table_hash(store, name, cols):
        sid = store.current_snapshot_id()
        if name == "postings":
            df = store.read_postings(spark, sid)
        elif name == "docs":
            df = store.read_docs(spark, sid)
        else:
            df = store.read_norms(spark, sid)
        hashed = df.select(
            *[
                F.md5(F.col(c).cast("binary")).alias(c)
                if dict(df.dtypes)[c] == "binary"
                else F.col(c).cast("string").alias(c)
                for c in cols
            ]
        )
        row = hashed.select(
            F.md5(
                F.concat_ws(
                    "\x01",
                    F.array_sort(
                        F.collect_list(F.concat_ws("\x00", *cols))
                    ).cast("string"),
                )
            ).alias("h")
        ).collect()[0]
        return row["h"]

    checks = {}
    for name, cols in {
        "postings": [
            "field", "term", "df", "cf", "blob", "skip", "bmax",
            "pos_off", "pos_pay",
        ],
        "docs": ["doc_id", "url", "dl"],
        "norms": ["fidx", "dls_bin"],
    }.items():
        hm = table_hash(multi, name, cols)
        hf = table_hash(fresh, name, cols)
        checks[name] = hm == hf
    print(
        json.dumps(
            {
                "metric": "merge_byte_determinism",
                "n_docs": n_docs,
                "merge_all_to_one_s": round(merge_s, 1),
                "byte_identical": checks,
            }
        )
    )
    assert all(checks.values()), checks
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "tier":
        tier_mode(
            sys.argv[2],
            int(sys.argv[3]) if len(sys.argv) > 3 else 8,
        )
    else:
        fresh_mode(sys.argv[2], int(sys.argv[3]))
