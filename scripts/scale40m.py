"""40M-doc scale point under the disk-frugal discipline (VERDICT r4 #9).

scale20m.py materializes the WHOLE corpus parquet first; at 40M that
alone (~58 GB) plus the accumulated index plus one append's staging
checkpoint overruns this host's ~95 GB effective disk.  This variant
generates each append batch's corpus SLICE on the fly (the generator is
deterministic in doc id, so slices are reproducible), writes it, builds
the append, and deletes the slice — peak scratch is one batch's corpus
+ one batch's staging + the accumulated index.

Usage (repo root):  python scripts/scale40m.py <root> <n_docs> <n_batches> <cpus>
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
    from iresearch_spark.build.indexer import build_index
    from iresearch_spark.query import filters as qf
    from iresearch_spark.query.executor import IndexSearcher
    from iresearch_spark.store import SnapshotStore

    store = SnapshotStore(os.path.join(root, "index"))
    seg_per_batch = max(64 // n_batches, 8)
    t0 = time.time()
    high_gb = 0.0
    snap0 = store.snapshot()
    # resume: completed appends each contributed seg_per_batch segments
    done_batches = (len(snap0["segments"]) // seg_per_batch) if snap0 else 0
    for b in range(done_batches, n_batches):
        src = f"scale40m-b{b}"
        tb = time.time()
        slice_dir = os.path.join(root, f"corpus_b{b}")
        if not os.path.exists(os.path.join(slice_dir, "_SUCCESS")):
            # deterministic CHUNK-RANGE slice: gen_chunk content depends
            # only on (seed, chunk_id), so generating chunks
            # [b·C/B, (b+1)·C/B) yields exactly that slice of the full
            # corpus — each batch generates only its OWN docs (a
            # url-hash filter over the full generator would cost B full
            # generations)
            import pyarrow as pa

            from iresearch_spark.fixtures.corpus import CHUNK_DOCS, gen_chunk

            n_chunks = (n_docs + CHUNK_DOCS - 1) // CHUNK_DOCS
            lo = (b * n_chunks) // n_batches
            hi = ((b + 1) * n_chunks) // n_batches

            def expand(batches):
                for batch in batches:
                    for cid in batch.column("id").to_pylist():
                        pdf = gen_chunk(int(cid), n_docs, 42)
                        yield pa.RecordBatch.from_pandas(
                            pdf, preserve_index=False
                        )

            (
                spark.range(lo, hi, 1, numPartitions=max(1, min(hi - lo, 256)))
                .mapInArrow(
                    expand,
                    "url string, warc_ts timestamp, html binary, "
                    "text string, lang string",
                )
                .write.parquet(slice_dir, mode="overwrite")
            )
        gen_s = time.time() - tb
        tb2 = time.time()
        build_index(
            spark,
            spark.read.parquet(slice_dir),
            store,
            n_segments=seg_per_batch,
            source=src,
            mode="replace" if store.snapshot() is None else "append",
        )
        du = shutil.disk_usage(root)
        used_gb = (du.total - du.free) / 2**30
        high_gb = max(high_gb, used_gb)
        shutil.rmtree(slice_dir, ignore_errors=True)
        print(
            json.dumps(
                {
                    "phase": f"append_{b}",
                    "gen_s": round(gen_s, 1),
                    "build_s": round(time.time() - tb2, 1),
                    "disk_used_gb": round(used_gb, 1),
                }
            ),
            flush=True,
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
                "disk_high_water_gb": round(high_gb, 1),
            }
        ),
        flush=True,
    )

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
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
