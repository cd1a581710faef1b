"""Adversarial hot-term skew bench for the salted level-1 merge (M1).

BASELINE.json:6 mandates "salted groupBy/repartitionByRange to defuse
hot-term skew".  The defense has two layers: segments bound any term to
n_docs/n_segments by construction, and the `band` column ((doc_id-1) >>
band_bits) splits a hot term's partials across doc-range bands so the
level-1 merge shuffle spreads the term over many reducers instead of
concatenating one pathological posting run on a single task.

This script builds the adversarial corpus the round-4 verdict asked for
— ONE term in ~50% of documents — runs the tokenize→assign→partials
pipeline once, then executes the level-1 merge shuffle BOTH ways on the
same partials:

* salted   — repartition(parts, seg_id, fidx, term, band)   (production)
* unsalted — repartition(parts, seg_id, fidx, term)         (strawman)

and reports, per variant: per-partition ROW spread (max/median) and the
merge stage's TASK-TIME spread (max/median executorRunTime via the Spark
UI REST API), plus wall time.  The pytest twin
(tests/test_build.py::test_salted_band_partition_spread) asserts the
row-spread bound on a small corpus.

Usage (repo root):  python scripts/skew_bench.py <n_docs> [parts]
Prints one JSON line per variant + a summary.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _task_skew(spark, min_tasks: int):
    """(max_ms, median_ms, n_tasks) of executorRunTime over the most
    recent completed stage with at least `min_tasks` tasks (the merge
    stage — the shuffle-read + mapInArrow side of the count job)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    stages.sort(key=lambda s: -s["stageId"])  # newest first
    for st in stages:
        if st["status"] != "COMPLETE":
            continue
        if st.get("numTasks", 0) < min_tasks:
            continue
        tasks = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/"
                f"{st['stageId']}/{st['attemptId']}/taskList?length=5000"
            )
        )
        times = [
            t["taskMetrics"]["executorRunTime"]
            for t in tasks
            if t.get("taskMetrics")
        ]
        if times:
            return max(times), statistics.median(times), st["numTasks"]
    return None, None, None


def main(n_docs: int, parts: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    os.environ.setdefault("MALLOC_ARENA_MAX", "4")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("skew_bench")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")  # REST API for task metrics
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from iresearch_spark.build import kernels
    from iresearch_spark.fields import DEFAULT_FIELDS

    # adversarial corpus: "hotterm" in 50% of docs (tf 8 — a boilerplate
    # token), 4 background words drawn from a 50k vocabulary
    corpus = (
        spark.range(n_docs)
        .select(
            F.format_string("%09d", F.col("id")).alias("url"),
            F.concat(
                F.when(
                    F.col("id") % 2 == 0,
                    F.lit("hotterm " * 8),
                ).otherwise(F.lit("")),
                F.format_string(
                    "w%d x%d y%d z%d",
                    F.col("id") % 49999,
                    (F.col("id") * 7) % 49999,
                    (F.col("id") * 13) % 49999,
                    (F.col("id") * 29) % 49999,
                ),
            ).alias("text"),
        )
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("warc_ts", F.lit(None).cast("timestamp"))
        .withColumn("lang", F.lit(None).cast("string"))
    )
    field_specs = list(DEFAULT_FIELDS)
    # FEW, HUGE segments: banding is the level the indexer enables "when
    # segments are huge" — with many segments the url-hash sharding
    # already spreads any term, so the adversarial case is a handful of
    # 1M+-doc segments fanned out over many reducers
    n_segments = 4
    tokenized = corpus.select(
        "url", "warc_ts", "lang", "html", "text",
    ).withColumn(
        "seg_id", (F.crc32(F.col("url")) % n_segments).cast("int")
    ).select("seg_id", "url", "warc_ts", "lang", "html", "text").mapInArrow(
        kernels.make_tokenize_kernel(field_specs, ()),
        kernels.TOKENIZED_SCHEMA,
    )
    from pyspark.sql import Window as W

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
            16, [f.offsets for f in field_specs],
            [f.payloads for f in field_specs],
        ),
        kernels.PARTIAL_SCHEMA,
    )
    # checkpoint the partials once so both variants shuffle identical input
    part_dir = os.path.join("_scratch_skew", "partials")
    if not os.path.exists(os.path.join(part_dir, "_SUCCESS")):
        partials.write.parquet(part_dir, mode="overwrite")
    partials = spark.read.parquet(part_dir)

    report = {}
    for name, keys in {
        "salted": ["seg_id", "fidx", "term", "band"],
        "unsalted": ["seg_id", "fidx", "term"],
    }.items():
        shuffled = partials.repartition(parts, *keys).sortWithinPartitions(
            "seg_id", "fidx", "term", "band", "min_doc"
        )
        # per-partition ENTRY-mass spread of the shuffle layout: partials
        # rows are pre-merged runs, so the reducer's work is Σn (posting
        # entries), not the row count
        rows = (
            shuffled.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.sum("n").alias("mass"))
            .collect()
        )
        counts = sorted(int(r["mass"]) for r in rows)
        row_max = counts[-1]
        row_med = statistics.median(counts)
        # the real merge work on that layout
        t0 = time.time()
        merged = shuffled.mapInArrow(
            kernels.merge_kernel, kernels.PARTIAL_SCHEMA
        )
        n_out = merged.count()
        wall = time.time() - t0
        tmax, tmed, ntasks = _task_skew(spark, parts)
        report[name] = {
            "keys": keys,
            "partitions": len(counts),
            "entries_max": row_max,
            "entries_median": row_med,
            "row_spread": round(row_max / max(row_med, 1), 2),
            "merge_wall_s": round(wall, 2),
            "merged_rows": n_out,
            "task_ms_max": tmax,
            "task_ms_median": tmed,
            "task_spread": round(tmax / max(tmed, 1), 2)
            if tmax is not None
            else None,
            "stage_tasks": ntasks,
        }
        print(json.dumps({name: report[name]}))
    print(
        json.dumps(
            {
                "metric": "hot_term_skew_salting",
                "n_docs": n_docs,
                "hot_df": n_docs // 2,
                "parts": parts,
                "salted_row_spread": report["salted"]["row_spread"],
                "unsalted_row_spread": report["unsalted"]["row_spread"],
                "salted_task_spread": report["salted"]["task_spread"],
                "unsalted_task_spread": report["unsalted"]["task_spread"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 64,
    )
