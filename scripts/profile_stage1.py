"""Micro-profile of build stage 1 at two widths: tokenize alone vs
tokenize + seg shuffle + docID window + parquet write.

Usage: python scripts/profile_stage1.py [ndocs]
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, corpus_dir: str) -> None:
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_ARENA_MAX", "4")
    from pyspark.sql import SparkSession, Window as W, functions as F

    from bench import _prewarm
    from iresearch_spark.build import kernels
    from iresearch_spark.fields import DEFAULT_FIELDS

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .appName(f"stage1_{cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    _prewarm(spark, cpus)
    fields = list(DEFAULT_FIELDS)
    out = {"cpus": cpus}

    corpus = spark.read.parquet(corpus_dir)
    t0 = time.time()
    corpus.count()
    out["read_count_s"] = round(time.time() - t0, 2)

    cols = ["seg_id", "url", "warc_ts", "lang", "html", "text"]
    src = corpus.withColumn(
        "seg_id",
        F.pmod(F.crc32(F.col("url").cast("binary")), F.lit(64)).cast("int"),
    ).select(*cols)
    tokenized = src.mapInArrow(
        kernels.make_tokenize_kernel(fields), kernels.TOKENIZED_SCHEMA
    )

    t0 = time.time()
    tokenized.select(F.count("*")).collect()
    out["tokenize_count_s"] = round(time.time() - t0, 2)

    w_assign = W.partitionBy("seg_id").orderBy("url")
    with tempfile.TemporaryDirectory(prefix="stage1_") as tmp:
        t0 = time.time()
        (
            tokenized.repartition(64, "seg_id")
            .withColumn("doc_id", F.row_number().over(w_assign).cast("bigint"))
            .select(
                "seg_id", "doc_id", "url", "warc_ts", "lang", "dl", "fdls",
                "terms", "tfids", "tfs", "positions", "ostarts", "olens",
                "pchars",
            )
            .withColumn("seg_part", F.col("seg_id"))
            .write.partitionBy("seg_part")
            .parquet(os.path.join(tmp, "assigned"), mode="overwrite")
        )
        out["full_stage1_s"] = round(time.time() - t0, 2)
        sz = 0
        for root, _d, fs in os.walk(tmp):
            sz += sum(os.path.getsize(os.path.join(root, f)) for f in fs)
        out["assigned_bytes"] = sz
    print(json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(int(sys.argv[i + 1]), sys.argv[i + 2])
        return
    ndocs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    with tempfile.TemporaryDirectory(prefix="stage1_corpus_") as cdir:
        corpus_dir = os.path.join(cdir, "corpus")
        subprocess.run(
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
        for cpus in (8, 32, 8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(cpus), corpus_dir],
                capture_output=True, text=True, check=True, cwd=REPO,
            )
            print([l for l in out.stdout.splitlines() if l.startswith("{")][-1],
                  flush=True)


if __name__ == "__main__":
    main()
