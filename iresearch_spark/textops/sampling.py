"""Corpus-shaping operators a large-scale training-data pipeline applies
after quality/dedup: deterministic sampling and per-source caps.

Both are pure JVM expression / window plans with byte-identical DuckDB
twins (driver entries `hash_sample`, `per_source_cap`); determinism comes
from content hashes and total orders, never RNG state, so reruns and
resumes produce identical corpora at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from iresearch_spark.textops.common import md5_long


def hash_sample(docs: DataFrame, rate_permille: int = 100) -> DataFrame:
    """Deterministic stable sampling: keep doc_id iff its md5 bucket
    (uniform in [0, 1000)) < rate_permille. The decision is a pure
    function of the doc key — stable across reruns, cluster sizes, and
    partial failures (unlike `df.sample`, whose RNG is partition-seeded)
    — and composable: a 100 permille corpus is a superset of the 50
    permille one. One narrow scan, no shuffle."""
    if not 0 <= rate_permille <= 1000:
        raise ValueError("rate_permille must be in [0, 1000]")
    bucket = md5_long(F.col("doc_id").cast("string")) % 1000
    return (
        docs.select("doc_id")
        .withColumn("bucket", bucket.cast("int"))
        .filter(F.col("bucket") < rate_permille)
        .orderBy("doc_id")
    )


def hash_sample_sql(rate_permille: int = 100) -> str:
    return f"""SELECT doc_id,
       (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000)::INT
         AS bucket
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000
      < {rate_permille}
ORDER BY doc_id"""


def per_source_cap(docs: DataFrame, cap: int = 3) -> DataFrame:
    """Domain balancing: keep at most `cap` docs per source (the
    per-domain cap every web-corpus recipe applies so no single host
    dominates), deterministic preference (n_chars desc, doc_id asc).

    One row_number window per source key: partition-local work after a
    single hash shuffle on source; skewed giant sources cost one fat
    partition — at 10^12 docs pre-aggregate with a per-partition head-cap
    (each partition only needs its own top `cap`) before the global
    window, the same two-phase trick the engine's top-k uses."""
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= cap)
        .select("doc_id", "source", "rn")
        .orderBy("source", "doc_id")
    )


def per_source_cap_sql(cap: int = 3) -> str:
    return f"""SELECT doc_id, source, rn FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
         )::INT AS rn
  FROM documents
)
WHERE rn <= {cap} ORDER BY source, doc_id"""


def token_shards(docs: DataFrame, budget: int = 2000) -> DataFrame:
    """Pack docs into ~budget-token shards in deterministic doc_id order
    — the shard-assembly step before training-data serialization (a doc
    lands in shard floor(exclusive_prefix_tokens / budget), so shards
    fill to >= budget and the assignment is a pure function of the
    corpus).

    The prefix sum is DISTRIBUTED: range-partition by doc_id, cumsum
    inside each partition under a partition-local window, then add each
    partition's exclusive offset (a per-partition one-row aggregate,
    broadcast back) — the same two-phase trick build docID assignment
    uses. No global single-task window anywhere, so the plan holds at
    10^12 docs."""
    from iresearch_spark.textops.common import tokens_col

    d = docs.select(
        "doc_id", F.size(tokens_col(F.col("text"))).cast("int").alias(
            "n_tokens"
        )
    )
    parts = max(d.rdd.getNumPartitions(), 1)

    # partition-local exclusive cumsum, vectorized per Arrow batch with a
    # running carry across batches — runs IN the range-partitioned layout
    # (a Window partitionBy(pid) would re-shuffle the whole table on pid,
    # which Catalyst can't see is already satisfied)
    def local_cumsum(batches):
        import numpy as np
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        run = 0
        for b in batches:
            n = b.column("n_tokens").to_numpy(zero_copy_only=False)
            pre = run + np.concatenate(([0], np.cumsum(n[:-1], dtype=np.int64)))
            run += int(n.sum())
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    b.column("n_tokens"),
                    pa.array(np.full(len(n), pid, dtype=np.int32)),
                    pa.array(pre.astype(np.int64)),
                ],
                names=["doc_id", "n_tokens", "pid", "local_pre"],
            )

    d = (
        d.repartitionByRange(parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .mapInArrow(
            local_cumsum,
            "doc_id bigint, n_tokens int, pid int, local_pre bigint",
        )
        # pin ONE materialization: the totals job and the final join must
        # see the SAME range boundaries / pid assignment (range
        # partitioning samples its bounds, so two independent executions
        # are not guaranteed identical)
        .localCheckpoint()
    )
    totals = d.groupBy("pid").agg(F.sum("n_tokens").alias("tot")).collect()
    off, offs = 0, {}
    for r in sorted(totals, key=lambda r: r["pid"]):
        offs[r["pid"]] = off
        off += int(r["tot"])
    spark = docs.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offs.items()], "pid int, off bigint"
    )
    return (
        d.join(F.broadcast(off_df), "pid")
        .select(
            "doc_id",
            "n_tokens",
            F.floor((F.col("off") + F.col("local_pre")) / budget)
            .cast("bigint")
            .alias("shard"),
        )
        .orderBy("doc_id")
    )


def token_shards_sql(budget: int = 2000) -> str:
    from iresearch_spark.textops.sqlgen import tokens_expr

    return f"""WITH d AS (
  SELECT doc_id, len({tokens_expr()})::INT AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS pre
  FROM d
)
SELECT doc_id, n_tokens, (pre // {budget})::BIGINT AS shard
FROM c ORDER BY doc_id"""


def keep_list(
    docs: DataFrame,
    rate_permille: int = 800,
    threshold: float = 0.5,
) -> DataFrame:
    """The composed corpus decision a pre-training pipeline materializes:
    keep a doc iff it passes the quality floor AND it is its near-dup
    cluster's representative (or unclustered) AND it falls in the
    deterministic hash sample. One row per doc with the final boolean —
    the keep-list downstream jobs semi-join against. All three inputs
    are the already-scale-safe ops (quality: narrow scan; clusters:
    label propagation; sample: pure hash), composed with two left
    equijoins on doc_id."""
    from iresearch_spark.textops import dedup, quality

    qual = quality.quality_scores(docs, top=2**31 - 1).select(
        "doc_id", "keep"
    )
    clusters = dedup.neardup_clusters(docs, threshold=threshold).select(
        "doc_id", F.col("keep").alias("dedup_keep")
    )
    samp = hash_sample(docs, rate_permille).select(
        "doc_id", F.lit(True).alias("in_sample")
    )
    return (
        qual.join(clusters, "doc_id", "left")
        .join(samp, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("keep")
                & F.coalesce(F.col("dedup_keep"), F.lit(True))
                & F.coalesce(F.col("in_sample"), F.lit(False))
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def keep_list_sql(rate_permille: int = 800, threshold: float = 0.5) -> str:
    from iresearch_spark.textops import dedup
    from iresearch_spark.textops.sqlgen import TOKEN_SPLIT_RE, tokens_expr

    raw = (
        f"list_filter(string_split_regex(lower(coalesce(text, '')), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )
    return f"""WITH RECURSIVE pairs AS (
  {dedup.lsh_verified_pairs_sql(threshold)}
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(node, m) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.m FROM e JOIN reach ON e.b = reach.node
),
lab AS (SELECT node AS doc_id, min(m) AS cluster FROM reach GROUP BY node),
qd AS (
  SELECT doc_id, {raw} AS raw, {tokens_expr()} AS kept,
         length(lower(coalesce(text, ''))) AS n_chars_c,
         length(lower(coalesce(text, '')))
           - length(regexp_replace(lower(coalesce(text, '')),
                                   '[^a-z0-9 ]', '', 'g')) AS n_punct
  FROM documents
),
qm AS (
  SELECT doc_id, len(raw)::INT AS n_tokens,
         CASE WHEN len(raw) > 0
              THEN round((len(raw) - len(kept))::DOUBLE / len(raw), 6)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_chars_c > 0
              THEN round(n_punct::DOUBLE / n_chars_c, 6)
              ELSE 0.0 END AS punct_ratio
  FROM qd
),
qual AS (
  SELECT doc_id,
         (n_tokens >= 10 AND stop_ratio <= 0.6 AND punct_ratio <= 0.3)
           AS qkeep
  FROM qm
),
samp AS (
  SELECT doc_id FROM documents
  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000
        < {rate_permille}
)
SELECT q.doc_id,
       (q.qkeep
        AND (l.cluster IS NULL OR l.doc_id = l.cluster)
        AND s.doc_id IS NOT NULL) AS keep
FROM qual q
LEFT JOIN lab l USING (doc_id)
LEFT JOIN samp s USING (doc_id)
ORDER BY q.doc_id"""
