"""Embedding similarity search over `embeddings(vec_id, embedding, label)`.

Brute-force cosine top-k is the correctness baseline (a single narrow scan
+ global top-k — at 100 TB it is one pass, no shuffle until the tiny final
limit). The scale path is hyperplane-LSH: bucket every vector by the sign
pattern of its dot products with P fixed hyperplanes, then search only the
query's bucket. Hyperplanes are taken deterministically from the table
itself (vec_id 1..P) so the DuckDB oracle can reproduce them exactly —
on a real cluster they'd be seeded Gaussian vectors broadcast to executors,
and the bucket column becomes the table's partition key so each query
touches one partition (partition pruning).

All arithmetic is float64 elementwise with sequential accumulation and
results rounded to 6 dp before ranking, making numpy/JVM/DuckDB agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact top-k neighbours of one stored vector by cosine (query row
    itself excluded). Returns (rank, vec_id, label, cos)."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = (
        emb.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", F.round(cos, 6).alias("cos"))
    )
    w = F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("vec_id")))
    return (
        scored.withColumn("rank", w.cast("int"))
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "label", "cos")
        .orderBy("rank")
    )


_COS_SQL = (
    "list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
)


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id})
SELECT CAST(rank AS INT) AS rank, vec_id, label, cos FROM (
  SELECT vec_id, label, round({_COS_SQL}, 6) AS cos,
         row_number() OVER (ORDER BY round({_COS_SQL}, 6) DESC, vec_id ASC) AS rank
  FROM embeddings e CROSS JOIN q
  WHERE vec_id <> {query_vec_id}
) WHERE rank <= {k} ORDER BY rank"""


def _bucket(emb: DataFrame, planes: DataFrame) -> DataFrame:
    """LSH bucket id per vector: bit p = (dot(v, plane_p) >= 0)."""
    d = emb.crossJoin(F.broadcast(planes)).select(
        "vec_id",
        "label",
        "embedding",
        "p",
        F.when(_dot(F.col("embedding"), F.col("pv")) >= 0, F.lit(1)).otherwise(0).alias("bit"),
    )
    return d.groupBy("vec_id", "label", "embedding").agg(
        F.sum(F.expr("shiftleft(cast(bit as bigint), p)")).alias("bucket")
    )


def lsh_ann_topk(
    emb: DataFrame, query_vec_id: int = 0, n_planes: int = 4, k: int = 5
) -> DataFrame:
    """ANN top-k: exact cosine, restricted to the query's LSH bucket."""
    planes = emb.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= n_planes)
    ).select((F.col("vec_id") - 1).cast("int").alias("p"), F.col("embedding").alias("pv"))
    bucketed = _bucket(emb, planes)
    qb = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket"), F.col("embedding").alias("qv")
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = (
        bucketed.crossJoin(F.broadcast(qb))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != query_vec_id))
        .select("vec_id", "label", F.round(cos, 6).alias("cos"))
    )
    return (
        scored.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("vec_id"))).cast("int"),
        )
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "label", "cos")
        .orderBy("rank")
    )


def lsh_ann_topk_sql(query_vec_id: int = 0, n_planes: int = 4, k: int = 5) -> str:
    dot_pv = (
        "list_dot_product(e.embedding::DOUBLE[], p.pv::DOUBLE[])"
    )
    return f"""
WITH planes AS (
  SELECT (vec_id - 1)::INT AS p, embedding AS pv FROM embeddings
  WHERE vec_id BETWEEN 1 AND {n_planes}
),
bucketed AS (
  SELECT e.vec_id, e.label, e.embedding,
         sum(CASE WHEN {dot_pv} >= 0 THEN (1::BIGINT << p.p) ELSE 0 END)::BIGINT AS bucket
  FROM embeddings e CROSS JOIN planes p
  GROUP BY e.vec_id, e.label, e.embedding
),
q AS (SELECT bucket AS qbucket, embedding AS qv FROM bucketed WHERE vec_id = {query_vec_id})
SELECT CAST(rank AS INT) AS rank, vec_id, label, cos FROM (
  SELECT e.vec_id, e.label, round({_COS_SQL}, 6) AS cos,
         row_number() OVER (ORDER BY round({_COS_SQL}, 6) DESC, e.vec_id ASC) AS rank
  FROM bucketed e CROSS JOIN q
  WHERE e.bucket = q.qbucket AND e.vec_id <> {query_vec_id}
) WHERE rank <= {k} ORDER BY rank"""
