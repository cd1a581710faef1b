"""Embedding similarity search over `embeddings(vec_id, embedding, label)`.

Brute-force cosine top-k is the correctness baseline (a single narrow scan
+ global top-k — at 100 TB it is one pass, no shuffle until the tiny final
limit). The scale path is hyperplane-LSH with multi-probe: bucket every
vector by the sign pattern of its dot products with P seeded hyperplanes,
then search the query's bucket plus every bucket within Hamming distance
`probe_hamming` of it (multi-probe widens recall without touching the
rest of the corpus). Hyperplane components are derived from the shared
md5_long hash (uniform in [-1, 1)), so the planes are a pure function of
(seed, plane, component) — broadcastable on a real cluster, and byte-
reproducible by the DuckDB oracle.

A second, independent scale path is IVF (inverted-file) ANN: a coarse
quantizer of `n_lists` centroids (corpus vectors sampled in seeded hash
order — FAISS-style random init, quantizer-agnostic layout) assigns every
vector to its nearest-centroid list; queries rank centroids and scan only
the `nprobe` closest lists. Like LSH it has an inline small-scale oracle
(`ivf_ann_topk`) and a materialized production path (`build_ivf_index` +
`ivf_ann_topk_indexed`, list_id as the partition key, pruned reads).

Two LSH query paths share the same bucket formula:

* `lsh_ann_topk` — recomputes every vector's bucket inline. Small-scale
  verification oracle ONLY (one full-corpus pass per query).
* `build_ann_index` + `lsh_ann_topk_indexed` — the production path. The
  bucket is computed ONCE per vector and persisted as the table's
  partition key; a query buckets only its own vector (a 1×P job), then
  reads the ≤ C(P, probe)+1 probed bucket partitions via partition
  pruning (plan-asserted in tests/test_ann_index.py), never the full
  corpus. At 100 TB this is the difference between ANN and a scan.

All arithmetic is float64 elementwise with sequential accumulation and
results rounded to 6 dp before ranking, making numpy/JVM/DuckDB agree.
"""

from __future__ import annotations

import itertools
import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iresearch_spark.textops.common import md5_long

_U60 = float(1 << 60)


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


def seeded_planes(spark, dim: int, n_planes: int, seed: str = "plane") -> DataFrame:
    """P hyperplanes with components uniform in [-1, 1), derived from the
    shared md5_long hash of (seed, plane, component) — identical in the
    DuckDB oracle, broadcastable on a cluster."""
    return spark.range(n_planes).select(
        F.col("id").cast("int").alias("p"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                md5_long(
                    F.concat(
                        F.lit(seed + ":"),
                        F.col("id").cast("string"),
                        F.lit(":"),
                        i.cast("string"),
                    )
                )
                / F.lit(_U60)
            )
            * 2.0
            - 1.0,
        ).alias("pv"),
    )


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
    emb: DataFrame,
    query_vec_id: int = 0,
    n_planes: int = 8,
    k: int = 5,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: exact cosine restricted to the query's LSH bucket plus
    every bucket within `probe_hamming` bit flips (multi-probe).

    Small-scale verification oracle ONLY — it re-buckets the whole corpus
    per call. The production path is `build_ann_index` +
    `lsh_ann_topk_indexed` (bucket materialized once, partition-pruned
    reads)."""
    dim = int(emb.select(F.size("embedding")).first()[0])
    planes = seeded_planes(emb.sparkSession, dim, n_planes)
    bucketed = _bucket(emb, planes)
    qb = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket"), F.col("embedding").alias("qv")
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = (
        bucketed.crossJoin(F.broadcast(qb))
        .filter(
            (
                F.bit_count(
                    F.col("bucket").bitwiseXOR(F.col("qbucket"))
                )
                <= probe_hamming
            )
            & (F.col("vec_id") != query_vec_id)
        )
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


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: str = "plane",
    top: int = 100,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS, the scale path: hyperplane
    sign signature per vector (P bits, same seeded planes as ANN), split
    into `n_bands` bands of P/n_bands bits; candidate pairs are vectors
    sharing ANY band value (a band-bucket equijoin — the MinHash-LSH
    pair-generation shape of dedup.lsh_pairs, so shuffle volume is bounded
    by band-bucket sizes, never the n^2 cross join); candidates are then
    verified with EXACT cosine and kept at >= threshold.

    Deterministic (frozen planes -> frozen candidate set) and byte-
    reproducible by the DuckDB twin. Like every banded LSH, recall < 1 by
    design: a pair is seen iff some band's bits all agree — raise
    n_planes/bits-per-band for precision, n_bands for recall. Returns
    (vec_id_a, vec_id_b, cos) ordered by cos desc."""
    dim = int(emb.select(F.size("embedding")).first()[0])
    if n_planes % n_bands:
        raise ValueError("n_planes must be divisible by n_bands")
    bits = n_planes // n_bands
    mask = (1 << bits) - 1
    planes = seeded_planes(emb.sparkSession, dim, n_planes, seed)
    sig = _bucket(emb, planes)
    bands = sig.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        F.expr(f"shiftright(bucket, band * {bits}) & {mask}").alias("key"),
    )
    left = bands.select(
        F.col("vec_id").alias("vec_id_a"), "band", "key"
    )
    right = bands.select(
        F.col("vec_id").alias("vec_id_b"), "band", "key"
    )
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        cand.join(ea, "vec_id_a")
        .join(eb, "vec_id_b")
        .select("vec_id_a", "vec_id_b", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .orderBy(F.desc("cos"), "vec_id_a", "vec_id_b")
        .limit(top)
    )


def cosine_neardup_pairs_sql(
    threshold: float = 0.35,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: str = "plane",
    top: int = 100,
) -> str:
    bits = n_planes // n_bands
    mask = (1 << bits) - 1
    dot_pv = "list_dot_product(e.embedding::DOUBLE[], p.pv::DOUBLE[])"
    comp = (
        f"((('0x' || substr(md5('{seed}:' || p || ':' || i), 1, 15))::BIGINT"
        f" / {1 << 60}.0) * 2.0 - 1.0)"
    )
    pair_cos = (
        "list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[])))"
    )
    return f"""
WITH dim AS (SELECT any_value(len(embedding)) AS d FROM embeddings),
planes AS (
  SELECT t.p::INT AS p,
         list_transform(range(0, (SELECT d FROM dim)), i -> {comp}) AS pv
  FROM range(0, {n_planes}) t(p)
),
sig AS (
  SELECT e.vec_id,
         sum(CASE WHEN {dot_pv} >= 0 THEN (1::BIGINT << p.p) ELSE 0 END)::BIGINT AS bucket
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
),
bands AS (
  SELECT vec_id, t.b,
         (bucket >> (t.b * {bits})) & {mask} AS key
  FROM sig CROSS JOIN range(0, {n_bands}) t(b)
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key
  WHERE a.vec_id < b.vec_id
),
scored AS (
  SELECT c.vec_id_a, c.vec_id_b, round({pair_cos}, 6) AS cos
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.vec_id_a
  JOIN embeddings eb ON eb.vec_id = c.vec_id_b
)
SELECT vec_id_a, vec_id_b, cos FROM scored
WHERE cos >= {threshold}
ORDER BY cos DESC, vec_id_a, vec_id_b LIMIT {top}"""


# --------------------------------------------------------------- IVF ANN


def seeded_centroids(
    emb: DataFrame, n_lists: int, seed: str = "centroid"
) -> DataFrame:
    """IVF coarse quantizer: `n_lists` centroid vectors sampled from the
    corpus itself in md5-hash order (deterministic, parallelism-invariant,
    and SQL-reproducible — FAISS-style random init without training).
    Returns (cid, cv) where cid is the chosen vector's vec_id.

    Spark plan: TakeOrderedAndProject — a distributed per-partition top-C
    merge, never a global sort; scale-safe at any corpus size. On a real
    cluster a trained quantizer (k-means over a sample) is a drop-in: the
    index layout and query path below are quantizer-agnostic."""
    h = md5_long(
        F.concat(F.lit(seed + ":"), F.col("vec_id").cast("string"))
    )
    return (
        emb.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"), h.alias("h")
        )
        .orderBy("h", "cid")
        .limit(n_lists)
        .drop("h")
    )


def ivf_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (rounded to
    6 dp; ties -> lowest cid). One broadcast cross join + a map-side
    max_by aggregate — no window sort, no corpus shuffle beyond the
    groupBy(vec_id) combine. Returns emb columns + list_id."""
    cc = F.round(
        _dot(F.col("embedding"), F.col("cv"))
        / (_norm(F.col("embedding")) * _norm(F.col("cv"))),
        6,
    )
    scored = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", "cid", cc.alias("cc"))
    )
    best = scored.groupBy("vec_id").agg(
        F.expr("max_by(cid, struct(cc, -cid))").alias("list_id")
    )
    return emb.join(best, "vec_id")


def quantization_error(emb: DataFrame, cent: DataFrame) -> float:
    """Mean (1 - cos(vector, its nearest centroid)) over the corpus — the
    coarse quantizer's objective. One assignment pass (broadcast cross
    join + map-side max_by) + a scalar aggregate; used to compare
    quantizers (seeded init vs Lloyd-trained)."""
    a = ivf_assign(emb, cent).select(
        "vec_id", "embedding", F.col("list_id").alias("cid")
    )
    cos = _dot(F.col("embedding"), F.col("cv")) / (
        _norm(F.col("embedding")) * _norm(F.col("cv"))
    )
    row = (
        a.join(F.broadcast(cent), "cid")
        .agg(F.avg(F.lit(1.0) - cos).alias("err"))
        .collect()[0]
    )
    return float(row["err"])


def train_centroids(
    emb: DataFrame,
    n_lists: int,
    iters: int = 4,
    seed: str = "centroid",
    sample_mod: int | None = None,
) -> DataFrame:
    """Lloyd-refined coarse quantizer (k-means over the corpus or a
    deterministic sample): start from `seeded_centroids` and iterate
    assign -> per-list mean. Distributed shape per iteration: one
    broadcast-join assignment (same fold expressions as `ivf_assign`, so
    trained centroids drop into the identical index/query path) + one
    posexplode/groupBy(list, dim) partial-aggregated sum — the only
    driver-side state is the C x dim centroid matrix itself, which any
    IVF quantizer holds by design. `sample_mod=m` trains on the ~1/m
    deterministic vec_id-hash sample (the FAISS practice at corpus
    scale); assignment of the FULL corpus happens later at
    `build_ivf_index` time regardless. Cosine ranking is scale-invariant,
    so per-list means need no re-normalization. Empty lists keep their
    previous centroid. Deterministic: seeded init, fixed iteration count,
    order-independent aggregates."""
    spark = emb.sparkSession
    train = emb
    if sample_mod is not None and sample_mod > 1:
        train = emb.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(sample_mod)) == 0
        )
    prev = {
        int(r["cid"]): [float(x) for x in r["cv"]]
        for r in seeded_centroids(emb, n_lists, seed).collect()
    }
    for _ in range(max(0, iters)):
        cent = spark.createDataFrame(
            sorted(prev.items()), "cid long, cv array<float>"
        )
        sums = (
            ivf_assign(train, cent)
            .select("list_id", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(
                F.sum(F.col("val").cast("double")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        means: dict[int, dict[int, float]] = {}
        for r in sums:
            means.setdefault(int(r["list_id"]), {})[int(r["pos"])] = float(
                r["s"]
            ) / int(r["n"])
        prev = {
            cid: (
                [means[cid][p] for p in range(len(cv))]
                if cid in means
                else cv
            )
            for cid, cv in prev.items()
        }
    return spark.createDataFrame(
        sorted(prev.items()), "cid long, cv array<float>"
    )


def _probe_lists(cent: DataFrame, qv_df: DataFrame, nprobe: int) -> DataFrame:
    """The nprobe centroid lists closest to the query vector (tiny:
    C rows in, nprobe out)."""
    cc = F.round(
        _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))),
        6,
    )
    return (
        cent.crossJoin(F.broadcast(qv_df))
        .select(F.col("cid").alias("list_id"), cc.alias("cc"))
        .orderBy(F.desc("cc"), F.asc("list_id"))
        .limit(nprobe)
        .select("list_id")
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    return (
        scored.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("cos"), F.asc("vec_id")))
            .cast("int"),
        )
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "label", "cos")
        .orderBy("rank")
    )


def ivf_ann_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    n_lists: int = 16,
    nprobe: int = 4,
    k: int = 5,
    seed: str = "centroid",
) -> DataFrame:
    """IVF ANN top-k, inline path: coarse-quantize the corpus into
    `n_lists` centroid lists, rank centroids against the query, and run
    exact cosine over the `nprobe` closest lists only.

    Small-scale verification oracle ONLY (it re-assigns the whole corpus
    per call) — the production path is `build_ivf_index` +
    `ivf_ann_topk_indexed` (assignment materialized once as the table's
    partition key, queries prune to the probed lists)."""
    cent = seeded_centroids(emb, n_lists, seed)
    assigned = ivf_assign(emb, cent)
    qv_df = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    lists = _probe_lists(cent, qv_df, nprobe)
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = (
        assigned.join(F.broadcast(lists), "list_id")
        .filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qv_df))
        .select("vec_id", "label", F.round(cos, 6).alias("cos"))
    )
    return _rank_topk(scored, k)


def ivf_ann_topk_sql(
    query_vec_id: int = 0,
    n_lists: int = 16,
    nprobe: int = 4,
    k: int = 5,
    seed: str = "centroid",
) -> str:
    cos_ec = (
        "list_dot_product(e.embedding::DOUBLE[], c.cv::DOUBLE[])"
        " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(c.cv::DOUBLE[], c.cv::DOUBLE[])))"
    )
    cos_cq = (
        "list_dot_product(c.cv::DOUBLE[], q.qv::DOUBLE[])"
        " / (sqrt(list_dot_product(c.cv::DOUBLE[], c.cv::DOUBLE[]))"
        " * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
    )
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cv
  FROM embeddings
  ORDER BY ('0x' || substr(md5('{seed}:' || vec_id), 1, 15))::BIGINT, vec_id
  LIMIT {n_lists}
),
sc AS (
  SELECT e.vec_id, c.cid, round({cos_ec}, 6) AS cc
  FROM embeddings e CROSS JOIN cent c
),
assign AS (
  SELECT vec_id, cid AS list_id FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
    FROM sc
  ) WHERE rn = 1
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
qlists AS (
  SELECT c.cid AS list_id
  FROM cent c CROSS JOIN q
  ORDER BY round({cos_cq}, 6) DESC, c.cid ASC
  LIMIT {nprobe}
),
cand AS (
  SELECT e.vec_id, e.label, e.embedding
  FROM embeddings e
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN qlists l ON l.list_id = a.list_id
  WHERE e.vec_id <> {query_vec_id}
)
SELECT CAST(rank AS INT) AS rank, vec_id, label, cos FROM (
  SELECT e.vec_id, e.label, round({_COS_SQL}, 6) AS cos,
         row_number() OVER (ORDER BY round({_COS_SQL}, 6) DESC, e.vec_id ASC) AS rank
  FROM cand e CROSS JOIN q
) WHERE rank <= {k} ORDER BY rank"""


def ivf_ann_topk_batch_sql(
    query_vec_ids: tuple[int, ...] = (0, 3, 17),
    n_lists: int = 16,
    nprobe: int = 4,
    k: int = 5,
    seed: str = "centroid",
) -> str:
    """DuckDB twin of `ivf_ann_topk_batch`: the batch is semantically the
    UNION of per-query IVF lookups (the batching is a physical-plan
    amortization, not a semantic change), so the oracle is a UNION ALL of
    the single-query oracle tagged with qid."""
    parts = [
        f"SELECT CAST({qid} AS BIGINT) AS qid, * FROM ("
        + ivf_ann_topk_sql(
            query_vec_id=qid, n_lists=n_lists, nprobe=nprobe, k=k, seed=seed
        )
        + ")"
        for qid in query_vec_ids
    ]
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY qid, rank"
    )


_IVF_META = "_ivf_meta.json"  # leading "_": invisible to parquet readers


def build_ivf_index(
    emb: DataFrame,
    out_dir: str,
    n_lists: int = 16,
    seed: str = "centroid",
    train_iters: int = 0,
    train_sample_mod: int | None = None,
) -> str:
    """Materialize the IVF index: assign every vector to its nearest
    centroid ONCE and persist (vec_id, label, embedding) PARTITIONED BY
    list_id, plus a meta sidecar freezing the centroids themselves (so
    queries never rescan the corpus to recover the quantizer). One
    broadcast-join pass at build time; queries prune to nprobe lists.
    `train_iters > 0` refines the seeded init with that many Lloyd
    iterations (`train_centroids`) before assignment — the index layout
    and query path are identical either way."""
    spark = emb.sparkSession
    if train_iters > 0:
        cent_src = train_centroids(
            emb, n_lists, iters=train_iters, seed=seed,
            sample_mod=train_sample_mod,
        )
    else:
        cent_src = seeded_centroids(emb, n_lists, seed)
    cent_rows = cent_src.collect()  # C rows, tiny
    cent = spark.createDataFrame(
        [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in cent_rows],
        "cid long, cv array<float>",
    )
    ivf_assign(emb, cent).write.partitionBy("list_id").parquet(
        out_dir, mode="overwrite"
    )
    with open(os.path.join(out_dir, _IVF_META), "w") as f:
        json.dump(
            {
                "n_lists": n_lists,
                "seed": seed,
                "train_iters": train_iters,
                "centroids": [
                    {"cid": int(r["cid"]), "cv": [float(x) for x in r["cv"]]}
                    for r in cent_rows
                ],
            },
            f,
        )
    return out_dir


def ivf_index_scan(
    spark: SparkSession, index_dir: str, list_ids: list[int]
) -> DataFrame:
    """List-pruned scan of a materialized IVF index: reads ONLY the probed
    list partitions (partition pruning on the `list_id` partition
    column)."""
    return spark.read.parquet(index_dir).filter(
        F.col("list_id").isin([int(x) for x in list_ids])
    )


def ivf_ann_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    emb: DataFrame,
    query_vec_id: int = 0,
    nprobe: int = 4,
    k: int = 5,
) -> DataFrame:
    """Production IVF ANN top-k against a `build_ivf_index` table: rank
    the sidecar's frozen centroids against the query vector (a C-row
    mini-job using the SAME fold expressions as the build, so scores
    cannot drift), then exact cosine over the pruned probed list
    partitions only. Rank-identical to `ivf_ann_topk` (tested)."""
    with open(os.path.join(index_dir, _IVF_META)) as f:
        meta = json.load(f)
    cent = spark.createDataFrame(
        [(int(c["cid"]), [float(x) for x in c["cv"]]) for c in meta["centroids"]],
        "cid long, cv array<float>",
    )
    qv_df = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    lists = [int(r["list_id"]) for r in _probe_lists(cent, qv_df, nprobe).collect()]
    cand = ivf_index_scan(spark, index_dir, lists).filter(
        F.col("vec_id") != query_vec_id
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = cand.crossJoin(F.broadcast(qv_df)).select(
        "vec_id", "label", F.round(cos, 6).alias("cos")
    )
    return _rank_topk(scored, k)


def ivf_ann_topk_batch(
    spark: SparkSession,
    index_dir: str,
    emb: DataFrame,
    query_vec_ids: list[int],
    nprobe: int = 4,
    k: int = 5,
) -> DataFrame:
    """Batched IVF ANN: MANY query vectors against one materialized index
    in ONE pruned job — the deployment shape where thousands of lookups
    share a driver (the ANN analogue of the engine's `search_batch`).

    Plan: rank the sidecar centroids per query (a Q x C broadcast cross
    join, tiny), keep each query's `nprobe` lists, scan the UNION of all
    probed list partitions once (partition-pruned — a list shared by many
    queries is read once, not per query), broadcast-join the (qid, list)
    probe table + query vectors onto it, and take per-query top-k with a
    qid-partitioned window. Per-query results are rank-identical to
    `ivf_ann_topk_indexed` (tested). Returns (qid, rank, vec_id, label,
    cos)."""
    with open(os.path.join(index_dir, _IVF_META)) as f:
        meta = json.load(f)
    cent = spark.createDataFrame(
        [(int(c["cid"]), [float(x) for x in c["cv"]]) for c in meta["centroids"]],
        "cid long, cv array<float>",
    )
    q_df = emb.filter(
        F.col("vec_id").isin([int(q) for q in query_vec_ids])
    ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    cc = F.round(
        _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))),
        6,
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cc"), F.asc("cid"))
    probe = (
        q_df.crossJoin(F.broadcast(cent))
        .select("qid", "cid", cc.alias("cc"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("qid", F.col("cid").alias("list_id"))
    )
    # ≤ Q*nprobe rows: the probed-partition union for the pruned scan
    lists = sorted({int(r["list_id"]) for r in probe.collect()})
    cand = (
        ivf_index_scan(spark, index_dir, lists)
        .join(F.broadcast(probe), "list_id")
        .join(F.broadcast(q_df), "qid")
        .filter(F.col("vec_id") != F.col("qid"))
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.select("qid", "vec_id", "label", F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("rank").cast("int").alias("rank"), "vec_id", "label", "cos")
        .orderBy("qid", "rank")
    )


def _refresh_partitioned_index(
    spark: SparkSession,
    index_dir: str,
    delta: DataFrame,
    key: str,
    mode: str,
) -> None:
    """Shared incremental-refresh machinery for the materialized ANN
    indexes (`key` = "bucket" for LSH, "list_id" for IVF). `delta` is the
    already-keyed delta table (same columns as the stored index).

    append: new vec_ids only — one file-append into the delta's key
    partitions; untouched partitions are not rewritten.

    upsert: re-embedded vec_ids — every TOUCHED partition (a replaced
    vec_id's OLD key ∪ the delta's NEW keys) is rewritten as
    (old rows minus replaced ids) ∪ delta via dynamic partition
    overwrite; untouched partitions' files stay in place. Finding the old
    keys is one column-pruned (vec_id, key) scan of the index — the exact
    projection a production deployment would keep as its id→partition
    lookup table. Cost is proportional to the touched partitions'
    footprint, never the corpus."""
    if mode == "append":
        delta.write.partitionBy(key).parquet(index_dir, mode="append")
        return
    if mode != "upsert":
        raise ValueError(f"mode must be append|upsert, got {mode!r}")
    ids = delta.select("vec_id")
    stored = spark.read.parquet(index_dir)
    old_keys = (
        stored.join(F.broadcast(ids), "vec_id")
        .select(key)
        .distinct()
        .collect()
    )
    new_keys = delta.select(key).distinct().collect()
    touched = sorted({int(r[key]) for r in old_keys + new_keys})
    if not touched:
        return
    keep = stored.filter(F.col(key).isin(touched)).join(
        F.broadcast(ids), "vec_id", "left_anti"
    )
    # localCheckpoint materializes the merged partitions and truncates the
    # lineage back to index_dir — Spark (rightly) refuses to overwrite a
    # path its write plan still reads from. The touched partitions are the
    # delta's footprint, so the materialization is delta-sized.
    merged = (
        keep.select(*delta.columns).unionByName(delta).localCheckpoint()
    )
    present = {int(r[key]) for r in merged.select(key).distinct().collect()}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.partitionBy(key).parquet(index_dir, mode="overwrite")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite cannot delete a partition that ends up with ZERO
    # rows (nothing is written under it, so the old files survive) — drop
    # any such emptied partition directory explicitly
    for k_val in set(touched) - present:
        part_dir = os.path.join(index_dir, f"{key}={k_val}")
        if os.path.isdir(part_dir):
            import shutil

            shutil.rmtree(part_dir)


def refresh_ann_index(
    emb_delta: DataFrame, index_dir: str, mode: str = "append"
) -> str:
    """Incrementally refresh a materialized LSH bucket index (the
    per-bucket refresh `build_ann_index` promises): bucket ONLY the delta
    with the frozen sidecar planes, then append (new vectors) or
    dynamic-partition-overwrite upsert (re-embedded vectors). The planes
    are frozen in the meta sidecar, so delta buckets cannot drift from
    the stored ones."""
    spark = emb_delta.sparkSession
    with open(os.path.join(index_dir, _ANN_META)) as f:
        meta = json.load(f)
    planes = seeded_planes(
        spark, int(meta["dim"]), int(meta["n_planes"]), meta["seed"]
    )
    delta = _bucket(emb_delta, planes)
    _refresh_partitioned_index(spark, index_dir, delta, "bucket", mode)
    return index_dir


def refresh_ivf_index(
    emb_delta: DataFrame, index_dir: str, mode: str = "append"
) -> str:
    """Incrementally refresh a materialized IVF index: assign ONLY the
    delta against the frozen sidecar centroids (the quantizer is never
    retrained on refresh — standard IVF practice; retrain = rebuild),
    then append or dynamic-partition-overwrite upsert into the touched
    list partitions."""
    spark = emb_delta.sparkSession
    with open(os.path.join(index_dir, _IVF_META)) as f:
        meta = json.load(f)
    cent = spark.createDataFrame(
        [(int(c["cid"]), [float(x) for x in c["cv"]]) for c in meta["centroids"]],
        "cid long, cv array<float>",
    )
    delta = ivf_assign(emb_delta, cent)
    _refresh_partitioned_index(spark, index_dir, delta, "list_id", mode)
    return index_dir


_ANN_META = "_ann_meta.json"  # leading "_": invisible to parquet readers


def build_ann_index(
    emb: DataFrame,
    out_dir: str,
    n_planes: int = 8,
    seed: str = "plane",
) -> str:
    """Materialize the LSH bucket index: compute each vector's bucket once
    and persist (vec_id, label, embedding) PARTITIONED BY bucket, plus a
    meta sidecar freezing (dim, n_planes, seed). One full pass over the
    corpus at build time; queries then prune to the probed partitions.

    On a real cluster the write is one shuffle-free scan (bucket is a
    narrow projection of the embedding); dynamic partition overwrite makes
    incremental refresh per-bucket."""
    dim = int(emb.select(F.size("embedding")).first()[0])
    planes = seeded_planes(emb.sparkSession, dim, n_planes, seed)
    bucketed = _bucket(emb, planes)
    bucketed.write.partitionBy("bucket").parquet(out_dir, mode="overwrite")
    with open(os.path.join(out_dir, _ANN_META), "w") as f:
        json.dump({"dim": dim, "n_planes": n_planes, "seed": seed}, f)
    return out_dir


def probed_buckets(qbucket: int, n_planes: int, probe_hamming: int) -> list[int]:
    """All bucket ids within `probe_hamming` bit flips of qbucket
    (multi-probe set; size sum_{r<=probe} C(P, r) — driver-side tiny)."""
    out = {int(qbucket)}
    for r in range(1, probe_hamming + 1):
        for combo in itertools.combinations(range(n_planes), r):
            b = int(qbucket)
            for p in combo:
                b ^= 1 << p
            out.add(b)
    return sorted(out)


def ann_index_scan(
    spark: SparkSession, index_dir: str, qbucket: int, probe_hamming: int = 1
) -> DataFrame:
    """Bucket-pruned scan of a materialized ANN index: reads ONLY the
    probed bucket partitions (partition pruning on the `bucket` partition
    column — the plan's PartitionFilters carries the IN-list)."""
    with open(os.path.join(index_dir, _ANN_META)) as f:
        meta = json.load(f)
    probed = probed_buckets(qbucket, int(meta["n_planes"]), probe_hamming)
    return spark.read.parquet(index_dir).filter(F.col("bucket").isin(probed))


def lsh_ann_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 5,
    probe_hamming: int = 1,
) -> DataFrame:
    """Production ANN top-k against a `build_ann_index` table: bucket the
    query vector alone (a 1×P mini-job using the SAME fold expressions as
    the build, so the bit pattern cannot drift), then exact cosine over
    the pruned probed partitions only. Rank-identical to `lsh_ann_topk`
    (tested) and to the DuckDB oracle."""
    with open(os.path.join(index_dir, _ANN_META)) as f:
        meta = json.load(f)
    qrow = emb.filter(F.col("vec_id") == query_vec_id)
    planes = seeded_planes(
        spark, int(meta["dim"]), int(meta["n_planes"]), meta["seed"]
    )
    q = _bucket(qrow, planes).first()
    if q is None:
        raise KeyError(f"query vec_id {query_vec_id} not found")
    qbucket = int(q["bucket"])
    qdf = qrow.select(F.col("embedding").alias("qv"))
    cand = ann_index_scan(spark, index_dir, qbucket, probe_hamming).filter(
        F.col("vec_id") != query_vec_id
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = cand.crossJoin(F.broadcast(qdf)).select(
        "vec_id", "label", F.round(cos, 6).alias("cos")
    )
    return (
        scored.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("cos"), F.asc("vec_id")))
            .cast("int"),
        )
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "label", "cos")
        .orderBy("rank")
    )


def lsh_ann_topk_batch(
    spark: SparkSession,
    index_dir: str,
    emb: DataFrame,
    query_vec_ids: list[int],
    k: int = 5,
    probe_hamming: int = 1,
) -> DataFrame:
    """Batched LSH ANN: many query vectors against one `build_ann_index`
    table in ONE bucket-pruned job (the ANN analogue of `search_batch`,
    mirroring `ivf_ann_topk_batch`). Buckets for all queries come from
    one Q x P mini-job; multi-probe expansion is driver-side bit math on
    Q buckets; the UNION of probed bucket partitions is scanned once (a
    bucket probed by many queries is read once) and a broadcast
    (qid, bucket) probe join fans candidates per query. Per-query results
    are rank-identical to `lsh_ann_topk_indexed` (tested). Returns
    (qid, rank, vec_id, label, cos)."""
    with open(os.path.join(index_dir, _ANN_META)) as f:
        meta = json.load(f)
    n_planes = int(meta["n_planes"])
    qrows = emb.filter(
        F.col("vec_id").isin([int(q) for q in query_vec_ids])
    )
    planes = seeded_planes(spark, int(meta["dim"]), n_planes, meta["seed"])
    qb = {
        int(r["vec_id"]): int(r["bucket"])
        for r in _bucket(qrows, planes).select("vec_id", "bucket").collect()
    }
    missing = set(int(q) for q in query_vec_ids) - set(qb)
    if missing:
        raise KeyError(f"query vec_ids not found: {sorted(missing)}")
    probe = spark.createDataFrame(
        [
            (qid, b)
            for qid, qbucket in qb.items()
            for b in probed_buckets(qbucket, n_planes, probe_hamming)
        ],
        "qid long, bucket int",
    )
    buckets = sorted({int(r["bucket"]) for r in probe.collect()})
    q_df = qrows.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cand = (
        spark.read.parquet(index_dir)
        .filter(F.col("bucket").isin(buckets))
        .join(F.broadcast(probe), "bucket")
        .join(F.broadcast(q_df), "qid")
        .filter(F.col("vec_id") != F.col("qid"))
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.select("qid", "vec_id", "label", F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            "qid", F.col("rank").cast("int").alias("rank"),
            "vec_id", "label", "cos",
        )
        .orderBy("qid", "rank")
    )


def lsh_ann_topk_batch_sql(
    query_vec_ids: tuple[int, ...] = (0, 3, 17),
    n_planes: int = 8,
    k: int = 5,
    probe_hamming: int = 1,
    seed: str = "plane",
) -> str:
    """DuckDB twin of `lsh_ann_topk_batch`: the batch is semantically the
    UNION of per-query LSH lookups (batching amortizes the physical plan,
    it does not change results), so the oracle is a UNION ALL of the
    single-query oracle tagged with qid."""
    parts = [
        f"SELECT CAST({qid} AS BIGINT) AS qid, * FROM ("
        + lsh_ann_topk_sql(
            query_vec_id=qid,
            n_planes=n_planes,
            k=k,
            probe_hamming=probe_hamming,
            seed=seed,
        )
        + ")"
        for qid in query_vec_ids
    ]
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY qid, rank"
    )


def lsh_ann_topk_sql(
    query_vec_id: int = 0,
    n_planes: int = 8,
    k: int = 5,
    probe_hamming: int = 1,
    seed: str = "plane",
) -> str:
    dot_pv = "list_dot_product(e.embedding::DOUBLE[], p.pv::DOUBLE[])"
    comp = (
        f"((('0x' || substr(md5('{seed}:' || p || ':' || i), 1, 15))::BIGINT"
        f" / {1 << 60}.0) * 2.0 - 1.0)"
    )
    return f"""
WITH dim AS (SELECT len(embedding) AS d FROM embeddings WHERE vec_id = {query_vec_id}),
planes AS (
  SELECT t.p::INT AS p,
         list_transform(range(0, (SELECT d FROM dim)), i -> {comp}) AS pv
  FROM range(0, {n_planes}) t(p)
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
  WHERE bit_count(xor(e.bucket, q.qbucket)) <= {probe_hamming}
        AND e.vec_id <> {query_vec_id}
) WHERE rank <= {k} ORDER BY rank"""
