"""Deduplication operators for web-scale training-data pipelines.

Four families, each a pure DataFrame plan (no Python on the hot path) with
a DuckDB oracle twin:

  exact        md5 fingerprint groupBy — one shuffle on the 16-byte hash.
  jaccard      3-token-shingle set Jaccard over blocked candidate pairs —
               the self-join is blocked (never all-pairs) so it scales as
               O(Σ block²), not O(N²).
  minhash-LSH  per-doc MinHash signature (vectorized transform+array_min,
               zero explode) banded into LSH buckets; candidate pairs =
               bucket-equijoin. Standard shingle→minhash→band→bucket-join.
  simhash      48-bit SimHash from tf-weighted term hashes; candidate
               pairs via 4×12-bit band blocking (any pair within Hamming
               distance ≤ 3 shares at least one intact band — pigeonhole),
               verified with bit_count(xor).

At 100 TB the only shuffles are hash-partitioned groupBys on fingerprints /
bucket keys, which AQE splits when skewed; no driver-side collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from iresearch_spark.textops.common import (
    MD5_LONG_SQL,
    md5_long,
    shingles_col,
    shingles_sql,
    tokens_col,
)
from iresearch_spark.textops.sqlgen import tokens_expr

# --------------------------------------------------------------- exact


def exact_duplicates(docs: DataFrame, top: int = 50) -> DataFrame:
    """Top fingerprint groups by (n_docs desc, fp asc) with id bounds."""
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy(F.desc("n_docs"), F.asc("fp"))
        .limit(top)
    )


def exact_duplicates_sql(top: int = 50) -> str:
    return f"""
SELECT fp, n_docs, min_doc, max_doc FROM (
  SELECT md5(text) AS fp, count(*)::BIGINT AS n_docs,
         min(doc_id) AS min_doc, max(doc_id) AS max_doc
  FROM documents GROUP BY 1
) ORDER BY n_docs DESC, fp ASC LIMIT {top}"""


# -------------------------------------------------------------- jaccard


def jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, block_col: str = "source"
) -> DataFrame:
    """Blocked shingle-Jaccard near-dup pairs (doc_a < doc_b, j >= thr)."""
    d = docs.select(
        "doc_id", F.col(block_col).alias("blk"), shingles_col(tokens_col(F.col("text"))).alias("sh")
    ).filter(F.size("sh") > 0)
    a, b = d.alias("a"), d.alias("b")
    j = F.size(F.array_intersect("a.sh", "b.sh")).cast("double") / F.size(
        F.array_union("a.sh", "b.sh")
    )
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(j, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def jaccard_pairs_sql(threshold: float = 0.8, block_col: str = "source") -> str:
    return f"""
WITH t AS (SELECT doc_id, {block_col} AS blk, {tokens_expr()} AS toks FROM documents),
d AS (SELECT doc_id, blk, {shingles_sql()} AS sh FROM t WHERE len(toks) >= 3),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(a.sh || b.sh)), 6) AS jaccard
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT * FROM p WHERE jaccard >= {threshold} ORDER BY doc_a, doc_b"""


# -------------------------------------------------------------- minhash


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 8, n_bands: int = 2
) -> DataFrame:
    """Per-doc MinHash signature + LSH band keys, fully vectorized:
    sig_i = min over shingles of md5_long(i || ':' || shingle); bands are
    md5 digests of `rows_per_band` consecutive signature values."""
    rows_per_band = n_hashes // n_bands
    d = docs.select(
        "doc_id", shingles_col(tokens_col(F.col("text"))).alias("sh")
    ).filter(F.size("sh") > 0)

    # NB: the seed must be captured via closure, not a lambda default arg —
    # a two-parameter lambda is treated by Spark as (element, index)
    def _sig(i: int):
        seed = f"{i}:"
        return F.array_min(
            F.transform(F.col("sh"), lambda s: md5_long(F.concat(F.lit(seed), s)))
        ).alias(f"sig{i}")

    sig = [_sig(i) for i in range(n_hashes)]
    d = d.select("doc_id", *sig)
    bands = [
        F.md5(
            F.concat_ws(
                ",", *[F.col(f"sig{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).cast("binary")
        ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    return d.select("doc_id", *bands)


def lsh_pairs(docs: DataFrame, n_hashes: int = 8, n_bands: int = 2) -> DataFrame:
    """Candidate near-dup pairs sharing >= 1 LSH band (bucket equijoin)."""
    sig = minhash_signatures(docs, n_hashes, n_bands)
    parts = []
    for b in range(n_bands):
        s = sig.select("doc_id", F.col(f"band{b}").alias("band"))
        a, c = s.alias("a"), s.alias("b")
        parts.append(
            a.join(c, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct().orderBy("doc_a", "doc_b")


def _minhash_sig_sql(n_hashes: int, n_bands: int) -> str:
    rows_per_band = n_hashes // n_bands
    sigs = ", ".join(
        "list_min(list_transform(sh, s -> "
        + MD5_LONG_SQL.format(x=f"'{i}:' || s")
        + f")) AS sig{i}"
        for i in range(n_hashes)
    )
    bands = ", ".join(
        "md5("
        + " || ',' || ".join(f"sig{b * rows_per_band + r}" for r in range(rows_per_band))
        + f") AS band{b}"
        for b in range(n_bands)
    )
    return f"""
WITH t AS (SELECT doc_id, {tokens_expr()} AS toks FROM documents),
d AS (SELECT doc_id, {shingles_sql()} AS sh FROM t WHERE len(toks) >= 3),
sigs AS (SELECT doc_id, {sigs} FROM d),
bands AS (SELECT doc_id, {bands} FROM sigs)"""


def minhash_signatures_sql(n_hashes: int = 8, n_bands: int = 2) -> str:
    cols = ", ".join(f"band{b}" for b in range(n_bands))
    return _minhash_sig_sql(n_hashes, n_bands) + f"\nSELECT doc_id, {cols} FROM bands"


def lsh_pairs_sql(n_hashes: int = 8, n_bands: int = 2) -> str:
    unions = "\nUNION\n".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a "
        f"JOIN bands b ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"
        for b in range(n_bands)
    )
    return (
        _minhash_sig_sql(n_hashes, n_bands)
        + f"\nSELECT DISTINCT doc_a, doc_b FROM ({unions}) ORDER BY doc_a, doc_b"
    )


def lsh_verified_pairs(
    docs: DataFrame, threshold: float = 0.5, n_hashes: int = 8, n_bands: int = 2
) -> DataFrame:
    """The PRODUCTION near-dup path: MinHash-LSH candidates, then exact
    shingle-Jaccard verification on candidates only. Work is bounded by
    the candidate count (bucket equijoin), never O(block²) — this is the
    path that holds at 10^12 docs; `jaccard_pairs` is the small-scale
    verification oracle."""
    cand = lsh_pairs(docs, n_hashes, n_bands)
    d = docs.select(
        "doc_id", shingles_col(tokens_col(F.col("text"))).alias("sh")
    ).filter(F.size("sh") > 0)
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    j = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def lsh_verified_pairs_sql(
    threshold: float = 0.5, n_hashes: int = 8, n_bands: int = 2
) -> str:
    unions = "\nUNION\n".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a "
        f"JOIN bands b ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"
        for b in range(n_bands)
    )
    return (
        _minhash_sig_sql(n_hashes, n_bands)
        + f""",
cand AS (SELECT DISTINCT doc_a, doc_b FROM ({unions})),
verified AS (
  SELECT c.doc_a, c.doc_b,
         round(len(list_intersect(da.sh, db.sh))::DOUBLE
               / len(list_distinct(da.sh || db.sh)), 6) AS jaccard
  FROM cand c JOIN d da ON da.doc_id = c.doc_a JOIN d db ON db.doc_id = c.doc_b
)
SELECT * FROM verified WHERE jaccard >= {threshold} ORDER BY doc_a, doc_b"""
    )


# -------------------------------------------------------------- simhash

SIM_BITS = 48
SIM_BANDS = 4


def simhash(docs: DataFrame, bits: int = SIM_BITS) -> DataFrame:
    """48-bit SimHash: bit b set iff Σ_term tf·(±1 by hash bit b) > 0.

    One shuffle only: token occurrences are hashed row-wise, then a single
    groupBy(doc_id) computes all `bits` signed sums as aggregate COLUMNS
    (map-side partial agg) — no per-bit row explosion, and no intermediate
    (doc, term) tf grouping (Σ_occurrences ±1 == Σ_terms ±tf). At 10^12
    docs the shuffle volume is exactly the token table, not 48× it."""
    occ = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    ).withColumn("h", md5_long(F.col("term")))
    sums = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    per_doc = occ.groupBy("doc_id").agg(*sums)
    sim = None
    for b in range(bits):
        term = (
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        sim = term if sim is None else sim + term
    return per_doc.select("doc_id", sim.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found by
    4-band blocking (sound for max_hamming <= 3 by pigeonhole)."""
    s = simhash(docs)
    band_width = SIM_BITS // SIM_BANDS
    parts = []
    for i in range(SIM_BANDS):
        key = F.expr(f"(simhash >> {i * band_width}) & {(1 << band_width) - 1}")
        b = s.select("doc_id", "simhash", key.alias("bk"))
        x, y = b.alias("a"), b.alias("b")
        parts.append(
            x.join(y, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.bit_count(F.expr("a.simhash ^ b.simhash")).alias("hamming"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


def _simhash_sql(bits: int = SIM_BITS) -> str:
    h = MD5_LONG_SQL.format(x="term")
    return f"""
WITH t AS (SELECT doc_id, {tokens_expr()} AS toks FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, {h} AS h
  FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY doc_id, term
),
bitsum AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM tf CROSS JOIN (SELECT unnest(range(0, {bits})) AS bit) b
  GROUP BY doc_id, b.bit
),
sh AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
  FROM bitsum GROUP BY doc_id
)"""


def simhash_sql(bits: int = SIM_BITS) -> str:
    return _simhash_sql(bits) + "\nSELECT doc_id, simhash FROM sh"


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    band_width = SIM_BITS // SIM_BANDS
    mask = (1 << band_width) - 1
    unions = "\nUNION\n".join(
        f"SELECT a.doc_id doc_a, b.doc_id doc_b, "
        f"bit_count(xor(a.simhash, b.simhash))::INT AS hamming "
        f"FROM sh a JOIN sh b ON ((a.simhash >> {i * band_width}) & {mask}) = "
        f"((b.simhash >> {i * band_width}) & {mask}) AND a.doc_id < b.doc_id"
        for i in range(SIM_BANDS)
    )
    return (
        _simhash_sql()
        + f"\nSELECT DISTINCT doc_a, doc_b, hamming FROM ({unions}) "
        + f"WHERE hamming <= {max_hamming} ORDER BY doc_a, doc_b"
    )


# ------------------------------------------------- near-dup clustering

def neardup_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 8,
    n_bands: int = 2,
    max_iter: int = 10,
) -> DataFrame:
    """The dedup DECISION a pipeline applies: connected components over
    the verified near-dup pair graph, one row per clustered doc with
    `cluster` = min doc_id of its component and `keep` = (doc_id ==
    cluster) — keep-one-per-cluster.

    Distributed min-label propagation: labels converge in O(component
    diameter) rounds (near-dup components are shallow — dup clusters are
    cliques or stars from a shared source doc), each round ONE shuffle
    join of the O(|pairs|) edge table against the O(|clustered docs|)
    label table plus a metrics-only convergence count; lineage is cut
    per round with localCheckpoint so the plan stays O(1) deep. No
    driver-side graph — both tables stay distributed, so the same loop
    runs at 10^12 docs where components are still shallow but plentiful.
    """
    pairs = lsh_verified_pairs(docs, threshold, n_hashes, n_bands).select(
        "doc_a", "doc_b"
    )
    edges = (
        pairs.union(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("lab", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nb = (
            edges.join(labels, edges["doc_b"] == labels["doc_id"])
            .groupBy("doc_a")
            .agg(F.min("lab").alias("nlab"))
        )
        new = (
            labels.join(nb, labels["doc_id"] == nb["doc_a"], "left")
            .select(
                labels["doc_id"],
                F.least(
                    F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))
                ).alias("lab"),
                (F.coalesce(F.col("nlab"), F.col("lab")) < F.col("lab"))
                .cast("int")
                .alias("chg"),
            )
            .localCheckpoint()
        )
        changed = new.agg(F.sum("chg")).collect()[0][0] or 0
        labels = new.drop("chg")
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        F.col("lab").alias("cluster"),
        (F.col("doc_id") == F.col("lab")).alias("keep"),
    ).orderBy("doc_id")


def neardup_clusters_sql(
    threshold: float = 0.5, n_hashes: int = 8, n_bands: int = 2
) -> str:
    """DuckDB twin: recursive transitive closure over the symmetric pair
    graph, cluster = min reachable doc_id."""
    return f"""WITH RECURSIVE pairs AS (
  {lsh_verified_pairs_sql(threshold, n_hashes, n_bands)}
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(node, m) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.m FROM e JOIN reach ON e.b = reach.node
)
SELECT node AS doc_id, min(m) AS cluster,
       node = min(m) AS keep
FROM reach GROUP BY node ORDER BY doc_id"""
