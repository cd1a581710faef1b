"""Text-analysis operators: token counting, quality scoring, language
marker identification, winnowing document fingerprints.

All pure JVM expressions (split/transform/aggregate) — one narrow scan per
operator, no shuffle except final ordering; safe to run inline in a 100 TB
ingest pass. Each has a DuckDB oracle twin below it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from iresearch_spark.textops.common import md5_long, raw_tokens_col, tokens_col
from iresearch_spark.textops.sqlgen import TOKEN_SPLIT_RE, _STOP_SQL, tokens_expr

# ------------------------------------------------------------ token stats


def token_stats(docs: DataFrame, top: int = 100) -> DataFrame:
    """Per-doc token counts: raw tokens, kept (non-stop) tokens, unique
    kept terms, mean kept-token length (the BPE-ish budget estimator)."""
    d = docs.select(
        "doc_id",
        raw_tokens_col(F.col("text")).alias("raw"),
        tokens_col(F.col("text")).alias("kept"),
    )
    mean_len = F.when(
        F.size("kept") > 0,
        F.round(
            F.aggregate(
                F.transform("kept", lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.size("kept"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        d.select(
            "doc_id",
            F.size("raw").alias("n_raw"),
            F.size("kept").alias("n_kept"),
            F.size(F.array_distinct("kept")).alias("n_unique"),
            mean_len.alias("mean_tok_len"),
        )
        .orderBy("doc_id")
        .limit(top)
    )


def token_stats_sql(top: int = 100) -> str:
    raw = (
        f"list_filter(string_split_regex(lower(coalesce(text, '')), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )
    return f"""
WITH d AS (SELECT doc_id, {raw} AS raw, {tokens_expr()} AS kept FROM documents)
SELECT doc_id, len(raw)::INT AS n_raw, len(kept)::INT AS n_kept,
       len(list_distinct(kept))::INT AS n_unique,
       CASE WHEN len(kept) > 0 THEN
         round(list_sum(list_transform(kept, t -> length(t)::DOUBLE)) / len(kept), 6)
       ELSE 0.0 END AS mean_tok_len
FROM d ORDER BY doc_id LIMIT {top}"""


# --------------------------------------------------------- quality score


def quality_scores(docs: DataFrame, top: int = 100) -> DataFrame:
    """Heuristic quality metrics per doc: length, stopword ratio,
    non-alnum character ratio, and a composite keep/drop flag — the usual
    pre-training corpus filter family."""
    lower = F.lower(F.coalesce(F.col("text"), F.lit("")))
    n_chars = F.length(lower)
    n_alnum = F.length(F.regexp_replace(lower, "[^a-z0-9 ]", ""))
    d = docs.select(
        "doc_id",
        raw_tokens_col(F.col("text")).alias("raw"),
        tokens_col(F.col("text")).alias("kept"),
        n_chars.alias("n_chars_c"),
        (n_chars - n_alnum).alias("n_punct"),
    )
    stop_ratio = F.when(
        F.size("raw") > 0,
        F.round((F.size("raw") - F.size("kept")).cast("double") / F.size("raw"), 6),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.col("n_chars_c") > 0,
        F.round(F.col("n_punct").cast("double") / F.col("n_chars_c"), 6),
    ).otherwise(F.lit(0.0))
    out = d.select(
        "doc_id",
        F.size("raw").alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
    )
    keep = (
        (F.col("n_tokens") >= 10)
        & (F.col("stop_ratio") <= 0.6)
        & (F.col("punct_ratio") <= 0.3)
    )
    return (
        out.withColumn("keep", keep)
        .orderBy("doc_id")
        .limit(top)
    )


def quality_scores_sql(top: int = 100) -> str:
    raw = (
        f"list_filter(string_split_regex(lower(coalesce(text, '')), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )
    return f"""
WITH d AS (
  SELECT doc_id, {raw} AS raw, {tokens_expr()} AS kept,
         length(lower(coalesce(text, ''))) AS n_chars_c,
         length(lower(coalesce(text, '')))
           - length(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g')) AS n_punct
  FROM documents
),
m AS (
  SELECT doc_id, len(raw)::INT AS n_tokens,
         CASE WHEN len(raw) > 0
              THEN round((len(raw) - len(kept))::DOUBLE / len(raw), 6) ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_chars_c > 0
              THEN round(n_punct::DOUBLE / n_chars_c, 6) ELSE 0.0 END AS punct_ratio
  FROM d
)
SELECT doc_id, n_tokens, stop_ratio, punct_ratio,
       (n_tokens >= 10 AND stop_ratio <= 0.6 AND punct_ratio <= 0.3) AS keep
FROM m ORDER BY doc_id LIMIT {top}"""


# ------------------------------------------------------------ language id

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en": ("the", "and", "is", "of", "to", "in", "that"),
    "es": ("el", "la", "los", "que", "es", "una", "para"),
    "fr": ("le", "la", "les", "et", "est", "une", "pour"),
}


def lang_marker_id(docs: DataFrame, top: int = 100) -> DataFrame:
    """Marker-word language ID over RAW tokens (stopwords kept — they ARE
    the markers). pred = argmax count, ties broken by lang asc, all-zero
    -> 'und' (undetermined)."""
    d = docs.select("doc_id", raw_tokens_col(F.col("text")).alias("raw"))

    def _score(lang: str, ws: tuple[str, ...]):
        wl = list(ws)  # closure capture; 2-param lambdas mean (elem, idx)
        return F.size(F.filter("raw", lambda t: t.isin(wl))).alias(f"s_{lang}")

    scores = [_score(lang, ws) for lang, ws in sorted(LANG_MARKERS.items())]
    d = d.select("doc_id", *scores)
    best = F.greatest(*[F.col(f"s_{la}") for la in sorted(LANG_MARKERS)])
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return (
        d.select("doc_id", pred.alias("pred_lang"), best.alias("n_markers"))
        .orderBy("doc_id")
        .limit(top)
    )


def lang_marker_id_sql(top: int = 100) -> str:
    raw = (
        f"list_filter(string_split_regex(lower(coalesce(text, '')), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )
    score_cols = ", ".join(
        "len(list_filter(raw, t -> t IN ("
        + ", ".join(f"'{w}'" for w in ws)
        + f")))::INT AS s_{lang}"
        for lang, ws in sorted(LANG_MARKERS.items())
    )
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{la}" for la in langs) + ")"
    pred = "CASE WHEN " + best + " = 0 THEN 'und' "
    pred += " ".join(f"WHEN s_{la} = {best} THEN '{la}'" for la in langs)
    pred += " END"
    return f"""
WITH d AS (SELECT doc_id, {raw} AS raw FROM documents),
s AS (SELECT doc_id, {score_cols} FROM d)
SELECT doc_id, {pred} AS pred_lang, {best} AS n_markers
FROM s ORDER BY doc_id LIMIT {top}"""


# ----------------------------------------------- BPE-ish token counting

# GPT-2-family pretokenizer, ASCII-simplified and lookahead-free so the
# Java (Spark) and RE2 (DuckDB) engines agree: contractions split off
# first, then space-prefixed letter runs, 1-3 digit chunks (the cl100k
# digit-grouping rule), and punctuation runs. Both engines use
# leftmost-first alternation, so match counts are identical.
BPE_SPLIT_RE = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]{1,3}| ?[^a-z0-9\\s]+"


def bpe_token_stats(docs: DataFrame, top: int = 100) -> DataFrame:
    """LLM token-budget estimator: per-doc BPE-ish pretoken count (the
    GPT-2 pretokenizer regex over lowered text — every real BPE merge
    happens strictly inside these pretokens, so this upper-bounds and
    tracks the true token count), whitespace-word count, and fertility
    (pretokens per word). One narrow JVM regexp scan, no shuffle."""
    lower = F.lower(F.coalesce(F.col("text"), F.lit("")))
    n_bpe = F.size(F.regexp_extract_all(lower, F.lit(BPE_SPLIT_RE), F.lit(0)))
    n_ws = F.size(
        F.filter(F.split(lower, r"\s+"), lambda t: t != F.lit(""))
    )
    return (
        docs.select(
            "doc_id",
            n_bpe.alias("n_bpe"),
            n_ws.alias("n_ws"),
            F.when(
                n_ws > 0, F.round(n_bpe.cast("double") / n_ws, 6)
            )
            .otherwise(F.lit(0.0))
            .alias("fertility"),
        )
        .orderBy("doc_id")
        .limit(top)
    )


def bpe_token_stats_sql(top: int = 100) -> str:
    pat = BPE_SPLIT_RE.replace("'", "''")
    return f"""
WITH d AS (SELECT doc_id, lower(coalesce(text, '')) AS lt FROM documents),
c AS (
  SELECT doc_id,
         len(regexp_extract_all(lt, '{pat}', 0))::INT AS n_bpe,
         len(list_filter(string_split_regex(lt, '\\s+'), t -> t <> ''))::INT AS n_ws
  FROM d
)
SELECT doc_id, n_bpe, n_ws,
       CASE WHEN n_ws > 0 THEN round(n_bpe::DOUBLE / n_ws, 6) ELSE 0.0 END AS fertility
FROM c ORDER BY doc_id LIMIT {top}"""


# ------------------------------------------------- winnowing fingerprint


def _gram_hashes(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, h): k-char-gram hash array of the lowered text."""
    # dynamic-start substring needs expr(); sequence(1, x<=0) would be
    # descending in Spark (empty in DuckDB), so guard with CASE WHEN
    return docs.select(
        "doc_id",
        F.expr(
            f"CASE WHEN length(lower(coalesce(text,''))) >= {k} THEN "
            f"transform(sequence(1, length(lower(coalesce(text,''))) - {k - 1}), "
            f"i -> conv(substring(md5(cast(substring(lower(coalesce(text,'')), i, {k}) as binary)), 1, 15), 16, 10)"
            f") ELSE array() END"
        ).cast("array<long>").alias("h"),
    )


def _winnow_fps(w: int):
    """Distinct winnowed fingerprints (min hash of each w-window) of `h`."""
    return F.when(
        F.size("h") >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("h") - (w - 1)),
                lambda j: F.array_min(F.slice("h", j, w)),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))


def winnow_fingerprints(
    docs: DataFrame, k: int = 8, w: int = 4, top: int = 100
) -> DataFrame:
    """Winnowing (Schleimer et al. 2003): hash all k-char grams of the
    lowered text, keep the min hash of each w-window, dedupe. Returns
    per-doc fingerprint-set summary (count, min, max)."""
    d = _gram_hashes(docs, k)
    fps = _winnow_fps(w)
    return (
        d.select(
            "doc_id",
            F.size(fps).alias("n_fp"),
            F.array_min(fps).alias("min_fp"),
            F.array_max(fps).alias("max_fp"),
        )
        .filter(F.col("n_fp") > 0)
        .orderBy("doc_id")
        .limit(top)
    )


def winnow_fingerprints_sql(k: int = 8, w: int = 4, top: int = 100) -> str:
    gram_h = (
        f"('0x' || substr(md5(substr(lt, i, {k})), 1, 15))::BIGINT"
    )
    return f"""
WITH d AS (
  SELECT doc_id, lower(coalesce(text, '')) AS lt FROM documents
),
h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(lt) - {k - 1}, 0) + 1),
                        i -> {gram_h}) AS h
  FROM d
),
fp AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(h) - {w - 1}, 0) + 1),
                                      j -> list_min(h[j : j + {w - 1}]))) AS fps
  FROM h
)
SELECT doc_id, len(fps)::INT AS n_fp, list_min(fps) AS min_fp, list_max(fps) AS max_fp
FROM fp WHERE len(fps) > 0 ORDER BY doc_id LIMIT {top}"""


def winnow_pairs(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 20,
    top: int = 50,
) -> DataFrame:
    """Substring-overlap near-duplicate candidate pairs: docs sharing >=
    min_shared winnowed fingerprints. Winnowing guarantees a shared k-char
    substring per shared print, so this flags LOCAL duplication (quoted
    passages, mirrored boilerplate, template reuse) that whole-document
    MinHash/SimHash miss — the substring-level dedup signal of
    training-data pipelines (cf. Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better").

    Scale shape: explode to (fp, doc_id), drop fingerprints occurring in
    more than max_df docs (the hot-shingle guard — boilerplate prints
    would otherwise create O(df²) join blocks), then fp-equijoin +
    pair-count. Every shuffle is hash-partitioned on fp or the pair key;
    each join block is bounded by max_df, so the candidate volume is at
    most Σ_fp min(df, max_df)² — linear in the corpus for fixed max_df."""
    fp = _gram_hashes(docs, k).select(
        "doc_id", F.explode(_winnow_fps(w)).alias("fp")
    )
    rare = (
        fp.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df").between(2, max_df))
    )
    fpr = fp.join(rare.select("fp"), "fp")
    a, b = fpr.alias("a"), fpr.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .orderBy(F.desc("shared"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(top)
    )


def winnow_pairs_sql(
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 20,
    top: int = 50,
) -> str:
    gram_h = f"('0x' || substr(md5(substr(lt, i, {k})), 1, 15))::BIGINT"
    return f"""
WITH d AS (
  SELECT doc_id, lower(coalesce(text, '')) AS lt FROM documents
),
h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(lt) - {k - 1}, 0) + 1),
                        i -> {gram_h}) AS h
  FROM d
),
fp AS (
  SELECT doc_id, unnest(
    list_distinct(list_transform(range(1, greatest(len(h) - {w - 1}, 0) + 1),
                                 j -> list_min(h[j : j + {w - 1}])))) AS fp
  FROM h
),
rare AS (
  SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY 1)
  WHERE df BETWEEN 2 AND {max_df}
),
fpr AS (SELECT doc_id, fp.fp FROM fp JOIN rare USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
FROM fpr a JOIN fpr b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {min_shared}
ORDER BY shared DESC, doc_a ASC, doc_b ASC LIMIT {top}"""


# --------------------------------------------------- tf-idf keyword extraction


def tfidf_keywords(docs: DataFrame, k: int = 5, top: int = 50) -> DataFrame:
    """Per-doc keyword extraction: the top-k terms of each doc by
    round(tf·idf, 6) desc / term asc, with idf the engine's BM25 idf
    (ln(1 + (N − df + 0.5)/(df + 0.5))) over the WHOLE corpus — the
    standard tf-idf keyword/tag summarizer a training-data pipeline runs
    before topic bucketing or per-domain term audits. Output is limited
    to doc_id < `top` for a bounded result, but tf/df/idf are corpus-
    global.

    Scale shape: one tokenize scan → (doc_id, term) tf with map-side
    partial aggregation (one hash shuffle) → vocab-sized df table joined
    back on term (AQE picks the join strategy; hot terms are exactly the
    high-df / low-idf ones, so skew lands on rows a window then drops) →
    per-doc row_number window keyed by the doc_id hash shuffle. Three
    key-partitioned shuffles total, no collect, no explode beyond the
    token unnest every term op pays."""
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.select(F.count(F.lit(1)).cast("double").alias("n"))
    j = tf.join(df, "term").crossJoin(F.broadcast(n))
    tfidf = F.round(
        F.col("tf")
        * F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
        6,
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        j.withColumn("tfidf", tfidf)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter((F.col("rank") <= k) & (F.col("doc_id") < top))
        .select("doc_id", "rank", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "rank")
    )


def tfidf_keywords_sql(k: int = 5, top: int = 50) -> str:
    return f"""
WITH t AS (SELECT doc_id, {tokens_expr()} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n FROM t),
j AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln(1.0 + (n.n - df.df + 0.5) / (df.df + 0.5)), 6)
           AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, tfidf FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM j
) WHERE rank <= {k} AND doc_id < {top}
ORDER BY doc_id, rank"""


# ------------------------------------------------------- significant terms


def significant_terms(
    docs: DataFrame, cond: str, k: int = 20, min_fg: int = 3
) -> DataFrame:
    """ES significant_terms: terms OVERREPRESENTED in the foreground doc
    set (`cond`, a SQL boolean over the docs columns) relative to the
    whole corpus — the drift/bias probe a training-data pipeline runs per
    domain/language/source slice. Doc-frequency based like ES: fg_rate =
    df_fg/n_fg vs bg_rate = df_bg/n_bg over distinct per-doc terms;
    score is the JLH-style scaled lift (fg_rate − bg_rate) ·
    (fg_rate / bg_rate), positive-only, df_fg ≥ min_fg, top-k by
    (round(score, 6) desc, term asc).

    Scale shape: one tokenize scan with per-doc distinct terms → one
    term-keyed groupBy carrying both counters as conditional sums
    (map-side partial combine — the background and foreground tallies
    ride ONE shuffle) + a broadcast 1-row corpus-count join. No collect,
    no second corpus pass."""
    toks = docs.select(
        F.expr(cond).alias("_fg"),
        F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("term"),
    )
    agg = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_bg"),
        F.sum(F.when(F.col("_fg"), 1).otherwise(0))
        .cast("long")
        .alias("df_fg"),
    )
    n = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_bg"),
        F.sum(F.when(F.expr(cond), 1).otherwise(0))
        .cast("double")
        .alias("n_fg"),
    )
    j = agg.crossJoin(F.broadcast(n))
    fg_rate = F.col("df_fg") / F.col("n_fg")
    bg_rate = F.col("df_bg") / F.col("n_bg")
    score = F.round((fg_rate - bg_rate) * (fg_rate / bg_rate), 6)
    return (
        j.withColumn("score", score)
        # positivity gates on the UNROUNDED lift (the oracle twin does the
        # same), so a term whose score rounds to 0 doesn't flip presence
        .filter((F.col("df_fg") >= min_fg) & ((fg_rate - bg_rate) > 0))
        .select("term", "df_fg", "df_bg", "score")
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
    )


def significant_terms_sql(cond: str, k: int = 20, min_fg: int = 3) -> str:
    return f"""
WITH t AS (
  SELECT ({cond}) AS fg, list_distinct({tokens_expr()}) AS toks
  FROM documents
),
tok AS (SELECT fg, unnest(toks) AS term FROM t),
agg AS (
  SELECT term, count(*)::BIGINT AS df_bg,
         sum(CASE WHEN fg THEN 1 ELSE 0 END)::BIGINT AS df_fg
  FROM tok GROUP BY 1
),
n AS (
  SELECT count(*)::DOUBLE AS n_bg,
         sum(CASE WHEN fg THEN 1 ELSE 0 END)::DOUBLE AS n_fg
  FROM t
)
SELECT term, df_fg, df_bg,
       round((df_fg / n.n_fg - df_bg / n.n_bg)
             * ((df_fg / n.n_fg) / (df_bg / n.n_bg)), 6) AS score
FROM agg CROSS JOIN n
WHERE df_fg >= {min_fg}
  AND (df_fg / n.n_fg - df_bg / n.n_bg) > 0
ORDER BY score DESC, term ASC LIMIT {k}"""


# ------------------------------------------------- decontamination probe


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination probe (the GPT-3 appendix-C / PaLM
    eval-leak check a pre-training pipeline runs before freezing a
    corpus): fraction of each training doc's DISTINCT n-token shingles
    that also appear anywhere in the evaluation/benchmark corpus; docs
    at or above `threshold` are flagged for removal.

    Scale shape: the benchmark side collapses to DISTINCT shingles (an
    eval set is tiny next to a 10^12-doc corpus, so AQE broadcast-joins
    it); the corpus side explodes each doc's distinct shingles ONCE —
    one equijoin at shingle width + one doc-keyed count, no all-pairs
    work, cost linear in corpus tokens.

    Returns (doc_id, n_shingles, n_hits, frac, contaminated) for docs
    with >= 1 shingle, ordered by doc_id."""
    from iresearch_spark.textops.common import shingles_col

    sh = shingles_col(tokens_col(F.col("text")), n)
    d = docs.select("doc_id", F.explode(sh).alias("sh"))
    b = bench.select(F.explode(sh).alias("sh")).distinct()
    hits = d.join(b, "sh").groupBy("doc_id").agg(
        F.count("*").alias("n_hits")
    )
    tot = docs.select(
        "doc_id", F.size(sh).alias("n_shingles")
    ).filter(F.col("n_shingles") > 0)
    frac = F.round(
        F.col("n_hits").cast("double") / F.col("n_shingles"), 6
    )
    return (
        tot.join(hits, "doc_id", "left")
        .fillna(0, ["n_hits"])
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_hits").cast("long").alias("n_hits"),
            frac.alias("frac"),
            (frac >= threshold).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def contamination_sql(
    bench_cond: str, n: int = 3, threshold: float = 0.5
) -> str:
    """DuckDB twin: `bench_cond` selects the benchmark rows out of the
    documents table (the driver entry uses a doc_id slice)."""
    from iresearch_spark.textops.sqlgen import tokens_expr

    from iresearch_spark.textops.common import shingles_sql

    return f"""
WITH t AS (SELECT doc_id, {tokens_expr()} AS toks FROM documents),
d AS (SELECT doc_id, {shingles_sql(n)} AS sh FROM t WHERE len(toks) >= {n}),
bsh AS (
  SELECT DISTINCT unnest(sh) AS s FROM d
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE {bench_cond})
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM d),
hits AS (
  SELECT ex.doc_id, count(*) AS n_hits FROM ex JOIN bsh USING (s)
  GROUP BY ex.doc_id
),
tot AS (SELECT doc_id, len(sh) AS n_shingles FROM d WHERE len(sh) > 0)
SELECT tot.doc_id, tot.n_shingles::BIGINT AS n_shingles,
       coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
       round(coalesce(hits.n_hits, 0)::DOUBLE / tot.n_shingles, 6) AS frac,
       round(coalesce(hits.n_hits, 0)::DOUBLE / tot.n_shingles, 6)
         >= {threshold} AS contaminated
FROM tot LEFT JOIN hits USING (doc_id)
ORDER BY doc_id"""


# --------------------------------------------- repetition (Gopher rules)


def repetition_stats(docs: DataFrame, top: int = 100) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021
    "repetition" quality rules — the filter that drops boilerplate/spam
    pages before pre-training): per doc, over RAW tokens (stopwords
    kept — repetition of function words counts),

      * uniq_tok_frac   distinct tokens / tokens,
      * max_tok_frac    most frequent token's share of all tokens,
      * dup_bigram_frac 1 − distinct 2-grams / 2-grams.

    Scale shape: the distinct fractions are per-row array expressions
    (no shuffle); max_tok_frac explodes tokens once into a
    (doc_id, tok)-keyed count with map-side combine then a doc-keyed
    max — two keyed shuffles at token width, linear in corpus tokens.

    Returns (doc_id, n_toks, uniq_tok_frac, max_tok_frac,
    dup_bigram_frac) for docs with >= 2 tokens, doc_id asc, LIMIT top."""
    toks = raw_tokens_col(F.col("text"))
    two = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(toks[i - 1], ' ', toks[i]))"
    )
    base = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_toks"),
            F.round(
                F.size(F.array_distinct("toks")) / F.size("toks"), 6
            ).alias("uniq_tok_frac"),
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(two)) / F.size(two),
                6,
            ).alias("dup_bigram_frac"),
            F.col("toks"),
        )
    )
    mx = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"))
    )
    return (
        base.join(mx, "doc_id")
        .select(
            "doc_id",
            "n_toks",
            "uniq_tok_frac",
            F.round(F.col("max_c") / F.col("n_toks"), 6).alias(
                "max_tok_frac"
            ),
            "dup_bigram_frac",
        )
        .orderBy("doc_id")
        .limit(top)
    )


def repetition_stats_sql(top: int = 100) -> str:
    """DuckDB twin of repetition_stats (raw tokens: stopwords kept)."""
    raw = (
        "list_filter(string_split_regex(lower(coalesce(text, '')), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )
    return f"""
WITH t AS (SELECT doc_id, {raw} AS toks FROM documents),
b AS (
  SELECT doc_id, toks,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1]) AS two
  FROM t WHERE len(toks) >= 2
),
mx AS (
  SELECT doc_id, max(c) AS max_c FROM (
    SELECT doc_id, tok, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS tok FROM b)
    GROUP BY doc_id, tok
  ) GROUP BY doc_id
)
SELECT b.doc_id, len(b.toks)::BIGINT AS n_toks,
       round(len(list_distinct(b.toks))::DOUBLE / len(b.toks), 6)
         AS uniq_tok_frac,
       round(mx.max_c::DOUBLE / len(b.toks), 6) AS max_tok_frac,
       round(1.0 - len(list_distinct(b.two))::DOUBLE / len(b.two), 6)
         AS dup_bigram_frac
FROM b JOIN mx USING (doc_id)
ORDER BY doc_id LIMIT {top}"""


# ------------------------------------------------------ PII scrub probe


PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_IPV4_RE = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
PII_PHONE_RE = "(?:\\+|\\b)(?:[0-9]{1,3}[-. ])?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}\\b"


def pii_stats(docs: DataFrame, top: int = 100) -> DataFrame:
    """PII scrub probe (the C4 / refined-web pre-release step): per-doc
    counts of email / IPv4 / phone-shaped spans plus the redacted text
    (spans replaced by typed placeholder tokens, the form actually fed
    to training). Pure JVM regexp expressions — one narrow projection,
    no shuffle, no Python.

    Returns (doc_id, n_email, n_ipv4, n_phone, redacted) ordered by
    doc_id, LIMIT top."""
    t = F.coalesce(F.col("text"), F.lit(""))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE,
            "<IP>",
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return (
        docs.select(
            "doc_id",
            F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("long").alias("n_email"),
            F.regexp_count(t, F.lit(PII_IPV4_RE)).cast("long").alias("n_ipv4"),
            F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("long").alias("n_phone"),
            redacted.alias("redacted"),
        )
        .orderBy("doc_id")
        .limit(top)
    )


def pii_stats_sql(text_expr: str = "text", top: int = 100) -> str:
    """DuckDB twin (same regexes; DuckDB regexp_replace needs the 'g'
    flag to match Spark's replace-all semantics)."""
    t = f"coalesce({text_expr}, '')"
    red = (
        f"regexp_replace(regexp_replace(regexp_replace({t}, "
        f"'{PII_EMAIL_RE}', '<EMAIL>', 'g'), '{PII_IPV4_RE}', '<IP>', 'g'), "
        f"'{PII_PHONE_RE}', '<PHONE>', 'g')"
    )
    def cnt(pat: str) -> str:
        return f"len(regexp_extract_all({t}, '{pat}'))::BIGINT"
    return f"""
SELECT doc_id, {cnt(PII_EMAIL_RE)} AS n_email, {cnt(PII_IPV4_RE)} AS n_ipv4,
       {cnt(PII_PHONE_RE)} AS n_phone, {red} AS redacted
FROM documents ORDER BY doc_id LIMIT {top}"""
