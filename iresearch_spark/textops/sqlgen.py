"""DuckDB oracle-SQL generation from the frozen analysis + BM25 spec.

The tokenizer spec (iresearch_spark.analysis.tokenizer: NFKC + lower +
[a-z0-9]+ runs − frozen stopword list, no stemming) and the BM25 formula
(iresearch_spark/__init__.py: k1=1.2, b=0.75, idf = ln(1+(N−df+0.5)/(df+0.5)),
[up] core/search/bm25.cpp) are re-expressed here as ANSI-ish SQL that DuckDB
executes over the same parquet `documents` table. The driver contract
(__spark_entry__.py) runs the Spark engine and these strings side-by-side;
rank order is computed on round(score, 6) with doc_id ascending tie-break in
BOTH systems so last-ulp float noise between numpy/JVM/DuckDB cannot flip a
rank (see BM25 rank-identity notes in SURVEY.md §7 hard-part (a)).

NFKC caveat: DuckDB has no NFKC function; the synthetic driver corpora are
pure ASCII, where NFKC+lower == lower. The pytest contract suite asserts the
corpora stay ASCII so this equivalence is checked, not assumed.
"""

from __future__ import annotations

from iresearch_spark import BM25_B, BM25_K1
from iresearch_spark.analysis.tokenizer import STOPWORDS

TOKEN_SPLIT_RE = "[^a-z0-9]+"

_STOP_SQL = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))


def tokens_expr(text_col: str = "text") -> str:
    """SQL expression: frozen-spec token list (order-preserving)."""
    return (
        f"list_filter(string_split_regex(lower(coalesce({text_col}, '')), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '' AND t NOT IN ({_STOP_SQL}))"
    )


def ws_tokens_expr(text_col: str = "text") -> str:
    """Whitespace-delimiter analyzer twin (A3, `delimiter: `): raw
    space-split tokens, empties dropped, no folding."""
    return (
        f"list_filter(string_split(coalesce({text_col}, ''), ' '), "
        f"t -> t <> '')"
    )


def stem_tokens_expr(text_col: str = "text") -> str:
    """`text|stem` pipeline twin (A6): frozen-rule stem of each text
    token (analysis.analyzers.STEM_RULES as a CASE expression)."""
    from iresearch_spark.analysis.analyzers import stem_sql_expr

    return (
        f"list_transform({tokens_expr(text_col)}, t -> {stem_sql_expr('t')})"
    )


def minhash_tokens_expr(k: int = 8, text_col: str = "text") -> str:
    """A10 minhash analyzer twin (`minhash:<k>(text)`): per doc, k
    signature tokens "i:" || min over distinct text tokens t of
    md5_long("i:" || t) — the same seeded 60-bit md5 family as
    textops.dedup (MD5_LONG_SQL). Docs with an empty token stream emit no
    signature tokens ([up] core/analysis/minhash_token_stream.cpp)."""
    return f"""(
  SELECT CASE WHEN len(tk) = 0 THEN []::VARCHAR[]
  ELSE list_transform(range(0, {k}), i ->
    CAST(i AS VARCHAR) || ':' ||
    CAST(list_min(list_transform(tk,
      t -> ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || t), 1, 15))::BIGINT)) AS VARCHAR))
  END FROM (SELECT {tokens_expr(text_col)} AS tk)
)"""


def numeric_tokens_expr(col: str, step: int = 16) -> str:
    """A7 numeric token stream twin (`numeric:<step>` over an integer
    column): one fixed-width term per precision level —
    f"{shift:02d}:{((v XOR 2^63 as unsigned) >> shift):020d}". DuckDB does
    the sign-bit flip as HUGEINT `v + 2^63` and the shift as integer
    division by a 2^shift literal (analysis.numeric freezes the spec)."""
    parts = []
    for s in range(0, 64, step):
        div = 1 << s
        parts.append(
            f"'{s:02d}:' || lpad(CAST(((9223372036854775808::HUGEINT + {col})"
            f" // {div}::HUGEINT) AS VARCHAR), 20, '0')"
        )
    return (
        f"(CASE WHEN {col} IS NULL THEN []::VARCHAR[] "
        f"ELSE [{', '.join(parts)}] END)"
    )


def granular_range_cond(
    lo: int | None,
    hi: int | None,
    step: int,
    *,
    include_lo: bool = True,
    include_hi: bool = False,
) -> str:
    """F5 expand_cond twin: the SAME fewest-terms trie decomposition the
    engine runs (analysis.numeric.granular_term_ranges), rendered as an OR
    of contiguous term BETWEENs over the dictionary."""
    from iresearch_spark.analysis.numeric import granular_term_ranges

    trs = granular_term_ranges(
        lo, hi, step, include_lo=include_lo, include_hi=include_hi
    )
    if not trs:
        return "FALSE"
    return " OR ".join(
        f"(term >= '{a}' AND term <= '{b}')" for a, b in trs
    )


def base_ctes(doc_table: str = "documents", tokens_sql: str | None = None) -> str:
    """Shared CTE prefix: tokenized docs, doc lengths, tf, df, stats.
    `tokens_sql` swaps the analyzer (defaults to the frozen text spec) —
    per-field statistics come from per-field token streams, exactly like
    the engine's per-field norms/df."""
    return f"""
WITH tokdocs AS (
  SELECT doc_id, {tokens_sql or tokens_expr()} AS toks FROM {doc_table}
),
dl AS (SELECT doc_id, len(toks) AS dl FROM tokdocs),
stats AS (
  SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM tokdocs),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)"""


def _score_expr(k1: float, b: float) -> str:
    return (
        f"ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))"
        f" * (tf.tf * ({k1} + 1.0))"
        f" / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))"
    )


def _topk_tail(k: int) -> str:
    return f"""
SELECT CAST(rank AS INT) AS rank, doc_id, score FROM (
  SELECT doc_id, round(score, 6) AS score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {k} ORDER BY rank"""


def _lit_list(terms: list[str]) -> str:
    return ", ".join(f"('{t}')" for t in terms)


def bm25_topk_sql(
    terms: list[str],
    *,
    min_match: int = 1,
    require_all: bool = False,
    exclude: list[str] | None = None,
    expand_cond: str | None = None,
    expand_limit: int = 64,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    doc_table: str = "documents",
    tokens_sql: str | None = None,
) -> str:
    """Oracle for Term/Terms/And/Or(min_match)/Not and expanded multiterm
    filters (prefix/range/wildcard/fuzzy pass their dictionary condition as
    `expand_cond`; scoring is capped at `expand_limit` by (df DESC, term
    ASC) — the engine's scored_terms_limit — while MATCHING uses the full
    expansion, [up] core/search/multiterm_query's limited_sample_collector
    semantics).
    """
    if expand_cond is not None:
        qterms = (
            f"qterms_all AS (SELECT term FROM df WHERE {expand_cond}),\n"
            f"qterms AS (SELECT term FROM df WHERE {expand_cond} "
            f"ORDER BY df DESC, term ASC LIMIT {expand_limit})"
        )
        matched = (
            "matched AS (SELECT DISTINCT tf.doc_id FROM tf "
            "JOIN qterms_all USING (term)),"
        )
        scored_src = (
            "scored AS (\n"
            "  SELECT m.doc_id, coalesce(s0.score, 0.0) AS score\n"
            "  FROM matched m LEFT JOIN scored0 s0 USING (doc_id)\n)"
        )
        mm = 1
    else:
        qterms = f"qterms(term) AS (VALUES {_lit_list(terms)})"
        matched = ""
        scored_src = "scored AS (SELECT doc_id, score FROM scored0)"
        mm = len(set(terms)) if require_all else min_match
    not_clause = ""
    if exclude:
        not_clause = (
            " AND tf.doc_id NOT IN (SELECT doc_id FROM tf WHERE term IN ("
            + ", ".join(f"'{t}'" for t in exclude)
            + "))"
        )
    return f"""{base_ctes(doc_table, tokens_sql)},
{qterms},
{matched}
scored0 AS (
  SELECT tf.doc_id, sum({_score_expr(k1, b)}) AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE 1=1 {not_clause}
  GROUP BY tf.doc_id
  HAVING count(DISTINCT tf.term) >= {mm}
),
{scored_src}
{_topk_tail(k)}"""


def bm25_phrase_sql(
    phrase: list,
    *,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    doc_table: str = "documents",
    tokens_sql: str | None = None,
    offsets: list[int] | None = None,
) -> str:
    """Oracle for the positional phrase filter: phrase tf = count of
    positions where all slots match at their offsets in the kept-token
    sequence (consecutive by default; explicit `offsets` admit gaps, the
    reference's by_phrase push_back offs); score = (Σ slot idf) ·
    tfn(phrase_tf, dl) — matching the engine kernel's eval_phrase
    ([up] core/search/phrase_filter.cpp).

    A slot is a plain term string, or a ("prefix", p) / ("cond", sql_cond,
    idf_cond) tuple for multiterm phrase parts: the slot matches any term
    satisfying the condition and contributes Σ idf over those terms."""
    n = len(phrase)
    offs = list(offsets) if offsets is not None else list(range(n))
    deltas = [o - offs[0] for o in offs]

    def slot_match(j, s) -> str:
        d = deltas[j]
        if isinstance(s, str):
            return f"toks[i + {d}] = '{s}'"
        if s[0] == "prefix":
            import re as _re

            esc = s[1].replace("%", "\\%").replace("_", "\\_")
            return f"toks[i + {d}] LIKE '{esc}%'"
        raise ValueError(s)

    def slot_idf(s) -> str:
        base = (
            "ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))"
        )
        if isinstance(s, str):
            return (
                f"(SELECT {base} FROM df CROSS JOIN stats s "
                f"WHERE df.term = '{s}')"
            )
        if s[0] == "prefix":
            esc = s[1].replace("%", "\\%").replace("_", "\\_")
            return (
                f"(SELECT coalesce(sum({base}), 0.0) FROM df CROSS JOIN "
                f"stats s WHERE df.term LIKE '{esc}%')"
            )
        raise ValueError(s)

    adj = " AND ".join(slot_match(j, s) for j, s in enumerate(phrase))
    idf_sum = " + ".join(slot_idf(s) for s in phrase)
    span = deltas[-1] if deltas else 0
    return f"""{base_ctes(doc_table, tokens_sql)},
hits AS (
  SELECT t.doc_id,
         len(list_filter(range(1, len(toks) - {span - 1}), i -> {adj})) AS htf
  FROM tokdocs t
),
scored AS (
  SELECT h.doc_id,
         ({idf_sum})
         * (h.htf * ({k1} + 1.0))
         / (h.htf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) AS score
  FROM hits h JOIN dl ON dl.doc_id = h.doc_id CROSS JOIN stats s
  WHERE h.htf > 0
)
{_topk_tail(k)}"""
