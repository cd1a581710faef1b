"""URL canonicalization + canonical-URL dedup — the front-door ops of a
web-crawl training pipeline (the C4 / CCNet shape: a crawler delivers
the same page under http/https, host-case, default-port, tracking-param
and fragment variants; canonicalize first, THEN content-dedup).

All JVM `Column` expressions (regexp + array ops, whole-stage codegen) —
no Python in the hot path; DuckDB twins below share the same regexes so
the driver contract verifies the spec byte-for-byte.

Canonical form (frozen spec):
  * scheme and host lowercased;
  * fragment dropped;
  * default ports dropped (http:80, https:443);
  * duplicate path slashes collapsed, trailing slash stripped (non-root);
    empty path -> "/";
  * tracking query params dropped (utm_*, fbclid, gclid, ref), remaining
    params SORTED (byte order), empty query dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_RE = "^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOSTPORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


def canonical_url(url: Column) -> Column:
    """The frozen canonicalization as one JVM expression tree.

    Scheme-less or malformed input (anything the scheme regex does not
    match — common in dirty crawl data) canonicalizes to NULL rather
    than collapsing every such row onto the degenerate '://' form;
    `url_dedup` treats NULL canonicals as keep=true (no evidence of
    duplication ≠ duplicate)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).otherwise(
        F.when(
            scheme == "https", F.regexp_replace(hostport, ":443$", "")
        ).otherwise(hostport)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "(.+?)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit(""))
            & ~p.rlike(TRACKING_RE),
        )
    )
    qstr = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        url.rlike(_SCHEME_RE),
        F.concat(scheme, F.lit("://"), host, path, qstr),
    ).otherwise(F.lit(None).cast("string"))


def canonical_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(doc_id, url, canonical) — the per-row canonicalization."""
    return df.select(
        "doc_id",
        F.col(url_col).alias("url"),
        canonical_url(F.col(url_col)).alias("canonical"),
    ).orderBy("doc_id")


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonical-URL dedup decision: keep the smallest doc_id per
    canonical form (first-crawled wins under the corpus's doc_id order).
    One hash-partitioned shuffle at canonical-URL width — the same
    scale shape as exact content dedup.

    NULL canonicals (scheme-less / malformed urls) are always kept: a
    row we could not canonicalize carries no duplication evidence, so
    discarding it would be silent data loss.  The keeper join is a
    left join for the same reason — equi-joins drop NULL keys.

    Returns (doc_id, canonical, keep) ordered by doc_id."""
    c = df.select(
        "doc_id", canonical_url(F.col(url_col)).alias("canonical")
    )
    keeper = c.groupBy("canonical").agg(F.min("doc_id").alias("keep_id"))
    return (
        c.join(keeper, "canonical", "left")
        .select(
            "doc_id",
            "canonical",
            F.coalesce(
                F.col("doc_id") == F.col("keep_id"), F.lit(True)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def _canon_sql(url_expr: str) -> str:
    """DuckDB twin of canonical_url over `url_expr`."""
    scheme = f"lower(regexp_extract({url_expr}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({url_expr}, '{_HOSTPORT_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path0 = (
        f"regexp_replace(regexp_extract({url_expr}, "
        f"'{_PATH_RE}', 1), '/{{2,}}', '/', 'g')"
    )
    path = (
        f"CASE WHEN regexp_replace({path0}, '(.+?)/$', '\\1') = '' THEN '/' "
        f"ELSE regexp_replace({path0}, '(.+?)/$', '\\1') END"
    )
    kept = (
        f"list_sort(list_filter(string_split(regexp_extract({url_expr}, "
        f"'\\?([^#]*)', 1), '&'), p -> p <> '' AND NOT "
        f"regexp_matches(p, '{TRACKING_RE}')))"
    )
    qstr = (
        f"CASE WHEN len({kept}) > 0 THEN '?' || list_aggregate({kept}, "
        f"'string_agg', '&') ELSE '' END"
    )
    return (
        f"CASE WHEN regexp_matches({url_expr}, '{_SCHEME_RE}') "
        f"THEN {scheme} || '://' || {host} || {path} || {qstr} "
        f"ELSE NULL END"
    )


def canonical_urls_sql(url_expr: str) -> str:
    return f"""
SELECT doc_id, {url_expr} AS url, {_canon_sql(url_expr)} AS canonical
FROM documents ORDER BY doc_id"""


def url_dedup_sql(url_expr: str) -> str:
    return f"""
WITH c AS (
  SELECT doc_id, {_canon_sql(url_expr)} AS canonical FROM documents
),
k AS (SELECT canonical, min(doc_id) AS keep_id FROM c
      WHERE canonical IS NOT NULL GROUP BY canonical)
SELECT c.doc_id, c.canonical,
       coalesce(c.doc_id = k.keep_id, TRUE) AS keep
FROM c LEFT JOIN k ON c.canonical = k.canonical ORDER BY c.doc_id"""
