"""URL canonicalization + canonical-URL dedup (textops/urls.py): frozen
spec vs hand ground truth, Spark vs DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pandas as pd

from iresearch_spark.textops.urls import (
    canonical_urls,
    canonical_urls_sql,
    url_dedup,
    url_dedup_sql,
)

CASES = [
    # (raw, canonical)
    ("HTTP://Example.COM:80//a//b/?utm_source=x&b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2"),
    ("http://example.com/a/b?a=1&b=2", "http://example.com/a/b?a=1&b=2"),
    ("https://Site.org:443/", "https://site.org/"),
    ("https://site.org", "https://site.org/"),
    ("https://site.org/p/?ref=tw", "https://site.org/p"),
    ("https://site.org/p?fbclid=abc&gclid=1&utm_campaign=c",
     "https://site.org/p"),
    ("ftp://Weird.Host:21/file/", "ftp://weird.host:21/file"),
    ("http://h.example:8080/x//y///z?b&a", "http://h.example:8080/x/y/z?a&b"),
]


def test_canonical_matches_ground_truth(spark):
    pdf = pd.DataFrame(
        {"doc_id": range(len(CASES)), "url": [c[0] for c in CASES]}
    )
    got = canonical_urls(spark.createDataFrame(pdf)).collect()
    assert [r["canonical"] for r in got] == [c[1] for c in CASES]


def test_spark_equals_duckdb_twin(spark):
    pdf = pd.DataFrame(
        {"doc_id": range(len(CASES)), "url": [c[0] for c in CASES]}
    )
    got = [
        (r["doc_id"], r["canonical"])
        for r in canonical_urls(spark.createDataFrame(pdf)).collect()
    ]
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = [
        (int(d), c)
        for d, _u, c in con.execute(canonical_urls_sql("url")).fetchall()
    ]
    assert got == oracle
    got_k = [
        (r["doc_id"], r["keep"])
        for r in url_dedup(spark.createDataFrame(pdf)).collect()
    ]
    oracle_k = [
        (int(d), bool(k))
        for d, _c, k in con.execute(url_dedup_sql("url")).fetchall()
    ]
    assert got_k == oracle_k


def test_dedup_keeps_first_crawled(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [5, 2, 9],
            "url": [
                "https://A.org/x/",
                "https://a.org/x",
                "https://a.org:443/x#f",
            ],
        }
    )
    got = {
        r["doc_id"]: r["keep"]
        for r in url_dedup(spark.createDataFrame(pdf)).collect()
    }
    assert got == {2: True, 5: False, 9: False}
