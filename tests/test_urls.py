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


def test_pii_stats_ground_truth(spark):
    """PII counts + redaction vs hand-written expectations."""
    from iresearch_spark.textops.quality import pii_stats

    rows = [
        {"doc_id": 0,
         "text": "mail a@b.co or c.d+x@e.org, ip 192.168.0.1 ok"},
        {"doc_id": 1, "text": "call +1 (555) 123-4567 or 555.987.6543 now"},
        {"doc_id": 2, "text": "clean text with no pii at all"},
    ]
    got = {
        int(r["doc_id"]): r.asDict()
        for r in pii_stats(spark.createDataFrame(pd.DataFrame(rows))).collect()
    }
    assert got[0]["n_email"] == 2 and got[0]["n_ipv4"] == 1
    assert got[0]["redacted"] == "mail <EMAIL> or <EMAIL>, ip <IP> ok"
    assert got[1]["n_phone"] == 2
    assert got[1]["redacted"] == "call <PHONE> or <PHONE> now"
    assert got[2] == {
        "doc_id": 2, "n_email": 0, "n_ipv4": 0, "n_phone": 0,
        "redacted": "clean text with no pii at all",
    }


def test_schemeless_urls_null_canonical_and_kept(spark):
    """Scheme-less / malformed urls (dirty crawl data) canonicalize to
    NULL and are ALWAYS kept by url_dedup — they must not collapse onto
    a shared degenerate '://' form and silently discard each other."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "url": [
                "www.a.example/p/1",      # scheme-less
                "www.b.example/p/2",      # scheme-less, unrelated
                "not a url at all",       # malformed
                "https://ok.org/x",       # one real pair...
                "https://OK.org:443/x/",  # ...that still dedups
            ],
        }
    )
    got = {
        r["doc_id"]: (r["canonical"], r["keep"])
        for r in url_dedup(spark.createDataFrame(pdf)).collect()
    }
    assert got[0] == (None, True)
    assert got[1] == (None, True)
    assert got[2] == (None, True)
    assert got[3] == ("https://ok.org/x", True)
    assert got[4] == ("https://ok.org/x", False)
    # DuckDB twin agrees, nulls included
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = {
        int(d): (c, bool(k))
        for d, c, k in con.execute(url_dedup_sql("url")).fetchall()
    }
    assert oracle == got
