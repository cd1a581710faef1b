"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Schema is pinned by BASELINE.json:15: (url:string, warc_ts:timestamp,
html:binary, text:string, lang:string). `text` is the ground-truth
extraction of `html` under the frozen spec in analysis/extract.py, so the
extraction UDF's "byte-identical text per url" invariant is testable.

Generation is CHUNKED and counter-seeded: doc i lives in chunk i//CHUNK_DOCS
and every chunk is generated with rng seeded (seed, chunk_id). Content is
therefore a pure function of (seed, doc_id) — independent of Spark
partitioning and parallelism level, which the N-vs-4N scaling protocol
(BASELINE.md) relies on. Vocabulary is Zipf(1.07) over 50k terms — real
hot-term skew to exercise the salted build path (BASELINE.json:6).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

CHUNK_DOCS = 2_000
VOCAB_SIZE = 50_000
ZIPF_TERMS = 1.07
ZIPF_SITES = 1.2
N_SITES = 500
MIN_DL, MAX_DL = 5, 2000
EPOCH = np.datetime64("2026-01-01T00:00:00", "s")


def _lang_for(urls: np.ndarray) -> np.ndarray:
    """en 90% / de 5% / fr 5%, keyed by crc32(url) — engine-independent."""
    h = np.fromiter(
        (zlib.crc32(u.encode()) % 100 for u in urls), dtype=np.int64, count=len(urls)
    )
    out = np.full(len(urls), "en", dtype=object)
    out[h >= 90] = "de"
    out[h >= 95] = "fr"
    return out


def gen_chunk(chunk_id: int, n_docs_total: int, seed: int = 42) -> pd.DataFrame:
    """Generate the docs of one chunk, fully vectorized."""
    lo = chunk_id * CHUNK_DOCS
    hi = min(lo + CHUNK_DOCS, n_docs_total)
    n = hi - lo
    if n <= 0:
        return pd.DataFrame(
            {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
        )
    rng = np.random.default_rng([seed, chunk_id])
    ids = np.arange(lo, hi, dtype=np.int64)

    sites = (rng.zipf(ZIPF_SITES, n) - 1) % N_SITES
    urls = np.array(
        [f"https://site{s:04d}.example/{i:08x}" for s, i in zip(sites, ids)],
        dtype=object,
    )
    warc_ts = (EPOCH + (ids * 13).astype("timedelta64[s]")).astype("datetime64[us]")

    dls = np.clip(rng.lognormal(5.0, 0.6, n).astype(np.int64), MIN_DL, MAX_DL)
    total = int(dls.sum())
    ranks = (rng.zipf(ZIPF_TERMS, total) - 1) % VOCAB_SIZE
    flat = np.array([f"w{r}" for r in ranks], dtype=object)

    # html decoration on a copy of the flat word stream: every 7th word bold,
    # every 11th a link (tests tag stripping on the extraction path)
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(dls) - dls, dls
    )
    deco = flat.copy()
    b_mask = (pos_in_doc % 7 == 3) & (pos_in_doc % 11 != 5)
    a_mask = pos_in_doc % 11 == 5
    deco[b_mask] = np.char.add(
        np.char.add("<b>", deco[b_mask].astype(str)), "</b>"
    ).astype(object)
    deco[a_mask] = np.char.add(
        np.char.add('<a href="#x">', deco[a_mask].astype(str)), "</a>"
    ).astype(object)

    ends = np.cumsum(dls)
    starts = ends - dls
    mids = starts + dls // 2
    titles = np.array([f"site{s:04d} page {i}" for s, i in zip(sites, ids)], dtype=object)
    amp = ids % 13 == 0  # docs that get an HTML entity in the body

    htmls: list[bytes] = []
    texts: list[str] = []
    for j in range(n):
        p1 = " ".join(flat[starts[j] : mids[j]])
        p2 = " ".join(flat[mids[j] : ends[j]])
        d1 = " ".join(deco[starts[j] : mids[j]])
        d2 = " ".join(deco[mids[j] : ends[j]])
        if amp[j]:
            d2 += " &amp;"
            p2 += " &"
        htmls.append(
            (
                f"<html><head><title>{titles[j]}</title>"
                f"<style>p {{ color: #333; }}</style></head>"
                f"<body><!-- chunk {chunk_id} doc {ids[j]} -->"
                f"<p>{d1}</p>\n<p>{d2}</p>"
                f"<script>var docId = {ids[j]};</script></body></html>"
            ).encode("utf-8")
        )
        texts.append(f"{titles[j]} {p1} {p2}".strip())

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(warc_ts),
            "html": pd.Series(htmls, dtype=object),
            "text": pd.Series(texts, dtype=object),
            "lang": pd.Series(_lang_for(urls), dtype=object),
        }
    )


def gen_corpus_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side corpus for tests (sf-unit=1k, sf-e2e=20k docs)."""
    n_chunks = (n_docs + CHUNK_DOCS - 1) // CHUNK_DOCS
    frames = [gen_chunk(c, n_docs, seed) for c in range(n_chunks)]
    return pd.concat(frames, ignore_index=True)


def gen_corpus_spark(spark, n_docs: int, seed: int = 42):
    """Distributed corpus generation for bench scale (sf-bench=2M docs).

    One input row per chunk -> mapInArrow expands each into CHUNK_DOCS docs;
    content depends only on (seed, chunk_id), never on partitioning.
    """
    import pyarrow as pa

    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    n_chunks = (n_docs + CHUNK_DOCS - 1) // CHUNK_DOCS

    def expand(batches):
        for batch in batches:
            for cid in batch.column("id").to_pylist():
                pdf = gen_chunk(int(cid), n_docs, seed)
                yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)

    return (
        spark.range(0, n_chunks, 1, numPartitions=min(n_chunks, 256))
        .mapInArrow(expand, schema)
    )
