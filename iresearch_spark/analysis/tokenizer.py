"""The `text` analyzer — frozen deterministic spec (FIXTURES.md §6).

Reproduces the role of the reference's text analyzer
([up] core/analysis/text_token_stream.cpp: locale segmentation + lowercase +
accent fold + stopwords + stemming), replaced here by a deterministic,
ICU-free spec so goldens are byte-stable (ANALYZER_VERSION gates changes):

  1. UTF-8 text  2. NFKC normalize  3. lowercase  4. tokens = maximal runs
  of [a-z0-9]  5. drop the frozen 30-word stopword list  6. no stemming in
  v1. Positions are 0-based post-filter indices (token attribute semantics
  of [up] core/analysis/token_attributes.hpp :: increment).

Token-set invariant: this module is the ONLY tokenizer — the Spark kernels,
the pure-Python oracle, and the DuckDB oracle SQL (see
iresearch_spark.textops.sqlgen) must all agree with it for ASCII input.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache
from pathlib import Path

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(r"[a-z0-9]+")


@lru_cache(maxsize=1)
def _load_stopwords() -> frozenset[str]:
    txt = (Path(__file__).parent / "stopwords_en.txt").read_text(encoding="utf-8")
    return frozenset(w for w in txt.split() if w)


STOPWORDS: frozenset[str] = _load_stopwords()


def tokenize(text: str) -> list[str]:
    """Tokenize one string per the frozen spec (stopwords removed)."""
    if not text:
        return []
    norm = unicodedata.normalize("NFKC", text).lower()
    return [t for t in _TOKEN_RE.findall(norm) if t not in STOPWORDS]


def tokenize_with_positions(text: str) -> tuple[list[str], list[int]]:
    """Tokens plus their 0-based post-filter positions (== range(n))."""
    toks = tokenize(text)
    return toks, list(range(len(toks)))


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenization of a pandas Series of strings.

    Uses pandas string kernels (NFKC via str.normalize, lower, findall) —
    the Arrow-UDF fast path; no Python-level loop over rows beyond the
    regex findall's C internals.
    """
    s = texts.fillna("").astype(str)
    norm = s.str.normalize("NFKC").str.lower()
    toks = norm.str.findall(_TOKEN_RE)
    sw = STOPWORDS
    return toks.map(lambda ts: [t for t in ts if t not in sw])


def doc_term_stats(tokens: list[str]) -> tuple[list[str], list[int], list[int], int]:
    """Per-doc inverted entry: (sorted unique terms, tfs, flat positions, dl).

    Positions are concatenated in term order (each term's positions
    ascending), mirroring the per-field postings accumulation of
    [up] core/index/field_data.cpp.
    """
    dl = len(tokens)
    if dl == 0:
        return [], [], [], 0
    arr = np.asarray(tokens, dtype=object)
    order = np.argsort(arr, kind="stable")
    sorted_terms = arr[order]
    positions = np.arange(dl, dtype=np.int64)[order]
    uniq_mask = np.empty(dl, dtype=bool)
    uniq_mask[0] = True
    uniq_mask[1:] = sorted_terms[1:] != sorted_terms[:-1]
    starts = np.flatnonzero(uniq_mask)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = dl
    terms = sorted_terms[starts].tolist()
    tfs = (ends - starts).tolist()
    return terms, tfs, positions.tolist(), dl
