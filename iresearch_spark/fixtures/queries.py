"""Frozen query-set generator (FIXTURES.md §2).

Mirrors the task families of the reference's benchmark harness
([up] utils/index-search.cpp runs the Lucene-benchmark Wikipedia tasks:
HighTerm / AndHighHigh / OrHighHigh / Phrase / Prefix3 / Fuzzy1 ...) over
our synthetic Zipf vocabulary: "high" terms are low Zipf ranks (frequent),
"low" terms are high ranks (rare). Queries are (kind, terms) specs so the
same frozen set drives both the oracle and the Spark executor.
"""

from __future__ import annotations

import numpy as np

from iresearch_spark.analysis.tokenizer import tokenize
from iresearch_spark.query import filters as qf

KINDS = (
    "term",
    "and2",
    "and3",
    "or2",
    "or_minmatch",
    "not",
    "prefix",
    "range",
    "phrase2",
    "wildcard",
    "fuzzy1",
)


def build_filter(kind: str, terms: list[str]) -> qf.Filter:
    """Build the filter tree for one query spec. Shared by oracle + Spark."""
    if kind == "term":
        return qf.Term(terms[0])
    if kind == "and2":
        return qf.And(qf.Term(terms[0]), qf.Term(terms[1]))
    if kind == "and3":
        return qf.And(qf.Term(terms[0]), qf.Term(terms[1]), qf.Term(terms[2]))
    if kind == "or2":
        return qf.Or(qf.Term(terms[0]), qf.Term(terms[1]))
    if kind == "or_minmatch":
        return qf.Or(*[qf.Term(t) for t in terms], min_match=2)
    if kind == "not":
        return qf.Not(qf.Term(terms[0]), qf.Term(terms[1]))
    if kind == "prefix":
        return qf.Prefix(terms[0])
    if kind == "range":
        return qf.TermRange(terms[0], terms[1])
    if kind == "phrase2":
        return qf.Phrase(terms)
    if kind == "wildcard":
        return qf.Wildcard(terms[0])
    if kind == "fuzzy1":
        return qf.Fuzzy(terms[0], max_distance=1)
    raise ValueError(kind)


def gen_queries(
    corpus_texts: list[str] | None = None,
    n_queries: int = 100,
    seed: int = 42,
    k: int = 10,
) -> list[dict]:
    """Deterministic query specs: [{qid, kind, terms, k}]."""
    rng = np.random.default_rng([seed, 7])
    # adjacent token pairs for phrase queries, sampled from real docs
    pairs: list[tuple[str, str]] = []
    if corpus_texts:
        idxs = rng.integers(0, len(corpus_texts), size=64)
        for i in idxs:
            toks = tokenize(corpus_texts[int(i)])
            if len(toks) >= 2:
                j = int(rng.integers(0, len(toks) - 1))
                pairs.append((toks[j], toks[j + 1]))
    if not pairs:
        pairs = [("w0", "w1")]

    def high() -> str:
        return f"w{int(rng.integers(0, 50))}"

    def low() -> str:
        return f"w{int(rng.integers(2000, 20000))}"

    out = []
    for qid in range(n_queries):
        kind = KINDS[qid % len(KINDS)]
        if kind == "term":
            terms = [high() if qid % 2 else low()]
        elif kind == "and2":
            terms = [high(), high()]
        elif kind == "and3":
            terms = [high(), high(), low()]
        elif kind == "or2":
            terms = [high(), low()]
        elif kind == "or_minmatch":
            terms = [high(), high(), low()]
        elif kind == "not":
            terms = [high(), high()]
        elif kind == "prefix":
            terms = [f"w{int(rng.integers(10, 99))}"]
        elif kind == "range":
            lo = int(rng.integers(100, 800))
            terms = [f"w{lo}", f"w{lo + 5}"]
        elif kind == "phrase2":
            terms = list(pairs[int(rng.integers(0, len(pairs)))])
        elif kind == "wildcard":
            base = f"w{int(rng.integers(10, 99))}"
            terms = [base + "%"] if qid % 2 else [base[:-1] + "_"]
        elif kind == "fuzzy1":
            terms = [f"w{int(rng.integers(100, 999))}"]
        else:  # pragma: no cover
            raise ValueError(kind)
        out.append({"qid": qid, "kind": kind, "terms": terms, "k": k})
    return out
