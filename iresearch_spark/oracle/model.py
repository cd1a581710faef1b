"""Pure-Python reference model ("the oracle") for rank-identity testing.

Plays the role of the reference's exact-score unit-test expectations
([up] tests/search/bm25_test.cpp asserts exact document orderings and
scores for small hand-built indexes; [up] tests/index/doc_generator.cpp
feeds golden corpora). The Spark pipeline must reproduce this model's top-k
docIDs AND float64 BM25 scores exactly (BASELINE.json:14 "rank-identical").

Deliberately simple and independent of the Spark code paths: dict/loop
Python + a little numpy, no shared kernels beyond the frozen tokenizer spec
(which is the point of byte-identical analysis).
"""

from __future__ import annotations

import math
import re
import zlib

import numpy as np

from iresearch_spark import BM25_B, BM25_K1
from iresearch_spark.analysis.tokenizer import tokenize
from iresearch_spark.query import filters as qf


def wildcard_to_regex(pattern: str) -> str:
    """Reference wildcard syntax ('%' any run, '_' one char) -> anchored regex
    ([up] core/utils/wildcard_utils.cpp semantics, escape-free subset)."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def levenshtein(
    a: str, b: str, max_d: int, transpositions: bool = False
) -> int:
    """Levenshtein distance, early-exit if > max_d; with
    `transpositions` the OSA/restricted-Damerau variant (adjacent swap
    costs 1) — the reference's parametric automaton supports both
    ([up] core/utils/levenshtein_utils.cpp)."""
    if abs(len(a) - len(b)) > max_d:
        return max_d + 1
    prev2: list[int] | None = None
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            if (
                transpositions
                and i >= 2
                and j >= 2
                and ca == b[j - 2]
                and a[i - 2] == cb
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
            best = min(best, cur[j])
        if best > max_d:
            return max_d + 1
        prev2, prev = prev, cur
    return prev[-1]


class OracleIndex:
    """In-memory inverted index + BM25 evaluator over (url, text) rows."""

    def __init__(
        self,
        urls: list[str],
        texts: list[str],
        n_segments: int = 4,
        k1: float = BM25_K1,
        b: float = BM25_B,
    ):
        self.n_segments = n_segments
        self.k1 = k1  # b=0 -> BM15, b=1 -> BM11 ([up] core/search/bm25.cpp)
        self.b = b
        # segment = crc32(url) % n_segments; docID = 1-based rank of url
        # within its segment (ascending) — must match build/docids.py
        per_seg: dict[int, list[tuple[str, str]]] = {s: [] for s in range(n_segments)}
        for u, t in zip(urls, texts):
            per_seg[zlib.crc32(u.encode()) % n_segments].append((u, t))
        self.doc_url: dict[tuple[int, int], str] = {}
        self.doc_len: dict[tuple[int, int], int] = {}
        # postings[term][seg] = (list of doc_ids, list of tfs, list of pos-lists)
        self.postings: dict[str, dict[int, tuple[list, list, list]]] = {}
        n_total, dl_total = 0, 0
        for seg in range(n_segments):
            rows = sorted(per_seg[seg], key=lambda r: r[0])
            for i, (u, t) in enumerate(rows):
                doc = i + 1  # docIDs start at 1 ([up] core/shared.hpp doc_limits)
                toks = tokenize(t)
                dl = len(toks)
                self.doc_url[(seg, doc)] = u
                self.doc_len[(seg, doc)] = dl
                n_total += 1
                dl_total += dl
                occ: dict[str, list[int]] = {}
                for p, tok in enumerate(toks):
                    occ.setdefault(tok, []).append(p)
                for term, poss in occ.items():
                    by_seg = self.postings.setdefault(term, {})
                    docs, tfs, positions = by_seg.setdefault(seg, ([], [], []))
                    docs.append(doc)
                    tfs.append(len(poss))
                    positions.append(poss)
        self.n_docs = n_total
        self.avgdl = (dl_total / n_total) if n_total else 0.0
        self.df = {t: sum(len(v[0]) for v in s.values()) for t, s in self.postings.items()}
        self.dictionary = sorted(self.df)

    @classmethod
    def from_corpus(cls, pdf, n_segments: int = 4) -> "OracleIndex":
        return cls(pdf["url"].tolist(), pdf["text"].tolist(), n_segments)

    # ------------------------------------------------------------- scoring

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _tfn(self, tf: float, dl: int) -> float:
        return (
            tf
            * (self.k1 + 1.0)
            / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
        )

    def _term_scores(self, term: str, boost: float) -> dict[tuple[int, int], float]:
        out: dict[tuple[int, int], float] = {}
        idf = self.idf(term)
        for seg, (docs, tfs, _) in self.postings.get(term, {}).items():
            for doc, tf in zip(docs, tfs):
                out[(seg, doc)] = boost * idf * self._tfn(tf, self.doc_len[(seg, doc)])
        return out

    # ---------------------------------------------------------- expansion

    def expand(self, node: qf.Filter) -> list[str]:
        """Dictionary expansion for multiterm filters, capped at
        scored_terms_limit by (df desc, term asc) — SURVEY.md F17."""
        d = self.dictionary
        if isinstance(node, qf.Prefix):
            cand = [t for t in d if t.startswith(node.prefix)]
        elif isinstance(node, qf.TermRange):
            cand = d
            if node.lo is not None:
                cand = [t for t in cand if (t >= node.lo if node.include_lo else t > node.lo)]
            if node.hi is not None:
                cand = [t for t in cand if (t <= node.hi if node.include_hi else t < node.hi)]
        elif isinstance(node, qf.Wildcard):
            rx = re.compile(wildcard_to_regex(node.pattern))
            cand = [t for t in d if rx.fullmatch(t)]
        elif isinstance(node, qf.Fuzzy):
            cand = [
                t
                for t in d
                if levenshtein(
                    node.term, t, node.max_distance, node.with_transpositions
                )
                <= node.max_distance
            ]
        else:  # pragma: no cover
            raise TypeError(type(node))
        cand.sort(key=lambda t: (-self.df[t], t))
        return sorted(cand[: node.scored_terms_limit])

    # --------------------------------------------------------- evaluation

    def evaluate(self, node: qf.Filter) -> dict[tuple[int, int], float]:
        node_n = qf.normalize(node)
        return self._eval(node_n)

    def _eval(self, node: qf.Filter) -> dict[tuple[int, int], float]:
        if isinstance(node, qf.Empty):
            return {}
        if isinstance(node, qf.AllDocs):
            return {key: node.boost for key in self.doc_url}
        if isinstance(node, qf.Term):
            return self._term_scores(node.term, node.boost)
        if isinstance(node, qf.Terms):
            return self._eval(
                qf.Or(*[qf.Term(t, node.boost) for t in sorted(set(node.terms))])
            )
        if isinstance(node, (qf.Prefix, qf.TermRange, qf.Wildcard, qf.Fuzzy)):
            terms = self.expand(node)
            if not terms:
                return {}
            return self._eval(qf.Or(*[qf.Term(t, node.boost) for t in terms]))
        if isinstance(node, qf.And):
            child_maps = [self._eval(c) for c in node.children]
            keys = set(child_maps[0])
            for m in child_maps[1:]:
                keys &= set(m)
            return {k: sum(m[k] for m in child_maps) for k in keys}
        if isinstance(node, qf.Or):
            child_maps = [self._eval(c) for c in node.children]
            acc: dict[tuple[int, int], float] = {}
            cnt: dict[tuple[int, int], int] = {}
            for m in child_maps:
                for k, v in m.items():
                    acc[k] = acc.get(k, 0.0) + v
                    cnt[k] = cnt.get(k, 0) + 1
            return {k: v for k, v in acc.items() if cnt[k] >= node.min_match}
        if isinstance(node, qf.Not):
            pos = self._eval(node.child)
            neg = self._eval(node.excluded)
            return {k: v for k, v in pos.items() if k not in neg}
        if isinstance(node, qf.Phrase):
            return self._phrase(node)
        if isinstance(node, qf.SamePosition):
            return self._phrase(node, step=0)
        raise TypeError(f"oracle cannot evaluate {type(node)}")

    def _phrase(self, node, step: int = 1) -> dict[tuple[int, int], float]:
        terms = list(node.terms)
        if not terms:
            return {}
        maps = []
        for t in terms:
            by_seg = self.postings.get(t)
            if not by_seg:
                return {}
            m: dict[tuple[int, int], list[int]] = {}
            for seg, (docs, _tfs, poss) in by_seg.items():
                for doc, pl in zip(docs, poss):
                    m[(seg, doc)] = pl
            maps.append(m)
        keys = set(maps[0])
        for m in maps[1:]:
            keys &= set(m)
        pos_sets = [{k: set(m[k]) for k in keys} for m in maps[1:]]
        idf_sum = sum(self.idf(t) for t in terms)
        out: dict[tuple[int, int], float] = {}
        for k in keys:
            hits = sum(
                1
                for p in maps[0][k]
                if all(p + (i + 1) * step in ps[k] for i, ps in enumerate(pos_sets))
            )
            if hits:
                out[k] = node.boost * idf_sum * self._tfn(hits, self.doc_len[k])
        return out

    # -------------------------------------------------------------- top-k

    def search(self, node: qf.Filter, k: int = 10):
        """Top-k as [(seg_id, doc_id, url, score)] with the frozen tie-break
        (score desc, seg asc, doc asc)."""
        scores = self.evaluate(node)
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        return [
            (seg, doc, self.doc_url[(seg, doc)], float(score))
            for (seg, doc), score in items[:k]
        ]
