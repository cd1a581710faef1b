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
from iresearch_spark.query import filters as qf


def wildcard_to_regex(pattern: str) -> str:
    """Reference wildcard syntax -> anchored regex ([up]
    core/utils/wildcard_utils.cpp): '%' any run, '_' one char, '\\'
    escapes the next character ('\\%' / '\\_' match the literals, '\\\\'
    a backslash; a trailing lone '\\' matches a literal backslash, the
    reference's lenient trailing-escape behavior)."""
    out = []
    esc = False
    for ch in pattern:
        if esc:
            out.append(re.escape(ch))
            esc = False
        elif ch == "\\":
            esc = True
        elif ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    if esc:
        out.append(re.escape("\\"))
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
    """In-memory inverted index + BM25 evaluator over (url, text) rows,
    with optional extra named fields, each analyzed by its own frozen
    analyzer spec (analysis.analyzers) — the multi-field document model of
    [up] core/index/index_writer.hpp (per-field postings, norms and
    statistics)."""

    def __init__(
        self,
        urls: list[str],
        texts: list[str],
        n_segments: int = 4,
        k1: float = BM25_K1,
        b: float = BM25_B,
        extra_fields: list[tuple[str, list, str]] | None = None,
        segment_keys: list[str] | None = None,
        sort_keys: list | None = None,
    ):
        """extra_fields: [(field_name, values aligned with urls, analyzer
        spec)] indexed alongside the default ("text", texts, "text").
        segment_keys (aligned with urls, default urls) picks each doc's
        segment — the block-ingestion hook: docs sharing a key land in one
        segment (build_index's segment_key option, used by the F19 nested
        block-join, which needs whole blocks co-resident per segment).
        sort_keys (aligned with urls) is the primary-sort value: docIDs
        then follow (sort_key, url) within each segment — build_index's
        sort_by ([up] core/index/comparer.hpp)."""
        from iresearch_spark.analysis.analyzers import analyze_one

        self.n_segments = n_segments
        self.k1 = k1  # b=0 -> BM15, b=1 -> BM11 ([up] core/search/bm25.cpp)
        self.b = b
        fields: list[tuple[str, list, str]] = [("text", texts, "text")]
        fields += list(extra_fields or [])
        self.field_names = [f[0] for f in fields]
        # segment = crc32(segment_key) % n_segments; docID = 1-based rank of
        # url within its segment (ascending) — must match the build pipeline
        seg_keys = segment_keys if segment_keys is not None else urls
        per_seg: dict[int, list[int]] = {s: [] for s in range(n_segments)}
        for i, sk in enumerate(seg_keys):
            per_seg[zlib.crc32(sk.encode()) % n_segments].append(i)
        self.doc_url: dict[tuple[int, int], str] = {}
        # doc_len[field][(seg, doc)] = that field's token count
        self.doc_len: dict[str, dict[tuple[int, int], int]] = {
            name: {} for name, _, _ in fields
        }
        # postings[(field, term)][seg] = (doc_ids, tfs, pos-lists)
        self.postings: dict[tuple[str, str], dict[int, tuple[list, list, list]]] = {}
        n_total = 0
        dl_total: dict[str, int] = {name: 0 for name, _, _ in fields}
        self.doc_sort_key: dict[tuple[int, int], object] = {}
        for seg in range(n_segments):
            if sort_keys is not None:
                rows = sorted(per_seg[seg], key=lambda i: (sort_keys[i], urls[i]))
            else:
                rows = sorted(per_seg[seg], key=lambda i: urls[i])
            for di, i in enumerate(rows):
                doc = di + 1  # docIDs start at 1 ([up] core/shared.hpp)
                self.doc_url[(seg, doc)] = urls[i]
                if sort_keys is not None:
                    self.doc_sort_key[(seg, doc)] = sort_keys[i]
                n_total += 1
                for name, values, spec in fields:
                    toks = analyze_one(values[i], spec)
                    self.doc_len[name][(seg, doc)] = len(toks)
                    dl_total[name] += len(toks)
                    occ: dict[str, list[int]] = {}
                    for tok, p in toks:
                        occ.setdefault(tok, []).append(p)
                    for term, poss in occ.items():
                        by_seg = self.postings.setdefault((name, term), {})
                        docs, tfs, positions = by_seg.setdefault(seg, ([], [], []))
                        docs.append(doc)
                        tfs.append(len(poss))
                        positions.append(sorted(poss))
        self.n_docs = n_total
        self.avgdl_by_field = {
            name: (dl_total[name] / n_total) if n_total else 0.0
            for name, _, _ in fields
        }
        self.avgdl = self.avgdl_by_field["text"]
        self.df = {
            key: sum(len(v[0]) for v in s.values())
            for key, s in self.postings.items()
        }
        self.dictionary_by_field: dict[str, list[str]] = {}
        for fname, term in sorted(self.df):
            self.dictionary_by_field.setdefault(fname, []).append(term)
        self.dictionary = self.dictionary_by_field.get("text", [])

    @classmethod
    def from_corpus(cls, pdf, n_segments: int = 4, **kw) -> "OracleIndex":
        return cls(pdf["url"].tolist(), pdf["text"].tolist(), n_segments, **kw)

    # ------------------------------------------------------------- scoring

    def idf(self, term: str, field: str = "text") -> float:
        df = self.df.get((field, term), 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _tfn(self, tf: float, dl: int, field: str = "text") -> float:
        avgdl = self.avgdl_by_field[field]
        return (
            tf
            * (self.k1 + 1.0)
            / (tf + self.k1 * (1.0 - self.b + self.b * dl / avgdl))
        )

    def _term_scores(
        self, term: str, boost: float, field: str = "text"
    ) -> dict[tuple[int, int], float]:
        out: dict[tuple[int, int], float] = {}
        idf = self.idf(term, field)
        dlm = self.doc_len[field]
        for seg, (docs, tfs, _) in self.postings.get((field, term), {}).items():
            for doc, tf in zip(docs, tfs):
                out[(seg, doc)] = boost * idf * self._tfn(tf, dlm[(seg, doc)], field)
        return out

    # ---------------------------------------------------------- expansion

    def _expand_all(self, node: qf.Filter) -> list[str]:
        """Every dictionary term the multiterm node matches (uncapped)."""
        d = self.dictionary_by_field.get(node.field, [])
        if isinstance(node, qf.Prefix):
            return [t for t in d if t.startswith(node.prefix)]
        if isinstance(node, qf.TermRange):
            cand = d
            if node.lo is not None:
                cand = [t for t in cand if (t >= node.lo if node.include_lo else t > node.lo)]
            if node.hi is not None:
                cand = [t for t in cand if (t <= node.hi if node.include_hi else t < node.hi)]
            return list(cand)
        if isinstance(node, qf.GranularRange):
            from iresearch_spark.analysis.numeric import granular_term_ranges

            trs = granular_term_ranges(
                node.lo,
                node.hi,
                node.step,
                include_lo=node.include_lo,
                include_hi=node.include_hi,
                dtype=node.dtype,
            )
            return [t for t in d if any(a <= t <= b for a, b in trs)]
        if isinstance(node, qf.Wildcard):
            rx = re.compile(wildcard_to_regex(node.pattern))
            return [t for t in d if rx.fullmatch(t)]
        if isinstance(node, qf.Regexp):
            rx = re.compile(node.pattern)
            return [t for t in d if rx.fullmatch(t)]
        if isinstance(node, qf.Fuzzy):
            pfx = node.prefix
            return [
                t
                for t in d
                if t.startswith(pfx)
                and levenshtein(
                    node.term,
                    t[len(pfx):],
                    node.max_distance,
                    node.with_transpositions,
                )
                <= node.max_distance
            ]
        raise TypeError(type(node))  # pragma: no cover

    def expand(self, node: qf.Filter) -> list[str]:
        """The SCORED expansion: top scored_terms_limit matches by
        (df desc, term asc) — SURVEY.md F17."""
        cand = self._expand_all(node)
        cand.sort(key=lambda t: (-self.df[(node.field, t)], t))
        return sorted(cand[: node.scored_terms_limit])

    def expand_weighted(self, node: qf.Filter) -> list[tuple[str, float]]:
        """All matches, weight 1.0 for the scored cap, 0.0 for the rest
        (matched-but-unscored, the limited_sample_collector semantics)."""
        scored = set(self.expand(node))
        return sorted((t, 1.0 if t in scored else 0.0) for t in self._expand_all(node))

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
            return self._term_scores(node.term, node.boost, node.field)
        if isinstance(node, qf.Terms):
            w_by_t = dict(zip(node.terms, node.weights))
            return self._eval(
                qf.Or(
                    *[
                        qf.Term(t, node.boost * w_by_t[t], field=node.field)
                        for t in sorted(w_by_t)
                    ]
                )
            )
        if isinstance(
            node,
            (qf.Prefix, qf.TermRange, qf.GranularRange, qf.Wildcard,
             qf.Regexp, qf.Fuzzy),
        ):
            tw = self.expand_weighted(node)
            if not tw:
                return {}
            return self._eval(
                qf.Terms(
                    [t for t, _ in tw],
                    boost=node.boost,
                    field=node.field,
                    weights=[w for _, w in tw],
                )
            )
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
        if isinstance(node, qf.Nested):
            return self._nested(node)
        if isinstance(node, qf.Phrase):
            return self._phrase(node)
        if isinstance(node, qf.SamePosition):
            return self._phrase(node, step=0)
        if isinstance(node, qf.NgramSimilarity):
            return self._ngram_similarity(node)
        raise TypeError(f"oracle cannot evaluate {type(node)}")

    def _nested(self, node) -> dict[tuple[int, int], float]:
        """F19 block join ([up] core/search/nested_filter.cpp): per
        segment, a child's parent is the nearest parent-matched docID
        strictly greater than the child's; the parent matches when its
        matched-child count is in [min_children, max_children], scoring
        the merge of its children's scores (ascending child docID — the
        frozen float64 association order) times boost."""
        import bisect

        parents_by_seg: dict[int, list[int]] = {}
        for seg, doc in sorted(self._eval(node.parent)):
            parents_by_seg.setdefault(seg, []).append(doc)
        child_scores = self._eval(node.child)
        grouped: dict[tuple[int, int], list[float]] = {}
        for (seg, doc), sc in sorted(child_scores.items()):
            plist = parents_by_seg.get(seg)
            if not plist:
                continue
            j = bisect.bisect_left(plist, doc)
            if j >= len(plist) or plist[j] == doc:
                continue  # orphan past the last parent / is itself a parent
            grouped.setdefault((seg, plist[j]), []).append(sc)
        out: dict[tuple[int, int], float] = {}
        for key, scs in grouped.items():
            n = len(scs)
            if n < node.min_children:
                continue
            if node.max_children is not None and n > node.max_children:
                continue
            if node.merge == "sum":
                agg = 0.0
                for s in scs:
                    agg += s
            elif node.merge == "avg":
                agg = 0.0
                for s in scs:
                    agg += s
                agg /= n
            elif node.merge == "max":
                agg = max(scs)
            elif node.merge == "min":
                agg = min(scs)
            else:  # "none"
                agg = 1.0
            out[key] = node.boost * agg
        return out

    def _ngram_similarity(self, node) -> dict[tuple[int, int], float]:
        """F9 reference model: longest positionally-increasing chain of
        matched target grams / gram count >= threshold; score = boost ·
        similarity ([up] core/search/ngram_similarity_filter.cpp)."""
        import bisect

        grams = list(node.grams())
        m = len(grams)
        if m == 0:
            return {}
        # per doc: list of (gram index, positions)
        events: dict[tuple[int, int], list[tuple[int, list[int]]]] = {}
        for gi, g in enumerate(grams):
            for seg, (docs, _tfs, poss) in self.postings.get(
                (node.field, g), {}
            ).items():
                for doc, pl in zip(docs, poss):
                    events.setdefault((seg, doc), []).append((gi, pl))
        out: dict[tuple[int, int], float] = {}
        for key, evs in events.items():
            tails: list[int] = []
            for gi, pl in sorted(evs):
                # descending within one gram slot: it extends a chain once
                for p in sorted(pl, reverse=True):
                    j = bisect.bisect_left(tails, p)
                    if j == len(tails):
                        tails.append(p)
                    else:
                        tails[j] = p
            sim = len(tails) / m
            if sim >= node.threshold:
                out[key] = node.boost * sim
        return out

    def _phrase(self, node, step: int = 1) -> dict[tuple[int, int], float]:
        """Positional phrase / same-position; slots may be plain terms or
        multiterm phrase parts (expanded UNCAPPED, matching the engine's
        per-position variants). A Phrase node's slot_offsets() (explicit
        per-slot offsets — the reference's by_phrase push_back offs, which
        admits gaps) override the consecutive default; step=0 keeps the
        by_same_position behavior."""
        field = node.field
        slots: list[list[str]] = []
        for part in node.terms:
            if isinstance(part, str):
                slots.append([part])
            elif isinstance(part, qf.Terms):
                slots.append(sorted(set(part.terms)))
            else:
                slots.append(self._expand_all(part))
        if not slots:
            return {}
        maps = []  # per slot: (seg, doc) -> merged sorted positions
        for slot in slots:
            m: dict[tuple[int, int], set] = {}
            for t in slot:
                by_seg = self.postings.get((field, t))
                if not by_seg:
                    continue
                for seg, (docs, _tfs, poss) in by_seg.items():
                    for doc, pl in zip(docs, poss):
                        m.setdefault((seg, doc), set()).update(pl)
            if not m:
                return {}
            maps.append(m)
        keys = set(maps[0])
        for m in maps[1:]:
            keys &= set(m)
        idf_sum = sum(self.idf(t, field) for slot in slots for t in slot)
        dlm = self.doc_len[field]
        if step == 1 and hasattr(node, "slot_offsets"):
            offs = node.slot_offsets()
            deltas = [o - offs[0] for o in offs]
        else:
            deltas = [i * step for i in range(len(maps))]
        out: dict[tuple[int, int], float] = {}
        for k in keys:
            hits = sum(
                1
                for p in sorted(maps[0][k])
                if all(p + deltas[i] in maps[i][k] for i in range(1, len(maps)))
            )
            if hits:
                out[k] = (
                    node.boost * idf_sum * self._tfn(hits, dlm[k], field)
                )
        return out

    # -------------------------------------------------------------- top-k

    def sorted_topk(self, node: qf.Filter, k: int = 10):
        """First k matching docs in index order — (sort_key, url) when
        sort_keys were given, plain url order otherwise; no scoring
        (the sorted-index early-termination read, [up]
        core/index/comparer.hpp)."""
        matched = self.evaluate(node)

        def key(sd):
            if self.doc_sort_key:
                return (self.doc_sort_key[sd], self.doc_url[sd])
            return (self.doc_url[sd],)

        ordered = sorted(matched, key=key)[:k]
        return [(seg, doc, self.doc_url[(seg, doc)]) for seg, doc in ordered]

    def search(self, node: qf.Filter, k: int = 10):
        """Top-k as [(seg_id, doc_id, url, score)] with the frozen tie-break
        (score desc, seg asc, doc asc)."""
        scores = self.evaluate(node)
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        return [
            (seg, doc, self.doc_url[(seg, doc)], float(score))
            for (seg, doc), score in items[:k]
        ]
