"""Distributed query execution: filter tree -> prepared plan -> per-segment
scoring kernel -> global top-k (SURVEY.md §3.2 Spark re-architecture).

Phases mirror the reference's prepare/execute split
([up] core/search/filter.hpp :: prepare, prepared::execute):

  1. PREPARE (driver + one small dictionary job): normalize trees, expand
     multiterm filters against each FIELD's term dictionary (prefix/range/
     wildcard pushed down to the (field, term)-sorted parquet scan; fuzzy
     via a vectorized Levenshtein/OSA pandas UDF). The top
     scored_terms_limit expansions by (df desc, term asc) score; the rest
     match unscored ([up] core/search/multiterm_query.cpp). Collect
     per-field term stats (N, avgdl_f, df -> idf) as a small dict.
  2. EXECUTE (one cogrouped job): posting rows for the needed (field,
     term) keys are cogrouped with the per-(segment, field) norms by
     seg_id; a numpy kernel decodes blobs once per (field, term, segment),
     evaluates every query's tree with that field's statistics, and emits
     per-segment top-k — segments are independent exactly as the
     reference's per-segment execute.
  3. REDUCE: window row_number over (score desc, seg asc, doc asc) takes
     the global top-k per query; an optional broadcast join against the doc
     table resolves urls.

Scores are float64 with the association order frozen in
iresearch_spark.query.filters — rank-identical to the oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from iresearch_spark import BM25_B, BM25_K1
from iresearch_spark.codec.postings import (
    decode_positions_for,
    decode_postings,
)
from iresearch_spark.analysis.numeric import granular_term_ranges
from iresearch_spark.oracle.model import wildcard_to_regex
from iresearch_spark.query import filters as qf
from iresearch_spark.query.fuzzy import damerau_leq_mask, levenshtein_leq_mask
from iresearch_spark.query.wand import (
    TermPostings,
    and_terms,
    or_groups_topk,
    or_terms_topk,
)
from iresearch_spark.store import SnapshotStore

RESULT_SCHEMA = "qid bigint, seg_id int, doc_id bigint, score double"

_EXPANDABLE = (
    qf.Prefix,
    qf.TermRange,
    qf.GranularRange,
    qf.Wildcard,
    qf.Regexp,
    qf.Fuzzy,
)

# Safety bound on the driver-side multiterm expansion (matched terms are
# collected so their postings can be fetched — the reference holds the same
# expansion in memory). A pattern matching more than this is a query-shape
# error, not a scale the engine should silently absorb.
MAX_EXPANSION_ROWS = 100_000


def _fuzzy_piece_cond(q: str, d: int, *, osa: bool, offset: int = 0):
    """JVM-side pigeonhole prefilter for the fuzzy dictionary scan
    (PassJoin partition signature; the reference prunes with a Levenshtein
    automaton ∩ FST instead — [up] core/search/levenshtein_filter.cpp).

    Split q into m contiguous pieces: a plain Levenshtein edit destroys at
    most one piece's verbatim occurrence, so m = d+1 guarantees one intact
    piece; an OSA transposition straddling a boundary can destroy two, so
    m = 2d+1 there. An intact piece must occur within ±d of its position
    in q, shifted right by `offset` chars when the DP target is the
    suffix after a fixed prefix (Fuzzy.prefix). Returns a Column
    (evaluated entirely by codegen BEFORE the DP pandas UDF, which
    Catalyst hoists into a later ArrowEvalPython node), or None when q
    is too short to split."""
    m = (2 * d + 1) if osa else (d + 1)
    if d == 0 or len(q) < m:
        return None
    base, extra = divmod(len(q), m)
    cond = None
    start = 0
    for i in range(m):
        ln = base + (1 if i < extra else 0)
        piece = q[start : start + ln]
        lo = max(1, offset + start + 1 - d)  # 1-based occurrence window
        hi = offset + start + 1 + d
        c = F.locate(piece, F.col("term"), lo).between(lo, hi)
        cond = c if cond is None else (cond | c)
        start += ln
    return cond


def _flatten_or_terms(tree: qf.Filter):
    """[((field, term), weight multiplier)] if `tree` is a pure min_match=1
    disjunction over unique terms with non-negative weights — the shape
    block-max WAND handles. Zero-weight members are F17's
    matched-but-unscored expansions: or_terms_topk carries them as
    match-only iterators whose lists are only decoded when fewer than k
    positively-scored docs exist."""
    out: list[tuple[tuple[str, str], float]] = []

    def rec(node: qf.Filter, mult: float) -> bool:
        if isinstance(node, qf.Term):
            out.append(((node.field, node.term), mult * node.boost))
            return True
        if isinstance(node, qf.Terms):
            w_by_t = dict(zip(node.terms, node.weights))
            for t in sorted(w_by_t):
                out.append(((node.field, t), mult * node.boost * w_by_t[t]))
            return True
        if isinstance(node, qf.Or) and node.min_match == 1:
            return all(rec(c, mult * node.boost) for c in node.children)
        return False

    if not rec(tree, 1.0):
        return None
    keys = [k for k, _ in out]
    if len(set(keys)) != len(keys):
        return None
    if any(w < 0.0 for _, w in out):
        return None
    return out


def _flatten_or_groups(tree: qf.Filter):
    """list[list[((field, term), weight)]] if `tree` is a min_match=1
    disjunction whose DIRECT children are Term / And-of-Term nodes — one
    boolean level of conjunction under the disjunction, the shape
    `or_groups_topk` prunes with propagated block upper bounds.  Each
    inner list is a conjunction group (singletons = plain disjuncts).

    Deliberately narrower than `_flatten_or_terms`: Terms children and
    nested Or levels are NOT splatted into separate groups, because the
    exhaustive evaluator sums their members into a sub-accumulator
    before adding to the disjunction — splatting would change the float
    association order and break last-ulp rank identity with the oracle.
    Returns None for any other shape."""
    groups: list[list[tuple[tuple[str, str], float]]] = []
    if not (isinstance(tree, qf.Or) and tree.min_match == 1):
        return None
    for c in tree.children:
        if isinstance(c, qf.Term):
            groups.append([((c.field, c.term), tree.boost * c.boost)])
        elif isinstance(c, qf.And) and all(
            isinstance(m, qf.Term) for m in c.children
        ) and c.children:
            groups.append(
                [
                    ((m.field, m.term), tree.boost * c.boost * m.boost)
                    for m in c.children
                ]
            )
        else:
            return None
    if any(w < 0.0 for g in groups for _, w in g):
        return None
    return groups


def _flatten_and_terms(tree: qf.Filter):
    """[((field, term), weight)] if `tree` is a flat Term conjunction."""
    if isinstance(tree, qf.And) and all(
        isinstance(c, qf.Term) for c in tree.children
    ):
        return [
            ((c.field, c.term), tree.boost * c.boost) for c in tree.children
        ]
    return None


def _walk_terms(node: qf.Filter, terms: set, phrases: list, pos_keys: set) -> None:
    """Collect every (field, term) key the tree needs postings for.

    `pos_keys` additionally collects the keys whose GLOBAL idf must be
    resolved driver-side: Phrase/SamePosition slot weights sum idf over
    every slot variant — including variants absent from a given segment —
    so the per-segment kernel cannot derive them from the rows it sees.
    All other keys get their idf inside the kernel from the fused
    global-df column (one job instead of stats job + execute job)."""
    if isinstance(node, qf.Term):
        terms.add((node.field, node.term))
    elif isinstance(node, (qf.Terms,)):
        terms.update((node.field, t) for t in node.terms)
    elif isinstance(node, (qf.Phrase, qf.SamePosition)):
        for slot in node.terms:
            if isinstance(slot, qf.Terms):
                keys = {(node.field, t) for t in slot.terms}
            else:
                keys = {(node.field, slot)}
            terms.update(keys)
            pos_keys.update(keys)
        phrases.append(node)
    elif isinstance(node, qf.NgramSimilarity):
        # positional, but its score (boost · similarity) uses no idf
        terms.update((node.field, g) for g in node.grams())
        phrases.append(node)
    elif isinstance(node, qf.And):
        for c in node.children:
            _walk_terms(c, terms, phrases, pos_keys)
    elif isinstance(node, qf.Or):
        for c in node.children:
            _walk_terms(c, terms, phrases, pos_keys)
    elif isinstance(node, qf.Not):
        _walk_terms(node.child, terms, phrases, pos_keys)
        _walk_terms(node.excluded, terms, phrases, pos_keys)
    elif isinstance(node, qf.Nested):
        _walk_terms(node.parent, terms, phrases, pos_keys)
        _walk_terms(node.child, terms, phrases, pos_keys)


def _keys_condition(keys) -> "F.Column":
    """Pushdown-friendly scan predicate for a set of (field, term) keys:
    one isin per referenced field, OR-combined."""
    by_field: dict[str, list[str]] = {}
    for f, t in keys:
        by_field.setdefault(f, []).append(t)
    cond = None
    for f, ts in sorted(by_field.items()):
        c = (F.col("field") == f) & F.col("term").isin(ts)
        cond = c if cond is None else (cond | c)
    return cond


def _walk_columns(node: qf.Filter, out: set) -> None:
    if isinstance(node, qf.ColumnExists):
        out.add(node.column)
    elif isinstance(node, (qf.And, qf.Or)):
        for c in node.children:
            _walk_columns(c, out)
    elif isinstance(node, qf.Not):
        _walk_columns(node.child, out)
        _walk_columns(node.excluded, out)
    elif isinstance(node, qf.Nested):
        _walk_columns(node.parent, out)
        _walk_columns(node.child, out)


def _phrase_part(node: qf.Filter, field: str) -> qf.Filter:
    """A multiterm node used as a phrase slot expands WITHOUT the scored
    cap ([up] phrase_filter's per-position variants match every term the
    automaton accepts) and inherits the phrase's field."""
    import dataclasses

    return dataclasses.replace(node, scored_terms_limit=1 << 30, field=field)


def _collect_expansions(node: qf.Filter, out: list) -> None:
    if isinstance(node, _EXPANDABLE):
        out.append(node)
    elif isinstance(node, qf.Phrase):
        for slot in node.terms:
            if isinstance(slot, _EXPANDABLE):
                out.append(_phrase_part(slot, node.field))
    elif isinstance(node, qf.And) or isinstance(node, qf.Or):
        for c in node.children:
            _collect_expansions(c, out)
    elif isinstance(node, qf.Not):
        _collect_expansions(node.child, out)
        _collect_expansions(node.excluded, out)
    elif isinstance(node, qf.Nested):
        _collect_expansions(node.parent, out)
        _collect_expansions(node.child, out)


def _rewrite(node: qf.Filter, resolved: dict) -> qf.Filter:
    """Replace multiterm leaves with their dictionary expansions.

    `resolved[node]` is [(term, weight)]: weight 1.0 for the top
    scored_terms_limit expansions by (df desc, term asc), 0.0 for the rest
    — which still MATCH but contribute no score, the reference's
    limited_sample_collector semantics (SURVEY.md F17)."""
    if isinstance(node, _EXPANDABLE):
        tw = resolved.get(node, ())
        if not tw:
            return qf.Empty()
        return qf.Terms(
            [t for t, _ in tw],
            boost=node.boost,
            field=node.field,
            weights=[w for _, w in tw],
        )
    if isinstance(node, qf.Phrase):
        slots = []
        for slot in node.terms:
            if isinstance(slot, _EXPANDABLE):
                tw = resolved.get(_phrase_part(slot, node.field), ())
                if not tw:
                    return qf.Empty()  # an unmatchable slot empties the phrase
                slots.append(qf.Terms([t for t, _ in tw], field=node.field))
            else:
                slots.append(slot)
        return qf.Phrase(
            slots, boost=node.boost, field=node.field, offsets=node.offsets
        )
    if isinstance(node, qf.And):
        return qf.And(*[_rewrite(c, resolved) for c in node.children], boost=node.boost)
    if isinstance(node, qf.Or):
        return qf.Or(
            *[_rewrite(c, resolved) for c in node.children],
            min_match=node.min_match,
            boost=node.boost,
        )
    if isinstance(node, qf.Not):
        return qf.Not(
            _rewrite(node.child, resolved), _rewrite(node.excluded, resolved), node.boost
        )
    if isinstance(node, qf.Nested):
        return qf.Nested(
            _rewrite(node.parent, resolved),
            _rewrite(node.child, resolved),
            node.min_children,
            node.max_children,
            node.merge,
            node.boost,
        )
    return node


class IndexSearcher:
    # scored-head elision pass-2 check: above this many pass-1 rows
    # (k · |distinct queries|) the trigger check and merge stay
    # DataFrames — the driver never materializes the batch's results
    ELISION_COLLECT_MAX = 100_000

    def __init__(
        self,
        spark,
        store: SnapshotStore,
        snapshot_id: int | None = None,
        k1: float = BM25_K1,
        b: float = BM25_B,
        scorer: str = "bm25",
    ):
        """scorer: "bm25" ([up] core/search/bm25.cpp, k1/b as given; b=0 is
        BM15, b=1 BM11) or "tfidf" ([up] core/search/tfidf.cpp with norms:
        idf = 1 + ln(N/(df+1)), contribution = idf·sqrt(tf)/sqrt(dl))."""
        self.spark = spark
        self.store = store
        self.sid = snapshot_id if snapshot_id is not None else store.current_snapshot_id()
        stats = store.global_stats(self.sid)
        self.n_docs = stats["n_docs"]
        self.avgdl = stats["avgdl"]
        self.field_names = [d["name"] for d in store.fields(self.sid)]
        self.avgdl_by_field = dict(stats.get("avgdl_by_field") or {})
        if not self.avgdl_by_field:  # legacy single-field snapshot
            self.avgdl_by_field = {self.field_names[0]: self.avgdl}
        self.k1, self.b = k1, b
        # primary-sort expression frozen in the manifest (None = url order)
        self.sort = store.sort_spec(self.sid)
        self.n_segments = len(store.snapshot(self.sid)["segments"])
        if scorer not in ("bm25", "tfidf"):
            raise ValueError(scorer)
        self.scorer = scorer
        self._postings = store.read_postings(spark, self.sid)
        self._norms = store.read_norms(spark, self.sid)
        # global df per (field, term), filled lazily; snapshot-pinned, so
        # entries never go stale for this searcher
        self._df_cache: dict[tuple[str, str], int] = {}
        # multiterm-expansion result cache: expansion nodes are frozen
        # value objects and the snapshot is pinned, so an expansion never
        # goes stale either ([up] core/search/multiterm_query.cpp caches
        # the collected term states the same way per prepared filter)
        self._exp_cache: dict[qf.Filter, tuple] = {}
        self._dict_df = None  # lazy global term dictionary, see _term_dict
        # the large-batch elision path persists its pass-1 frame so the
        # trigger-stats collect and the returned union share one
        # materialization; the slot lets the NEXT large batch (or close())
        # release the previous one instead of leaking cached partitions
        # across repeated calls in a long-lived session
        self._elision_persisted = None

    def close(self) -> None:
        """Release executor-side caches held by this searcher (currently
        the large-batch elision persist slot).  Safe to call repeatedly;
        the searcher remains usable — caches rebuild lazily."""
        if self._elision_persisted is not None:
            self._elision_persisted.unpersist(blocking=False)
            self._elision_persisted = None

    def _term_dict(self):
        """Global term dictionary (field, term, df) as a materialized
        DataFrame — the S7 dictionary surface multiterm expansion scans.

        Derived from the postings table once per searcher and
        materialized as executor-local checkpoint blocks: O(vocabulary)
        skinny rows, not O(corpus) — expansions and stats lookups then
        filter ~|vocab| materialized rows instead of re-scanning +
        re-aggregating every segment's term rows per batch.
        Snapshot-pinned like every other searcher cache."""
        if self._dict_df is None:
            base = self._postings.groupBy("field", "term").agg(
                F.sum("df").alias("df")
            )
            # Right-size the expansion job's task count to the vocabulary
            # (~64k terms/task keeps the vectorized-DP Arrow batch large;
            # a small dictionary at the session's full shuffle width would
            # pay dozens of per-task python roundtrips per expansion), and
            # materialize via localCheckpoint rather than SQL cache:
            # measured on this Spark, an ArrowEvalPython (fuzzy-DP) stage
            # over an InMemoryRelation costs ~3 s PER JOB in re-planning
            # overhead vs ~0.3 s over checkpointed blocks — a 10x constant
            # on every fuzzy/wildcard-UDF expansion. The blocks are
            # O(vocab) skinny rows, executor-distributed; loss of an
            # executor just recomputes the one-shuffle aggregate.
            # ~16k terms/task: an Arrow batch that size still amortizes
            # the vectorized-DP UDF, while a 650k-term web vocabulary
            # yields ~40 tasks instead of 10 — enough waves that the
            # expansion job scales with cluster width instead of capping
            # at |vocab|/65536 busy cores. Width-invariant (depends only
            # on n_terms), so N-vs-4N runs keep identical plans.
            n_terms = base.count()
            target = max(4, -(-n_terms // 16384))
            if target < base.rdd.getNumPartitions():
                base = base.coalesce(target)
            self._dict_df = base.localCheckpoint()
        return self._dict_df

    # ------------------------------------------------------------ prepare

    def idf(self, df: int) -> float:
        if self.scorer == "tfidf":
            return 1.0 + math.log(self.n_docs / (df + 1.0))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _expand(self, nodes: list[qf.Filter]) -> dict:
        """One distributed dictionary job expanding all multiterm nodes.

        Returns node -> ((term, weight), ...): the top scored_terms_limit
        expansions by (df desc, term asc) carry weight 1.0, the remaining
        matches weight 0.0 — matched but unscored, the reference's
        limited_sample_collector behavior (SURVEY.md F17,
        [up] core/search/multiterm_query.cpp)."""
        if not nodes:
            return {}
        cached = {n: self._exp_cache[n] for n in nodes if n in self._exp_cache}
        nodes = [n for n in nodes if n not in cached]
        if not nodes:
            return cached
        conds = []
        for node in nodes:
            in_field = F.col("field") == node.field
            if isinstance(node, qf.Prefix):
                conds.append(in_field & F.col("term").startswith(node.prefix))
            elif isinstance(node, qf.TermRange):
                c = in_field
                if node.lo is not None:
                    c = c & (
                        (F.col("term") >= node.lo)
                        if node.include_lo
                        else (F.col("term") > node.lo)
                    )
                if node.hi is not None:
                    c = c & (
                        (F.col("term") <= node.hi)
                        if node.include_hi
                        else (F.col("term") < node.hi)
                    )
                conds.append(c)
            elif isinstance(node, qf.GranularRange):
                # F5: fewest-terms trie decomposition; each sub-range is a
                # contiguous slice of the (fixed-width, level-prefixed)
                # term dictionary — pure JVM comparisons, pushdown-friendly
                trs = granular_term_ranges(
                    node.lo,
                    node.hi,
                    node.step,
                    include_lo=node.include_lo,
                    include_hi=node.include_hi,
                    dtype=node.dtype,
                )
                c = F.lit(False)
                for t_lo, t_hi in trs:
                    c = c | (
                        (F.col("term") >= t_lo) & (F.col("term") <= t_hi)
                    )
                conds.append(in_field & c)
            elif isinstance(node, qf.Wildcard):
                conds.append(
                    in_field
                    & F.col("term").rlike(
                        "^(?:" + wildcard_to_regex(node.pattern) + ")$"
                    )
                )
            elif isinstance(node, qf.Regexp):
                # full-match semantics (RegexpQuery / REGEX_TEST): the
                # anchors make JVM rlike behave as a fullmatch
                conds.append(
                    in_field
                    & F.col("term").rlike("^(?:" + node.pattern + ")$")
                )
            elif isinstance(node, qf.Fuzzy):
                q, d, npfx = node.term, node.max_distance, len(node.prefix)
                metric = (
                    damerau_leq_mask
                    if node.with_transpositions
                    else levenshtein_leq_mask
                )
                len_ok = F.length("term").between(
                    npfx + len(q) - d, npfx + len(q) + d
                )

                @F.pandas_udf("boolean")
                def lev_ok(terms: pd.Series) -> pd.Series:
                    # fixed-prefix option: the DP runs on the suffix only
                    sufs = terms.str.slice(npfx) if npfx else terms
                    mask = metric(q, sufs.to_numpy(dtype=np.str_), d)
                    return pd.Series(mask)

                pre = in_field & len_ok
                if node.prefix:
                    pre = pre & F.col("term").startswith(node.prefix)
                # piece windows shift right by the prefix length: the DP
                # target is term[len(prefix):], so an intact piece of q
                # lands at prefix_len + its q-position, +/- d
                piece_cond = _fuzzy_piece_cond(
                    q, d, osa=node.with_transpositions, offset=npfx
                )
                if piece_cond is not None:
                    pre = pre & piece_cond
                conds.append(pre & lev_ok(F.col("term")))
            else:  # pragma: no cover
                raise TypeError(type(node))
        union = conds[0]
        for c in conds[1:]:
            union = union | c
        dict_df = self._term_dict().filter(union)
        tag = F.array(
            *[F.when(c, F.lit(i)).otherwise(F.lit(None)) for i, c in enumerate(conds)]
        )
        w = Window.partitionBy("node_id").orderBy(F.desc("df"), F.asc("term"))
        rows = (
            dict_df.select("field", "term", "df", F.explode(tag).alias("node_id"))
            .filter(F.col("node_id").isNotNull())
            .withColumn("rn", F.row_number().over(w))
            .select("node_id", "term", "rn", "df")
            .limit(MAX_EXPANSION_ROWS + 1)
            .collect()
        )
        if len(rows) > MAX_EXPANSION_ROWS:
            raise ValueError(
                f"multiterm expansion exceeds {MAX_EXPANSION_ROWS} terms; "
                "narrow the prefix/wildcard/range pattern"
            )
        by_node: dict[int, list[tuple[str, float]]] = {}
        for r in rows:
            nid = int(r["node_id"])
            scored = int(r["rn"]) <= nodes[nid].scored_terms_limit
            by_node.setdefault(nid, []).append(
                (r["term"], 1.0 if scored else 0.0)
            )
            # the expansion job already aggregated global df — reuse it so
            # prepare() never re-scans the dictionary for expanded terms
            self._df_cache[(nodes[nid].field, r["term"])] = int(r["df"])
        out = {
            node: tuple(sorted(by_node.get(i, [])))
            for i, node in enumerate(nodes)
        }
        self._exp_cache.update(out)
        out.update(cached)
        return out

    def _existence_df(self, columns: list[str]) -> DataFrame:
        """Per-segment existence sets for ColumnExists leaves, fully
        distributed ([up] core/search/column_existence_filter.cpp
        materializes a per-segment column iterator; here the doc table IS
        the columnstore). One doc-table scan covers ALL referenced
        columns; the per-segment sorted doc-id blobs ride the cogroup into
        the scoring kernel exactly like mask_bin — nothing touches the
        driver."""
        docs = self.store.read_docs(self.spark, self.sid)
        flags = [
            F.col(c).isNotNull().alias(f"__ex_{i}") for i, c in enumerate(columns)
        ]
        sel = docs.select("seg_id", "doc_id", *flags)
        cols = list(columns)

        def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("doc_id")
            bins = [
                pdf.loc[pdf[f"__ex_{i}"], "doc_id"]
                .to_numpy(dtype=np.int64)
                .astype("<u4")
                .tobytes()
                for i in range(len(cols))
            ]
            return pd.DataFrame(
                {"seg_id": [int(key[0])], "ex_cols": [cols], "ex_bins": [bins]}
            )

        return sel.groupBy("seg_id").applyInPandas(
            build, "seg_id int, ex_cols array<string>, ex_bins array<binary>"
        )

    def _cogrouped(self, rows: DataFrame, trees, kernel) -> DataFrame:
        """Run the per-segment kernel with the cogroup exchange sized to
        the DATA, not the session default: both sides are hash-partitioned
        on seg_id into n_segments partitions, which satisfies the
        cogroup's required distribution, so the shuffle moves exactly one
        non-empty partition per segment instead of
        spark.sql.shuffle.partitions mostly-empty ones (at 64 partitions
        over a 4-segment index, 60 tasks per query did nothing but pay
        scheduling). The count is a property of the snapshot's layout —
        identical at every cluster width, preserving the N-vs-4N
        plan-invariance the scaling bench asserts."""
        n = max(1, self.n_segments)
        return (
            rows.repartition(n, "seg_id")
            .groupBy("seg_id")
            .cogroup(
                self._norms_side(trees).repartition(n, "seg_id").groupBy("seg_id")
            )
            .applyInPandas(kernel, RESULT_SCHEMA)
        )

    def _norms_side(self, trees) -> DataFrame:
        """Norms table, plus per-segment existence blobs when any query
        references a ColumnExists filter."""
        columns: set[str] = set()
        for t in trees.values():
            _walk_columns(t, columns)
        if not columns:
            return self._norms
        return self._norms.join(
            self._existence_df(sorted(columns)), "seg_id", "left"
        )

    def prepare(self, queries: dict[int, qf.Filter]):
        """Normalize + expand all query trees; returns (trees, terms, idf)."""
        norm = {qid: qf.normalize(f) for qid, f in queries.items()}
        exp_nodes: list[qf.Filter] = []
        for t in norm.values():
            _collect_expansions(t, exp_nodes)
        # dedupe, preserving order
        seen: dict[qf.Filter, None] = {}
        for n in exp_nodes:
            seen.setdefault(n)
        resolved = self._expand(list(seen))
        trees = {
            qid: qf.normalize(_rewrite(t, resolved)) for qid, t in norm.items()
        }
        terms: set[tuple[str, str]] = set()
        phrases: list = []
        pos_keys: set[tuple[str, str]] = set()
        for t in trees.values():
            _walk_terms(t, terms, phrases, pos_keys)
        # Driver-side global df is needed ONLY for Phrase/SamePosition slot
        # keys (their slot weight sums idf over variants a segment may not
        # contain) that aren't already cached from an expansion job or an
        # earlier query. Every other key's idf is derived INSIDE the
        # scoring kernel from the fused global-df column search_batch
        # broadcast-joins onto the posting rows — a plain term/And/Or
        # query therefore runs as ONE Spark job, no separate stats job.
        missing_pos = [k for k in pos_keys if k not in self._df_cache]
        if missing_pos:
            stat_rows = (
                self._postings.filter(_keys_condition(missing_pos))
                .groupBy("field", "term")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            for r in stat_rows:
                self._df_cache[(r["field"], r["term"])] = int(r["df"])
            for k in missing_pos:  # absent terms have df 0
                self._df_cache.setdefault(k, 0)
        idf = {
            k: self.idf(self._df_cache[k])
            for k in terms
            if k in self._df_cache
        }
        return trees, terms, idf, bool(phrases)

    # ------------------------------------------------------------ execute

    def search_batch(
        self,
        queries: dict[int, qf.Filter],
        k: int = 10,
        with_urls: bool = True,
        tie: str = "segdoc",
        score_round: int | None = None,
        with_cols: tuple[str, ...] = (),
        _ship_all: bool = False,
    ) -> DataFrame:
        """Run a batch of queries; returns DataFrame
        (qid, rank, seg_id, doc_id[, url], score[, *with_cols]) with
        global top-k rows.

        tie: "segdoc" (reference order: score desc, seg asc, doc asc) or
        "url" (score desc, url asc — a total order that external oracles
        can reproduce without knowing segment hashing).
        score_round: round scores to N dp INSIDE the kernel before
        per-segment top-k, so rank ties are decided on the same values an
        external double-precision oracle computes (absorbs last-ulp
        numpy-vs-libm noise; see SURVEY.md §7 hard-part (a)).
        with_cols: extra STORED doc columns (the columnstore surface —
        [up] core/formats/columnstore2, ArangoSearch storedValues)
        appended to each hit row via the same broadcast top-k join that
        fetches urls: k·|queries| lookup rows, never a corpus scan."""
        trees, terms, idf, need_pos = self.prepare(queries)
        extra_cols: list[str] = []
        if with_cols:
            stored = set(
                self.store.read_docs(self.spark, self.sid).columns
            ) - {"seg_id", "doc_id", "dl", "fdls"}
            for c in dict.fromkeys(with_cols):
                if c not in stored:
                    raise ValueError(
                        f"with_cols: {c!r} is not a stored doc column "
                        f"(available: {sorted(stored)})"
                    )
                if not (c == "url" and with_urls):
                    extra_cols.append(c)
        # Duplicate queries are evaluated ONCE: filter trees are frozen
        # value objects, so identical normalized trees hash equal. The
        # kernel runs each distinct tree under a representative qid; the
        # per-qid results are fanned back out to every duplicate qid with
        # a tiny broadcast join at the end (the reference caches prepared
        # queries the same way — [up] core/search/filter.hpp prepared
        # reuse). Real batches repeat hot queries, so this bounds kernel
        # work by DISTINCT queries, not submitted ones.
        rep_of: dict[int, int] = {}
        reps: dict[qf.Filter, int] = {}
        for qid, t in trees.items():
            rep_of[qid] = reps.setdefault(t, qid)
        if len(reps) < len(trees):
            trees = {r: trees[r] for r in reps.values()}

        def _fan_out(df: DataFrame) -> DataFrame:
            if len(reps) == len(rep_of):
                return df
            mapping = self.spark.createDataFrame(
                [(int(q), int(r)) for q, r in rep_of.items()],
                "oqid bigint, qid bigint",
            )
            cols_ = df.columns
            return (
                df.join(F.broadcast(mapping), "qid")
                .drop("qid")
                .withColumnRenamed("oqid", "qid")
                .select(*cols_)
            )

        # --- scored-head shuffle elision (F17 lazy unscored states) ---
        # A matched-but-unscored expansion tail (weight-0 members of a flat
        # min_match=1 disjunction) can only influence the top-k when a
        # query cannot fill k positively-scored docs — the tail docs all
        # score exactly 0. So the scan SHIPS ONLY the scored heads (the
        # tail is often ~90% of the shuffled bytes: rare terms × every
        # segment), and queries whose pass-1 top-k is short or touches
        # score 0 are re-run with the full key set. This mirrors the
        # reference, which keeps unscored term states as lazy dictionary
        # handles and never materializes their postings up front
        # ([up] core/search/multiterm_query.cpp limited_sample_collector).
        dropped: set[tuple[str, str]] = set()
        tree_zero_keys: dict[int, set] = {}
        if not _ship_all and terms and k > 0:
            must_ship: set[tuple[str, str]] = set()
            zero_cand: set[tuple[str, str]] = set()
            for rq, t in trees.items():
                ft = _flatten_or_terms(t)
                if ft is None:
                    s_: set = set()
                    _walk_terms(t, s_, [], set())
                    must_ship |= s_
                    tree_zero_keys[rq] = set()
                else:
                    zk = {key for key, m in ft if m == 0.0}
                    must_ship |= {key for key, m in ft if m != 0.0}
                    zero_cand |= zk
                    tree_zero_keys[rq] = zk
            dropped = (zero_cand - must_ship) & terms
        scan_terms = terms - dropped

        term_free = any(
            not isinstance(t, qf.Empty) for t in trees.values()
        ) and not terms  # DocSet/AllDocs-only queries still need execution
        if not terms and not term_free:
            schema = "qid bigint, rank int, seg_id int, doc_id bigint, score double"
            if with_urls:
                schema = (
                    "qid bigint, rank int, seg_id int, doc_id bigint, "
                    "url string, score double"
                )
            empty = self.spark.createDataFrame([], schema)
            if extra_cols:
                dsch = {
                    f_.name: f_.dataType
                    for f_ in self.store.read_docs(self.spark, self.sid).schema
                }
                for c in extra_cols:
                    empty = empty.withColumn(c, F.lit(None).cast(dsch[c]))
            return empty

        cols = ["seg_id", "field", "term", "df", "blob", "skip", "bmax"]
        if need_pos:
            cols += ["pos_off", "pos_pay"]
        rows = (
            self._postings.filter(_keys_condition(scan_terms)).select(*cols)
            if scan_terms
            else self._postings.limit(0).select(*cols)
        )
        if scan_terms and any(key not in idf for key in scan_terms):
            # fuse the global-df stats into THIS job: a tiny per-(field,
            # term) aggregate over the same pruned scan, broadcast-joined
            # back onto the rows; the kernel derives idf from it, so no
            # separate driver stats job runs
            gdf = rows.groupBy("field", "term").agg(F.sum("df").alias("gdf"))
            rows = rows.join(F.broadcast(gdf), ["field", "term"], "left")
        kernel = _make_segment_kernel(
            trees, idf, self.avgdl_by_field, self.field_names, self.k1,
            self.b, k, need_pos, score_round, self.scorer,
            n_docs=self.n_docs,
        )
        per_seg = self._cogrouped(rows, trees, kernel)
        if tie == "url":
            if self.sort:
                # per-segment doc order is (sort_by, url), not url — the
                # kernel's (score, doc) tie-truncation could cut a tied
                # candidate that url order would keep. Use the reference
                # tie (tie="segdoc") on primary-sorted indexes.
                raise ValueError(
                    "tie='url' requires the default url docID order; this "
                    f"index is primary-sorted by {self.sort!r}"
                )
            # per-segment doc order IS url order (docIDs assigned by url
            # sort), so per-segment top-k prefixes merge exactly into the
            # global (score desc, url asc) top-k
            docs = self.store.read_docs(self.spark, self.sid).select(
                "seg_id", "doc_id", "url",
                *[c for c in extra_cols if c != "url"],
            )
            cand = docs.join(F.broadcast(per_seg), ["seg_id", "doc_id"])
            w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("url"))
            topk = cand.withColumn("rank", F.row_number().over(w)).filter(
                F.col("rank") <= k
            )
            cols_out = ["qid", "rank", "seg_id", "doc_id", "url", "score"]
            if not with_urls:
                cols_out.remove("url")
            final = _fan_out(topk.select(*cols_out, *extra_cols))
        else:
            w = Window.partitionBy("qid").orderBy(
                F.desc("score"), F.asc("seg_id"), F.asc("doc_id")
            )
            topk = (
                per_seg.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
            )
            if with_urls or extra_cols:
                url_col = ["url"] if with_urls else []
                docs = self.store.read_docs(self.spark, self.sid).select(
                    "seg_id", "doc_id", *url_col, *extra_cols
                )
                topk = docs.join(
                    F.broadcast(topk), ["seg_id", "doc_id"]
                ).select(
                    "qid", "rank", "seg_id", "doc_id", *url_col, "score",
                    *extra_cols,
                )
            else:
                topk = topk.select("qid", "rank", "seg_id", "doc_id", "score")
            final = _fan_out(topk)
        if not dropped:
            return final.orderBy("qid", "rank")
        # pass-1 ran without the unscored tails: any query that holds k
        # rows with a strictly positive k-th score is already exact (tail
        # docs score 0, strictly below); the rest re-run with everything
        # shipped, and only their rows are replaced.
        eligible = [
            qid
            for qid, rq in rep_of.items()
            if tree_zero_keys.get(rq, set()) & dropped
        ]
        if not eligible:
            return final.orderBy("qid", "rank")
        if k * len(rep_of) <= self.ELISION_COLLECT_MAX:
            # small batch: one collect of the k·|queries| pass-1 rows and
            # a driver-side merge (single job, no persist bookkeeping)
            pass1 = final.collect()
            by_q: dict[int, list] = {}
            for r in pass1:
                by_q.setdefault(r["qid"], []).append(r)
            triggered = [
                qid
                for qid in eligible
                if len(by_q.get(qid, [])) < k
                or min(r["score"] for r in by_q[qid]) <= 0.0
            ]
            if triggered:
                full = self.search_batch(
                    {qid: queries[qid] for qid in triggered},
                    k=k,
                    with_urls=with_urls,
                    tie=tie,
                    score_round=score_round,
                    with_cols=tuple(extra_cols),
                    _ship_all=True,
                ).collect()
                for qid in triggered:
                    by_q.pop(qid, None)
                pass1 = [r for rs in by_q.values() for r in rs] + list(full)
            out = self.spark.createDataFrame(pass1, schema=final.schema)
            return out.orderBy("qid", "rank")
        # large batch: the k·|queries| materialization would be unbounded
        # driver memory, so the trigger check collects only ONE row per
        # ELIGIBLE query (count + min score) and the merge stays a
        # DataFrame union — pass-1 rows never land on the driver.
        if self._elision_persisted is not None:
            self._elision_persisted.unpersist(blocking=False)
        finalp = final.persist()
        self._elision_persisted = finalp
        stats = (
            finalp.filter(F.col("qid").isin(eligible))
            .groupBy("qid")
            .agg(F.count("*").alias("n"), F.min("score").alias("mn"))
            .collect()
        )
        have = {int(r["qid"]): r for r in stats}
        triggered = [
            qid
            for qid in eligible
            if qid not in have
            or int(have[qid]["n"]) < k
            or float(have[qid]["mn"]) <= 0.0
        ]
        if not triggered:
            return finalp.orderBy("qid", "rank")
        full = self.search_batch(
            {qid: queries[qid] for qid in triggered},
            k=k,
            with_urls=with_urls,
            tie=tie,
            score_round=score_round,
            with_cols=tuple(extra_cols),
            _ship_all=True,
        )
        out = finalp.filter(~F.col("qid").isin(triggered)).unionByName(full)
        return out.orderBy("qid", "rank")

    def search(
        self,
        flt: qf.Filter,
        k: int = 10,
        with_urls: bool = True,
        with_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        return self.search_batch(
            {0: flt}, k=k, with_urls=with_urls, with_cols=with_cols
        ).drop("qid")

    def occurrences(self, term: str, field: str = "text") -> DataFrame:
        """Every occurrence of one term as (seg_id, doc_id, pos, start,
        length, payload) — the A8 attribute surface ([up] core/analysis/
        token_attributes.hpp :: offset + payload) for highlighting /
        surface-form recovery. start/length are -1 and payload null when
        the field was indexed without the corresponding feature.
        Distributed: posting rows explode inside mapInArrow; no driver
        materialization."""
        return self._occurrences_df([(field, term)]).drop("field", "term")

    def _occurrences_df(self, keys) -> DataFrame:
        """Decoded occurrence rows (seg_id, doc_id, field, term, pos,
        start, length, payload) for a SET of (field, term) keys — the
        shared kernel behind occurrences() and highlights(). The postings
        scan is pushdown-pruned to the requested keys (one isin per
        field), so cost is O(matched posting rows), never a corpus scan."""
        cols = [
            "seg_id", "field", "term", "blob", "pos_off", "pos_pay",
            "span_off", "span_pay",
        ]
        has_pay_cols = "pay_pay" in self._postings.columns
        if has_pay_cols:
            cols += ["pay_off", "pay_pay"]
        rows = self._postings.filter(
            _keys_condition(sorted(set(keys)))
        ).select(*cols)

        def explode(batches):
            import pyarrow as pa

            from iresearch_spark.codec.postings import decode_values_for

            for b in batches:
                pdf = b.to_pandas()
                for r in pdf.itertuples():
                    pl = decode_postings(bytes(r.blob))
                    docs = pl.doc_ids.astype(np.int64)
                    tfs = pl.tfs.astype(np.int64)
                    sel = np.arange(len(docs))
                    pls = decode_positions_for(
                        bytes(r.pos_off), bytes(r.pos_pay), sel, tfs
                    )
                    pos_flat = (
                        np.concatenate(pls) if pls else np.empty(0, np.int64)
                    )
                    doc_rep = np.repeat(docs, tfs)
                    payloads = None
                    if r.span_pay is not None and len(r.span_pay):
                        sp = decode_values_for(
                            bytes(r.span_off), bytes(r.span_pay), sel, tfs * 2
                        )
                        starts, lens_ = sp[0::2], sp[1::2]
                        r_pay = getattr(r, "pay_pay", None)
                        if r_pay is not None and len(r_pay):
                            # per-doc char counts = sum of its span lengths
                            c = (
                                np.add.reduceat(
                                    lens_.astype(np.int64),
                                    np.cumsum(tfs) - tfs,
                                )
                                if len(tfs)
                                else np.empty(0, np.int64)
                            )
                            chars = decode_values_for(
                                bytes(r.pay_off), bytes(r_pay), sel, c
                            )
                            # one utf-32 decode, then slice per occurrence
                            big = (
                                chars.astype("<u4").tobytes().decode("utf-32-le")
                            )
                            offs = np.concatenate(
                                ([0], np.cumsum(lens_.astype(np.int64)))
                            )
                            payloads = [
                                big[offs[i] : offs[i + 1]]
                                for i in range(len(doc_rep))
                            ]
                    else:
                        starts = np.full(len(doc_rep), -1, dtype=np.int64)
                        lens_ = starts
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(
                                np.full(len(doc_rep), r.seg_id, dtype=np.int32)
                            ),
                            pa.array(doc_rep),
                            pa.array([r.field] * len(doc_rep), pa.string()),
                            pa.array([r.term] * len(doc_rep), pa.string()),
                            pa.array(pos_flat.astype(np.int32)),
                            pa.array(starts.astype(np.int32)),
                            pa.array(lens_.astype(np.int32)),
                            (
                                pa.array(payloads, pa.string())
                                if payloads is not None
                                else pa.nulls(len(doc_rep), pa.string())
                            ),
                        ],
                        names=[
                            "seg_id", "doc_id", "field", "term", "pos",
                            "start", "length", "payload",
                        ],
                    )

        return rows.mapInArrow(
            explode,
            "seg_id int, doc_id bigint, field string, term string, "
            "pos int, start int, length int, payload string",
        )

    def highlights(
        self,
        flt: qf.Filter,
        k: int = 10,
        field: str = "text",
        source_col: str | None = None,
        context: int = 24,
        max_spans: int = 8,
        tie: str = "segdoc",
        score_round: int | None = None,
    ) -> DataFrame:
        """Top-k with match highlighting: each hit row carries the query's
        matched-term character spans (A8 offsets the field was indexed
        with — [up] core/analysis/token_attributes.hpp :: offset; the
        ArangoSearch OFFSET_INFO surface) and, when `source_col` names a
        stored doc column, a `snippet` of ±context chars around the first
        match read from the columnstore.

        Cost shape: the normal top-k job + ONE pushdown-pruned postings
        scan over the query's RESOLVED terms (expansions included),
        joined to the broadcast k-row hit set — work is O(query-term
        posting rows), never a corpus scan, so the plan is
        scale-invariant in the corpus size.

        Returns (rank, seg_id, doc_id, url, score, n_matches, spans
        [, snippet]): spans = array<struct<start,length>> sorted by start
        (capped at max_spans; empty when the field lacks the offsets
        feature), n_matches = total occurrences of the matched terms in
        the hit doc's `field`."""
        trees, terms, _idf, _ = self.prepare({0: flt})
        # every resolved scoring key on the requested field, plus
        # positional slot keys (phrases / same-position)
        t2: set[tuple[str, str]] = set()
        phrases: list = []
        pos_keys: set[tuple[str, str]] = set()
        for t in trees.values():
            _walk_terms(t, t2, phrases, pos_keys)
        keys = sorted({kk for kk in (t2 | pos_keys) if kk[0] == field})
        with_cols = (source_col,) if source_col else ()
        hits = self.search_batch(
            {0: flt}, k=k, with_urls=True, tie=tie,
            score_round=score_round, with_cols=with_cols,
        ).drop("qid")
        if not keys:
            out = hits.withColumn("n_matches", F.lit(0)).withColumn(
                "spans",
                F.lit(None).cast("array<struct<start:int,length:int>>"),
            )
        else:
            occ = self._occurrences_df(keys)
            spans = (
                occ.join(
                    F.broadcast(hits.select("seg_id", "doc_id").distinct()),
                    ["seg_id", "doc_id"],
                )
                .groupBy("seg_id", "doc_id")
                .agg(
                    F.count("*").cast("int").alias("n_matches"),
                    F.slice(
                        F.sort_array(
                            F.collect_list(
                                F.when(
                                    F.col("start") >= 0,
                                    F.struct("start", "length"),
                                )
                            )
                        ),
                        1,
                        max_spans,
                    ).alias("spans"),
                )
            )
            out = hits.join(spans, ["seg_id", "doc_id"], "left")
        out = out.withColumn(
            "n_matches", F.coalesce(F.col("n_matches"), F.lit(0))
        ).withColumn(
            "spans",
            F.coalesce(
                F.col("spans"),
                F.lit(None).cast("array<struct<start:int,length:int>>"),
            ),
        )
        base = ["rank", "seg_id", "doc_id", "url", "score", "n_matches",
                "spans"]
        if source_col:
            # F.get is null-safe out of bounds (no ANSI error on empty)
            first = F.get("spans", 0)
            # window = [start-context, start+length+context), clipped at
            # the string head (no compensation on the other side)
            snip_from = F.greatest(
                F.lit(1), first["start"] + 1 - F.lit(context)
            )
            snip_len = (
                first["start"] + first["length"] + F.lit(1 + context)
                - snip_from
            )
            out = out.withColumn(
                "snippet",
                F.when(
                    F.size("spans") > 0,
                    F.col(source_col).substr(snip_from, snip_len),
                ),
            )
            base.append("snippet")
        return out.select(*base).orderBy("rank")

    def sorted_topk(self, flt: qf.Filter, k: int = 10) -> DataFrame:
        """First k matching docs in INDEX order — url order by default,
        the primary-sort order (sort_by expr, url) for a sorted index —
        WITHOUT any scoring work ([up] core/index/comparer.hpp index
        sort; the sorted-index early-termination read ArangoSearch's
        primarySort optimization performs). Per segment, ascending docID
        IS index order, so the per-segment head-k (a JVM window over the
        match set) already contains every global candidate; the global
        merge then orders ≤ k·n_segments rows by the STORED sort columns.
        Returns (seg_id, doc_id, url, warc_ts, lang) rows, k of them."""
        matched = self.match_docs(flt)
        w = Window.partitionBy("seg_id").orderBy("doc_id")
        heads = (
            matched.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        docs = self.store.read_docs(self.spark, self.sid).select(
            "seg_id", "doc_id", "url", "warc_ts", "lang"
        )
        cand = docs.join(F.broadcast(heads), ["seg_id", "doc_id"])
        order = (
            [F.expr(self.sort).asc(), F.col("url").asc()]
            if self.sort
            else [F.col("url").asc()]
        )
        return cand.orderBy(*order).limit(k)

    def sort_by_topk(
        self,
        flt: qf.Filter,
        by: str,
        k: int = 10,
        ascending: bool = True,
    ) -> DataFrame:
        """Query-time attribute sort: the top-k MATCHING docs ordered by a
        stored doc column (built-in url/warc_ts/lang or a stored_cols
        user column) — the `SEARCH … SORT doc.attr LIMIT k` surface for
        indexes WITHOUT a primary sort on that attribute (recency sort,
        price sort). Scoring machinery is skipped entirely: the match-only
        kernel feeds a (seg_id, doc_id) equijoin with the docs table.

        Scale shape: the global top-k by any total order is contained in
        the union of per-segment top-k's by the same order, so a
        per-segment window prunes the candidate set to ≤ k·n_segments
        rows before the (tiny) global sort — the sorted_topk plan, with
        the stored column instead of index order. Nulls sort last at
        both widths; ties break by url ascending.

        Returns (rank, seg_id, doc_id, url, <by>)."""
        docs = self.store.read_docs(self.spark, self.sid)
        if by not in docs.columns or by in ("seg_id", "doc_id", "fdls"):
            raise ValueError(
                f"sort_by_topk: {by!r} is not a stored doc column "
                f"(available: "
                f"{sorted(set(docs.columns) - {'seg_id', 'doc_id', 'fdls'})})"
            )
        key = (
            F.col(by).asc_nulls_last()
            if ascending
            else F.col(by).desc_nulls_last()
        )
        order = [key, F.col("url").asc()]
        matched = self.match_docs(flt)
        sel = ["seg_id", "doc_id", "url"] + ([by] if by != "url" else [])
        cand = docs.select(*sel).join(matched, ["seg_id", "doc_id"])
        w = Window.partitionBy("seg_id").orderBy(*order)
        heads = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        wg = Window.orderBy(*order)
        return (
            heads.withColumn("rank", F.row_number().over(wg).cast("int"))
            .filter(F.col("rank") <= k)
            .select("rank", *sel)
            .orderBy("rank")
        )

    def range_facets(
        self,
        flt: qf.Filter,
        col: str,
        ranges: list[tuple[float | None, float | None]],
    ) -> DataFrame:
        """Range facets over the FULL match set (the ES/OpenSearch range
        aggregation): for each [lo, hi) interval over a stored numeric
        doc column — None = open end; intervals may overlap — count the
        matching docs inside it. One pass: the facets() join shape
        (match-only kernel + docs equijoin) aggregated to a single row
        of per-range conditional counts with map-side partial combine,
        then unpivoted to one row per range. Empty ranges are returned
        with n_docs = 0, so the output schema/rows depend only on the
        request, never on the data.

        Returns (bucket, lo, hi, n_docs) ordered by bucket."""
        docs = self.store.read_docs(self.spark, self.sid)
        if col not in docs.columns or col in ("seg_id", "doc_id", "fdls"):
            raise ValueError(f"range_facets: {col!r} is not a stored doc column")
        if not ranges:
            raise ValueError("range_facets: ranges must be non-empty")
        matched = self.match_docs(flt)
        joined = docs.select("seg_id", "doc_id", col).join(
            matched, ["seg_id", "doc_id"]
        )
        v = F.col(col).cast("double")
        aggs = []
        for i, (lo, hi) in enumerate(ranges):
            cond = v.isNotNull()
            if lo is not None:
                cond = cond & (v >= float(lo))
            if hi is not None:
                cond = cond & (v < float(hi))
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0))
                .cast("long")
                .alias(f"_r{i}")
            )
        row = joined.agg(*aggs)
        # unpivot the one aggregated row with stack() so every range rides
        # the SAME aggregate subtree — a per-range unionAll would reference
        # the full match+join+agg plan once per range and lean on exchange
        # reuse to stay "one pass"
        stack_args = ", ".join(
            f"CAST({i} AS INT), COALESCE(_r{i}, 0L)" for i in range(len(ranges))
        )
        los = F.array(
            *[
                F.lit(None if lo is None else float(lo)).cast("double")
                for lo, _ in ranges
            ]
        )
        his = F.array(
            *[
                F.lit(None if hi is None else float(hi)).cast("double")
                for _, hi in ranges
            ]
        )
        return (
            row.selectExpr(
                f"stack({len(ranges)}, {stack_args}) AS (bucket, n_docs)"
            )
            .select(
                "bucket",
                F.element_at(los, F.col("bucket") + 1).alias("lo"),
                F.element_at(his, F.col("bucket") + 1).alias("hi"),
                F.col("n_docs").cast("long").alias("n_docs"),
            )
            .orderBy("bucket")
        )

    def histogram_facets(
        self,
        flt: qf.Filter,
        col: str,
        interval: float,
        origin: float = 0.0,
    ) -> DataFrame:
        """Fixed-interval histogram over the FULL match set (the
        ES/OpenSearch histogram / date_histogram aggregation): bucket =
        floor((value − origin) / interval), one row per NON-EMPTY bucket
        with its inclusive lower bound — unlike range_facets the request
        doesn't enumerate buckets, so output rows follow the data.
        One facets()-shaped pass: match-only kernel + docs equijoin +
        map-side-combined groupBy on the computed bucket — shuffle is one
        row per matched doc at (bucket) width, any corpus size.

        Returns (bucket long, lo double, n_docs long) ordered by bucket;
        null values are dropped (ES's missing-bucket semantics without a
        missing parameter)."""
        if interval <= 0:
            raise ValueError("histogram_facets: interval must be > 0")
        docs = self.store.read_docs(self.spark, self.sid)
        if col not in docs.columns or col in ("seg_id", "doc_id", "fdls"):
            raise ValueError(
                f"histogram_facets: {col!r} is not a stored doc column"
            )
        matched = self.match_docs(flt)
        v = F.col(col).cast("double")
        bucket = F.floor((v - F.lit(float(origin))) / F.lit(float(interval)))
        return (
            docs.select("seg_id", "doc_id", col)
            .join(matched, ["seg_id", "doc_id"])
            .filter(v.isNotNull())
            .groupBy(bucket.cast("long").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            .select(
                "bucket",
                (
                    F.col("bucket") * F.lit(float(interval))
                    + F.lit(float(origin))
                ).alias("lo"),
                "n_docs",
            )
            .orderBy("bucket")
        )

    def facets(
        self,
        flt: qf.Filter,
        group_by: tuple[str, ...] = ("lang",),
        aggs: dict[str, "F.Column"] | None = None,
    ) -> DataFrame:
        """Faceted aggregation over the FULL match set — the ArangoSearch
        `SEARCH ... COLLECT` surface over a view: group every doc the
        filter matches (not just a top-k head) by stored doc columns
        (built-ins url/warc_ts/lang or user stored_cols) and aggregate.
        Default aggs: n_docs (count) + sum_dl (token mass).

        Scale shape: match_docs is the match-only kernel (no scoring, no
        global window, WAND machinery skipped); the docs join is a
        (seg_id, doc_id) hash equijoin between two distributed tables and
        the groupBy aggregates with map-side partial combine, so shuffle
        volume is one row per matched doc narrowed to the group/agg
        columns — no corpus collect, no rank cap. A filter matching the
        whole corpus costs one pruned postings scan + one docs-table
        pass, the same plan at any corpus size."""
        if aggs is None:
            aggs = {
                "n_docs": F.count(F.lit(1)).cast("long"),
                "sum_dl": F.sum("dl").cast("long"),
            }
        matched = self.match_docs(flt)
        docs = self.store.read_docs(self.spark, self.sid)
        missing = [c for c in group_by if c not in docs.columns]
        if missing:
            raise ValueError(
                f"facets: {missing} are not stored doc columns "
                f"(available: {sorted(set(docs.columns) - {'seg_id', 'doc_id'})})"
            )
        joined = docs.join(matched, ["seg_id", "doc_id"])
        return (
            joined.groupBy(*group_by)
            .agg(*[expr.alias(n) for n, expr in aggs.items()])
            .orderBy(*group_by)
        )

    def grouped_topk(
        self,
        flt: qf.Filter,
        group_col: str,
        k: int = 10,
        per_group: int = 1,
        score_round: int | None = None,
    ) -> DataFrame:
        """Field collapsing (Lucene grouping / the collapse clause search
        UIs use): the global top-k with at most `per_group` hits per
        `group_col` value (a stored doc column — built-in or
        stored_cols). EXACT, not a deep-head heuristic: collapse is an
        aggregation over the match set, so the kernel runs with WAND/
        top-k truncation OFF (scored_all) and every matching doc's score
        ships to the group window. Cost is the match-set size at
        (group, score) width — the same shape as facets() plus scores —
        then two row_number windows: per (qid, group) keyed by the hash
        shuffle on group_col, and a tiny global one over the <=
        |groups|·per_group survivors. Ties: (score desc, url asc), so
        results are parallelism- and oracle-reproducible.

        Returns (rank, seg_id, doc_id, url, <group_col>, score)."""
        if self.sort:
            raise ValueError(
                "grouped_topk ties by url and requires the default url "
                f"docID order; this index is primary-sorted by {self.sort!r}"
            )
        trees, terms, idf, need_pos = self.prepare({0: flt})
        if all(isinstance(t, qf.Empty) for t in trees.values()):
            return self.spark.createDataFrame(
                [],
                "rank int, seg_id int, doc_id bigint, url string, "
                f"{group_col} string, score double",
            )
        cols = ["seg_id", "field", "term", "df", "blob", "skip", "bmax"]
        if need_pos:
            cols += ["pos_off", "pos_pay"]
        rows = (
            self._postings.filter(_keys_condition(terms)).select(*cols)
            if terms
            else self._postings.limit(0).select(*cols)
        )
        if terms and any(key not in idf for key in terms):
            gdf = rows.groupBy("field", "term").agg(F.sum("df").alias("gdf"))
            rows = rows.join(F.broadcast(gdf), ["field", "term"], "left")
        kernel = _make_segment_kernel(
            trees, idf, self.avgdl_by_field, self.field_names, self.k1,
            self.b, 0, need_pos, score_round, self.scorer,
            n_docs=self.n_docs, scored_all=True,
        )
        per_seg = self._cogrouped(rows, trees, kernel)
        docs = self.store.read_docs(self.spark, self.sid).select(
            "seg_id", "doc_id", "url",
            *([group_col] if group_col != "url" else []),
        )
        cand = docs.join(per_seg, ["seg_id", "doc_id"])
        wg = Window.partitionBy("qid", group_col).orderBy(
            F.desc("score"), F.asc("url")
        )
        survivors = cand.withColumn(
            "grp_rank", F.row_number().over(wg)
        ).filter(F.col("grp_rank") <= per_group)
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("url"))
        return (
            survivors.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("rank", "seg_id", "doc_id", "url", group_col, "score")
            .orderBy("rank")
        )

    def search_page(
        self, flt: qf.Filter, k: int = 10, offset: int = 0, **kw
    ) -> DataFrame:
        """Deep pagination: ranks (offset, offset+k] of the global top-k,
        re-ranked 1..k. Cost model is the honest one every distributed
        engine has (Lucene searchAfter / ES from+size): each segment must
        surface its top (offset+k) candidates, so page depth — not page
        size — drives the per-segment work and the (offset+k)·n_segments
        global merge. Kwargs pass through to search_batch (tie,
        score_round, with_cols, ...)."""
        if offset < 0:
            raise ValueError("offset must be >= 0")
        res = self.search_batch({0: flt}, k=k + offset, **kw)
        return (
            res.filter(F.col("rank") > offset)
            .withColumn("rank", (F.col("rank") - offset).cast("int"))
        )

    def search_after(
        self,
        flt: qf.Filter,
        k: int = 10,
        after: tuple[float, str] | None = None,
        score_round: int | None = 6,
    ) -> DataFrame:
        """Cursor pagination (Lucene searchAfter / ES search_after): the
        next k hits strictly after the cursor `after` = (score, url) in
        the global (score desc, url asc) order — the scalable deep-read
        path. Unlike search_page, whose per-segment work grows with page
        DEPTH (offset+k candidates each), the cursor page's cost is the
        match set at (score, url) width regardless of how deep the scroll
        is: the kernel runs in scored_all mode (WAND/top-k truncation
        off — a segment's k-th doc after an arbitrary cursor can lie
        below any precomputed head), every matching doc's score joins
        the url column, the cursor filter cuts everything at-or-before,
        and a per-segment head-k window prunes to ≤ k·n_segments rows
        before the tiny global sort.

        Scores compare ROUNDED (score_round, default 6 — the rank
        determinism contract), so a cursor taken from one page's last row
        is stable across re-execution. Ranks are 1..k within the page.
        Requires the default url docID order (like tie="url").

        Returns (rank, seg_id, doc_id, url, score)."""
        if self.sort:
            raise ValueError(
                "search_after cursors on (score, url) and requires the "
                f"default url docID order; this index is primary-sorted "
                f"by {self.sort!r}"
            )
        trees, terms, idf, need_pos = self.prepare({0: flt})
        schema = "rank int, seg_id int, doc_id bigint, url string, score double"
        if all(isinstance(t, qf.Empty) for t in trees.values()):
            return self.spark.createDataFrame([], schema)
        cols = ["seg_id", "field", "term", "df", "blob", "skip", "bmax"]
        if need_pos:
            cols += ["pos_off", "pos_pay"]
        rows = (
            self._postings.filter(_keys_condition(terms)).select(*cols)
            if terms
            else self._postings.limit(0).select(*cols)
        )
        if terms and any(key not in idf for key in terms):
            gdf = rows.groupBy("field", "term").agg(F.sum("df").alias("gdf"))
            rows = rows.join(F.broadcast(gdf), ["field", "term"], "left")
        kernel = _make_segment_kernel(
            trees, idf, self.avgdl_by_field, self.field_names, self.k1,
            self.b, 0, need_pos, score_round, self.scorer,
            n_docs=self.n_docs, scored_all=True,
        )
        per_seg = self._cogrouped(rows, trees, kernel)
        docs = self.store.read_docs(self.spark, self.sid).select(
            "seg_id", "doc_id", "url"
        )
        cand = docs.join(per_seg, ["seg_id", "doc_id"])
        if after is not None:
            s0, u0 = float(after[0]), str(after[1])
            cand = cand.filter(
                (F.col("score") < s0)
                | ((F.col("score") == s0) & (F.col("url") > u0))
            )
        order = [F.desc("score"), F.asc("url")]
        wseg = Window.partitionBy("seg_id").orderBy(*order)
        heads = (
            cand.withColumn("_rn", F.row_number().over(wseg))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        w = Window.orderBy(*order)
        return (
            heads.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("rank", "seg_id", "doc_id", "url", "score")
            .orderBy("rank")
        )

    def count_docs(self, flt: qf.Filter) -> int:
        """Total-hits count: |match set| via the match-only kernel — no
        scoring, no window, no top-k cap; the aggregation is a metrics-
        only job (count of the distributed match DataFrame)."""
        return self.match_docs(flt).count()

    def suggest(
        self, prefix: str, k: int = 10, field: str = "text"
    ) -> DataFrame:
        """Prefix autocomplete over the S7 term dictionary: the top-k
        completions of `prefix` by (global df desc, term asc) — the
        classic suggester the reference serves from its FST by walking
        the prefix's subtree with term frequencies. Here it is one
        filter over the searcher's materialized O(vocabulary) dictionary
        (pushdown startswith) + a k-row global sort; no postings decode,
        no corpus scan. Returns (term, df)."""
        d = self._term_dict().filter(
            (F.col("field") == field) & F.col("term").startswith(prefix)
        )
        return (
            d.select("term", F.col("df").cast("long").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(k)
        )

    def _term_doc_tfs(self, keys) -> DataFrame:
        """Decoded (seg_id, doc_id, field, term, tf) rows for a set of
        (field, term) keys: pushdown-pruned postings scan + docID/tf blob
        decode inside mapInArrow — no positions, no driver
        materialization; cost is O(posting rows of the keys)."""
        rows = self._postings.filter(
            _keys_condition(sorted(set(keys)))
        ).select("seg_id", "field", "term", "blob")

        def explode(batches):
            import pyarrow as pa

            for bt in batches:
                pdf = bt.to_pandas()
                for r in pdf.itertuples():
                    pl = decode_postings(bytes(r.blob))
                    n = len(pl.doc_ids)
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(np.full(n, r.seg_id, dtype=np.int32)),
                            pa.array(pl.doc_ids.astype(np.int64)),
                            pa.array([r.field] * n, pa.string()),
                            pa.array([r.term] * n, pa.string()),
                            pa.array(pl.tfs.astype(np.int64)),
                        ],
                        names=["seg_id", "doc_id", "field", "term", "tf"],
                    )

        return rows.mapInArrow(
            explode,
            "seg_id int, doc_id bigint, field string, term string, tf bigint",
        )

    def explain_score(
        self,
        flt: qf.Filter,
        k: int = 10,
        tie: str = "segdoc",
        score_round: int | None = None,
    ) -> DataFrame:
        """Lucene-style score Explanation for the top-k hits: one row per
        (hit, contributing term) carrying tf, global df, idf, the term's
        composed weight (path boosts × expansion weight — 0.0 for F17's
        matched-but-unscored expansion tail) and its additive score
        contribution. The decomposition is exact in float64 — the
        kernel's scorers are per-term additive — but each DISPLAYED
        contribution is rounded independently (to `score_round` digits,
        default 6, matching the default hit-score rounding), so the sum
        of displayed contributions can differ from the displayed score
        by up to n_terms · 0.5 · 10^-score_round.

        Supported shapes: term-decomposable trees — Term/Terms leaves
        under And / Or(min_match), an optional root-level Not; multiterm
        filters (prefix/range/wildcard/regexp/fuzzy) work because prepare
        rewrites them to weighted Terms. And nested under Or is refused:
        a partially-matched inner conjunction contributes nothing in the
        kernel, so flat per-term attribution would lie.

        Cost shape (the highlights() shape): the normal top-k job + ONE
        pruned postings scan over the query's resolved keys joined to the
        broadcast k-row hit set + broadcast df/weight joins — O(query-term
        posting rows), corpus-size-invariant.

        Returns (rank, seg_id, doc_id, url, field, term, tf, df, weight,
        contribution, score) ordered by (rank, field, term)."""
        schema = (
            "rank int, seg_id int, doc_id bigint, url string, field string,"
            " term string, tf bigint, df bigint, weight double,"
            " contribution double, score double"
        )
        trees, _terms, _idf, _need_pos = self.prepare({0: flt})
        node = trees[0]
        if isinstance(node, qf.Not):
            node = node.child  # hits already exclude; excluded adds no score
        if isinstance(node, qf.Empty):
            return self.spark.createDataFrame([], schema)
        weights: dict[tuple[str, str], float] = {}

        def leaf(n: qf.Filter, mult: float) -> None:
            if isinstance(n, qf.Term):
                key = (n.field, n.term)
                weights[key] = weights.get(key, 0.0) + mult * n.boost
            elif isinstance(n, qf.Terms):
                w_by_t = dict(zip(n.terms, n.weights))
                for t in sorted(w_by_t):
                    key = (n.field, t)
                    weights[key] = (
                        weights.get(key, 0.0) + mult * n.boost * w_by_t[t]
                    )
            elif isinstance(n, qf.Or):
                for c in n.children:
                    leaf(c, mult * n.boost)
            else:
                raise ValueError(
                    f"explain_score: {type(n).__name__} has no exact "
                    "per-term attribution (positional/constant-score "
                    "nodes and And-under-Or are not term-decomposable)"
                )

        if isinstance(node, qf.And):
            for c in node.children:
                leaf(c, node.boost)
        else:
            leaf(node, 1.0)

        hits = self.search_batch(
            {0: flt}, k=k, with_urls=True, tie=tie, score_round=score_round
        ).drop("qid")
        keys = sorted(weights)
        wdf = self.spark.createDataFrame(
            [(f, t, float(w)) for (f, t), w in sorted(weights.items())],
            "field string, term string, weight double",
        )
        gdf = (
            self._postings.filter(_keys_condition(keys))
            .groupBy("field", "term")
            .agg(F.sum("df").cast("long").alias("df"))
        )
        docs = self.store.read_docs(self.spark, self.sid).select(
            "seg_id", "doc_id", "fdls"
        )
        joined = (
            self._term_doc_tfs(keys)
            .join(
                F.broadcast(
                    hits.select("rank", "seg_id", "doc_id", "url", "score")
                ),
                ["seg_id", "doc_id"],
            )
            .join(F.broadcast(wdf), ["field", "term"])
            .join(F.broadcast(gdf), ["field", "term"])
            .join(docs, ["seg_id", "doc_id"])
        )
        # per-row stats of the LEAF's field: dl from the doc's per-field
        # length vector, avgdl from the snapshot stats — exactly what the
        # scoring kernel uses (eval_node's Term arm)
        fmap = F.map_from_arrays(
            F.array(*[F.lit(f) for f in self.field_names]),
            F.col("fdls").cast("array<double>"),
        )
        amap = F.create_map(
            *[
                x
                for f, a in sorted(self.avgdl_by_field.items())
                for x in (F.lit(f), F.lit(float(a) or 1.0))
            ]
        )
        dl = F.element_at(fmap, F.col("field"))
        avgdl = F.element_at(amap, F.col("field"))
        n = float(self.n_docs)
        dfc = F.col("df").cast("double")
        tfc = F.col("tf").cast("double")
        if self.scorer == "tfidf":
            idf = F.lit(1.0) + F.log(F.lit(n) / (dfc + F.lit(1.0)))
            tfn = F.sqrt(tfc) / F.sqrt(dl)
        else:
            idf = F.log(
                F.lit(1.0)
                + (F.lit(n) - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
            )
            tfn = (tfc * F.lit(self.k1 + 1.0)) / (
                tfc
                + F.lit(self.k1)
                * (F.lit(1.0 - self.b) + F.lit(self.b) * dl / avgdl)
            )
        return (
            joined.withColumn(
                "contribution",
                F.round(
                    F.col("weight") * idf * tfn,
                    score_round if score_round is not None else 6,
                ),
            )
            .select(
                "rank", "seg_id", "doc_id", "url", "field", "term", "tf",
                "df", "weight", "contribution", "score",
            )
            .orderBy("rank", "field", "term")
        )

    def more_like_this(
        self,
        url: str,
        k: int = 10,
        max_query_terms: int = 10,
        field: str = "text",
        source_col: str = "text",
        min_tf: int = 1,
        min_df: int = 1,
        tie: str = "segdoc",
        score_round: int | None = None,
    ) -> DataFrame:
        """Lucene MoreLikeThis: find the docs most similar to a seed doc
        by turning its most interesting terms into a disjunction query.

        The seed's `source_col` stored value (a one-row pruned
        columnstore read) is re-analyzed with the FIELD's frozen
        analyzer; candidate terms keep tf ≥ min_tf, their global df comes
        from one pushdown-pruned term-dictionary scan (isin over the
        seed's vocabulary — O(doc vocab), never a corpus scan), and the
        top max_query_terms by interestingness — round(tf·idf, 6) desc,
        term asc, Lucene MLT's default ranking — become an unboosted
        Or which runs through the normal BM25 top-k machinery. The seed
        itself is excluded and ranks recomputed 1..k.

        Returns search_batch's row shape (rank, seg_id, doc_id, score,
        url) minus qid."""
        docs = self.store.read_docs(self.spark, self.sid)
        if source_col not in docs.columns:
            raise ValueError(
                f"more_like_this needs the stored column {source_col!r} "
                "(build the index with stored_cols including it)"
            )
        seed = docs.filter(F.col("url") == url).select(
            "seg_id", "doc_id", source_col
        ).collect()
        if not seed:
            raise ValueError(f"more_like_this: no doc with url {url!r}")
        seed_seg, seed_doc = int(seed[0]["seg_id"]), int(seed[0]["doc_id"])
        spec = next(
            (
                d["analyzer"]
                for d in self.store.fields(self.sid)
                if d["name"] == field
            ),
            None,
        )
        if spec is None:
            raise ValueError(f"more_like_this: unknown field {field!r}")
        from collections import Counter

        from iresearch_spark.analysis.analyzers import analyze_one

        tf = Counter(t for t, _p in analyze_one(seed[0][source_col], spec))
        cand = sorted(t for t, c in tf.items() if c >= min_tf)
        if not cand:
            return self.spark.createDataFrame(
                [], "rank int, seg_id int, doc_id bigint, score double,"
                " url string"
            )
        df_rows = (
            self._term_dict()
            .filter((F.col("field") == field) & F.col("term").isin(cand))
            .select("term", "df")
            .collect()
        )
        dfs = {r["term"]: int(r["df"]) for r in df_rows}
        scored = sorted(
            (
                (-round(tf[t] * self.idf(dfs[t]), 6), t)
                for t in cand
                if dfs.get(t, 0) >= min_df
            ),
        )
        top = [t for _m, t in scored[:max_query_terms]]
        if not top:
            return self.spark.createDataFrame(
                [], "rank int, seg_id int, doc_id bigint, score double,"
                " url string"
            )
        res = self.search_batch(
            {0: qf.Terms(top, field=field)},
            k=k + 1,
            with_urls=True,
            tie=tie,
            score_round=score_round,
        ).drop("qid")
        survivors = res.filter(
            ~((F.col("seg_id") == seed_seg) & (F.col("doc_id") == seed_doc))
        )
        order = (
            [F.desc("score"), F.asc("url")]
            if tie == "url"
            else [F.desc("score"), F.asc("seg_id"), F.asc("doc_id")]
        )
        w = Window.orderBy(*order)
        return (
            survivors.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .orderBy("rank")
        )

    def match_docs(self, flt: qf.Filter) -> DataFrame:
        """Match-only execution: every (seg_id, doc_id) the filter matches,
        straight from the per-segment kernel — no scoring pass, no
        row_number window, no global sort. This is the path maintenance
        operations (delete-by-query, cached-filter materialization) use;
        ranking machinery on an unranked match set is a scale hazard
        (a delete can match most of the corpus)."""
        trees, terms, idf, need_pos = self.prepare({0: flt})
        if all(isinstance(t, qf.Empty) for t in trees.values()):
            return self.spark.createDataFrame([], "seg_id int, doc_id bigint")
        cols = ["seg_id", "field", "term", "df", "blob", "skip", "bmax"]
        if need_pos:
            cols += ["pos_off", "pos_pay"]
        rows = (
            self._postings.filter(_keys_condition(terms)).select(*cols)
            if terms
            else self._postings.limit(0).select(*cols)
        )
        kernel = _make_segment_kernel(
            trees, idf, self.avgdl_by_field, self.field_names, self.k1,
            self.b, 0, need_pos, None, self.scorer, match_only=True,
        )
        return self._cogrouped(rows, trees, kernel).select("seg_id", "doc_id")


# ------------------------------------------------------------------ kernel


def _make_segment_kernel(
    trees, idf, avgdl_by_field, field_names, k1, b, k, need_pos,
    score_round=None, scorer="bm25", match_only=False, n_docs=0,
    scored_all=False,
):
    """Per-segment scoring kernel (runs in applyInPandas cogroup).

    Decodes each needed (field, term, seg) posting list once, evaluates
    every query tree with float64 numpy in the frozen association order,
    and returns the per-segment top-k per query. Norms arrive as one row
    per (segment, field) — per-field dl arrays and avgdl, the reference's
    per-field norm columns. With `match_only` the WAND fast paths and the
    top-k truncation are skipped and EVERY matching doc is emitted (score
    column carries 0.0).

    `idf` holds the driver-resolved entries (expansion-cached terms plus
    Phrase/SamePosition slot keys); any other key's idf is derived here
    from the fused `gdf` (global df) column riding the posting rows, with
    `n_docs` the snapshot's global document count — identical math to
    IndexSearcher.idf, just evaluated executor-side so a plain query needs
    no separate stats job."""

    def kernel(postings_pdf: pd.DataFrame, norms_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"qid": pd.Series([], dtype="int64"), "seg_id": pd.Series([], dtype="int32"),
             "doc_id": pd.Series([], dtype="int64"), "score": pd.Series([], dtype="float64")}
        )
        if len(norms_pdf) == 0:
            return empty  # postings may legitimately be empty (DocSet-only)
        seg_id = int(norms_pdf["seg_id"].iloc[0])
        dls_by_field: dict[str, np.ndarray] = {}
        for r in norms_pdf.itertuples():
            fname = field_names[int(r.fidx)]
            dls_by_field[fname] = np.frombuffer(r.dls_bin, dtype="<u4").astype(
                np.float64
            )
        n_seg_docs = max((len(a) for a in dls_by_field.values()), default=0)
        mask = None
        if "mask_bin" in norms_pdf.columns:
            mb = norms_pdf["mask_bin"].iloc[0]
            if mb is not None and len(mb):
                mask = np.frombuffer(bytes(mb), dtype="<u4").astype(np.int64)
        ex_sets: dict[str, np.ndarray] = {}
        if "ex_cols" in norms_pdf.columns:
            ec = norms_pdf["ex_cols"].iloc[0]
            eb = norms_pdf["ex_bins"].iloc[0]
            if ec is not None:
                for c, blob in zip(ec, eb):
                    ex_sets[c] = np.frombuffer(
                        bytes(blob), dtype="<u4"
                    ).astype(np.int64)
        term_rows = {(r.field, r.term): r for r in postings_pdf.itertuples()}
        idf_l = dict(idf)
        if "gdf" in postings_pdf.columns:
            if scorer == "tfidf":
                def _gidf(df_):
                    return 1.0 + math.log(n_docs / (df_ + 1.0))
            else:
                def _gidf(df_):
                    return math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))
            for key, row in term_rows.items():
                if key not in idf_l:
                    idf_l[key] = _gidf(int(row.gdf))
        readers: dict[tuple[str, str], TermPostings | None] = {}

        def get_reader(key) -> TermPostings | None:
            r = readers.get(key, False)
            if r is False:
                row = term_rows.get(key)
                r = (
                    TermPostings(
                        bytes(row.blob), bytes(row.skip), bytes(row.bmax), row.df
                    )
                    if row is not None
                    else None
                )
                readers[key] = r
            return r

        def get_postings(key):
            r = get_reader(key)
            if r is None:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            return r.full()

        if scorer == "tfidf":

            def tfn(tf, dl_arr, avgdl):
                return np.sqrt(tf) / np.sqrt(dl_arr)

        else:

            def tfn(tf, dl_arr, avgdl):
                return (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dl_arr / avgdl)
                )

        def field_dls(field):
            return dls_by_field.get(field)

        def field_avgdl(field):
            return avgdl_by_field.get(field, 1.0) or 1.0

        def eval_node(node):
            if isinstance(node, qf.Empty):
                return np.empty(0, np.int64), np.empty(0, np.float64)
            if isinstance(node, qf.AllDocs):
                docs = np.arange(1, n_seg_docs + 1, dtype=np.int64)
                return docs, np.full(n_seg_docs, float(node.boost))
            if isinstance(node, qf.Term):
                key = (node.field, node.term)
                docs, tfs = get_postings(key)
                if len(docs) == 0:
                    return docs, np.empty(0, np.float64)
                w = node.boost * idf_l.get(key, 0.0)
                dls = field_dls(node.field)
                return docs, w * tfn(tfs, dls[docs - 1], field_avgdl(node.field))
            if isinstance(node, qf.Terms):
                w_by_t = dict(zip(node.terms, node.weights))
                kids = [
                    qf.Term(t, node.boost * w_by_t[t], field=node.field)
                    for t in sorted(w_by_t)
                ]
                return eval_node(qf.Or(*kids)) if kids else (
                    np.empty(0, np.int64),
                    np.empty(0, np.float64),
                )
            if isinstance(node, qf.And):
                results = [eval_node(c) for c in node.children]
                common = results[0][0]
                for d, _ in results[1:]:
                    common = common[np.isin(common, d, assume_unique=True)]
                    if len(common) == 0:
                        return common, np.empty(0, np.float64)
                score = np.zeros(len(common), np.float64)
                for d, s in results:
                    score += s[np.searchsorted(d, common)]
                return common, score
            if isinstance(node, qf.Or):
                results = [eval_node(c) for c in node.children]
                alldocs = np.concatenate([d for d, _ in results]) if results else np.empty(0, np.int64)
                if len(alldocs) == 0:
                    return np.empty(0, np.int64), np.empty(0, np.float64)
                uniq = np.unique(alldocs)
                score = np.zeros(len(uniq), np.float64)
                cnt = np.zeros(len(uniq), np.int64)
                for d, s in results:
                    idx = np.searchsorted(uniq, d)
                    score[idx] += s
                    cnt[idx] += 1
                keep = cnt >= node.min_match
                return uniq[keep], score[keep]
            if isinstance(node, qf.Not):
                pos_d, pos_s = eval_node(node.child)
                neg_d, _ = eval_node(node.excluded)
                keep = ~np.isin(pos_d, neg_d, assume_unique=True)
                return pos_d[keep], pos_s[keep]
            if isinstance(node, qf.Nested):
                # F19 block join: a child's parent is the nearest
                # parent-marked docID strictly greater than the child's
                # (children are ingested before their parent — [up]
                # core/search/nested_filter.cpp walks the parent bitset
                # the same way). Deleted docs are invisible to the join
                # (the reference's parent/child iterators never see
                # masked docs), so the mask applies HERE, not post-hoc.
                pdocs, _ps = eval_node(node.parent)
                cdocs, cscores = eval_node(node.child)
                if mask is not None:
                    if len(pdocs):
                        pdocs = pdocs[~np.isin(pdocs, mask, assume_unique=True)]
                    if len(cdocs):
                        keep_c = ~np.isin(cdocs, mask, assume_unique=True)
                        cdocs, cscores = cdocs[keep_c], cscores[keep_c]
                nothing = (np.empty(0, np.int64), np.empty(0, np.float64))
                if len(pdocs) == 0 or len(cdocs) == 0:
                    return nothing
                idx = np.searchsorted(pdocs, cdocs, side="left")
                ok = idx < len(pdocs)  # children past the last parent: orphans
                idx_c = np.minimum(idx, len(pdocs) - 1)
                ok &= pdocs[idx_c] != cdocs  # a parent doc is nobody's child
                idx, sc = idx[ok], cscores[ok]
                if len(idx) == 0:
                    return nothing
                counts = np.bincount(idx, minlength=len(pdocs))
                if node.merge in ("sum", "avg"):
                    # bincount accumulates in array order = ascending child
                    # docID — the frozen float64 association order
                    agg = np.bincount(idx, weights=sc, minlength=len(pdocs))
                    if node.merge == "avg":
                        agg = np.divide(
                            agg, counts,
                            out=np.zeros_like(agg), where=counts > 0,
                        )
                elif node.merge == "max":
                    agg = np.full(len(pdocs), -np.inf)
                    np.maximum.at(agg, idx, sc)
                elif node.merge == "min":
                    agg = np.full(len(pdocs), np.inf)
                    np.minimum.at(agg, idx, sc)
                else:  # "none": match-only, constant score
                    agg = np.ones(len(pdocs), np.float64)
                sel = counts >= node.min_children
                if node.max_children is not None:
                    sel &= counts <= node.max_children
                return pdocs[sel], node.boost * agg[sel]
            if isinstance(node, qf.Phrase):
                return eval_phrase(node)
            if isinstance(node, qf.SamePosition):
                return eval_same_position(node)
            if isinstance(node, qf.DocSet):
                ds = np.asarray(node.for_segment(seg_id), dtype=np.int64)
                return ds, np.full(len(ds), float(node.boost))
            if isinstance(node, qf.ColumnExists):
                docs = ex_sets.get(node.column)
                if docs is None:
                    return np.empty(0, np.int64), np.empty(0, np.float64)
                return docs, np.full(len(docs), float(node.boost))
            if isinstance(node, qf.NgramSimilarity):
                return eval_ngram_similarity(node)
            raise TypeError(f"cannot evaluate {type(node)}")

        def _slot_positions(slot_terms, field, common):
            """Merged (owner-packed) position set of any slot term over the
            `common` docs; returns (flat sorted unique, per-common counts
            present flag is implicit via membership). Seek path: ordinals
            into the position-offsets blob come from seek_entries, so only
            the 128-blocks containing `common` docs are decompressed."""
            SHIFT = np.int64(1) << 33  # > max packed position (u32)
            parts = []
            for t in slot_terms:
                key = (field, t)
                row = term_rows.get(key)
                if row is None:
                    continue
                r = get_reader(key)
                present, ords, counts = r.seek_entries(common)
                if not present.any():
                    continue
                pls = decode_positions_for(
                    bytes(row.pos_off), bytes(row.pos_pay), ords, counts
                )
                owner = np.repeat(np.flatnonzero(present).astype(np.int64), counts)
                flat = owner * SHIFT + (
                    np.concatenate(pls) if pls else np.empty(0, np.int64)
                )
                parts.append(flat)
            if not parts:
                return np.empty(0, np.int64)
            return np.unique(np.concatenate(parts))

        def _positional_match(slots, offsets, boost, field):
            """Shared positional kernel: docs where every slot j has some
            term occurring at (anchor position + offsets[j]); returns
            (docs, scores) with tf = number of matching anchors. offsets =
            0,1,2,... gives the phrase filter (F6, with multiterm "phrase
            part" slots); all-zero offsets gives by_same_position (F10).
            Fully vectorized: per-doc position lists are flattened into one
            namespace (doc_index · 2^33 + position) and matched with sorted
            np.isin — no per-doc Python. `slots` is a list of tuples of
            candidate terms per position; slot weight = Σ idf over its
            terms (frozen spec, SQL-expressible).

            Doc intersection is COST-ORDERED SEEK (P2 applied to
            positional nodes): only the cheapest slot (Σ df) decodes its
            doc lists fully; every other slot answers membership via
            seek_entries over the shrinking candidate set, so a hot slot
            ("the", "of") never decompresses blocks the rare slot's docs
            don't touch — and the position blobs were always
            candidate-only."""
            slot_readers, costs = _slot_readers(slots, field)
            if slot_readers is None:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            lead = int(np.argmin(costs))
            docs_u = [r.full()[0] for r in slot_readers[lead]]
            common = (
                docs_u[0]
                if len(docs_u) == 1
                else np.unique(np.concatenate(docs_u))
            )
            common = _seek_intersect_slots(
                common, slot_readers, costs, skip={lead}
            )
            return _verify_positions(slots, offsets, boost, field, common)

        def _slot_readers(slots, field):
            """(readers-per-slot, Σdf cost per slot), or (None, None) if a
            slot has no present term (an unmatchable slot empties the
            positional node)."""
            slot_readers, costs = [], []
            for slot in slots:
                rs = [
                    get_reader((field, t))
                    for t in slot
                    if term_rows.get((field, t)) is not None
                ]
                if not rs:
                    return None, None
                slot_readers.append(rs)
                costs.append(sum(r.df for r in rs))
            return slot_readers, costs

        def _seek_intersect_slots(common, slot_readers, costs, skip):
            """Shrink `common` to docs where EVERY slot (except `skip`,
            already satisfied) has some term present — cost-ordered
            seek_entries, cheapest slots first."""
            for j in sorted(
                (j for j in range(len(slot_readers)) if j not in skip),
                key=lambda j: costs[j],
            ):
                if len(common) == 0:
                    break
                present_any = np.zeros(len(common), dtype=bool)
                for r in slot_readers[j]:
                    p, _o, _c = r.seek_entries(common)
                    present_any |= p
                common = common[present_any]
            return common

        def _verify_positions(slots, offsets, boost, field, common):
            """Exact positional verification + scoring over candidate docs
            that already passed the doc-level slot intersection."""
            if len(common) == 0:
                return common, np.empty(0, np.float64)
            flats = [_slot_positions(slot, field, common) for slot in slots]
            anchor = flats[0]
            owner0 = anchor >> 33
            ok = np.ones(len(anchor), dtype=bool)
            for j in range(1, len(flats)):
                ok &= np.isin(anchor + (offsets[j] - offsets[0]), flats[j])
            hits = np.bincount(owner0[ok], minlength=len(common)).astype(
                np.float64
            )
            matched = hits > 0
            w = boost * sum(
                idf_l.get((field, t), 0.0) for slot in slots for t in slot
            )
            docs_out = common[matched]
            dls = field_dls(field)
            scores = w * tfn(hits[matched], dls[docs_out - 1], field_avgdl(field))
            return docs_out.astype(np.int64), scores

        def _positional_topk(node, k):
            """Top-k evaluation of a root Phrase/SamePosition with
            per-block score upper bounds — the positional analogue of
            dynamic-θ block-max WAND (VERDICT r4 #3).

            The phrase score is w·tfn(hits, dl) with hits = matching
            anchor count; hits ≤ tf of ANY single-term slot in the doc
            (each matched anchor consumes a distinct position in every
            slot), so for a single-reader slot's block B the score is
            bounded by w·tfn(max_tf(B), min_dl(B)) — tfn is monotone
            increasing in tf and decreasing in dl.  The cheapest
            single-reader slot becomes the CANDIDATE GENERATOR: its
            blocks are processed in descending bound order with iterated
            θ tightening; every decoded candidate batch is doc-level
            seek-intersected with the other slots and then
            position-verified EXACTLY (verify-on-survivors), so results
            are identical to the exhaustive path under the
            (rounded score desc, doc asc) selection.  Blocks whose bound
            falls below θ−ε are never decoded — the lead list is no
            longer fully decompressed the way `_positional_match`'s
            full() lead is.  Falls back to `_positional_match` when no
            single-reader slot exists (every slot is a multiterm
            expansion)."""
            from iresearch_spark.query.wand import EPS

            slots = _as_slots(node.terms)
            offsets = (
                list(node.slot_offsets())
                if isinstance(node, qf.Phrase)
                else [0] * len(slots)
            )
            slot_readers, costs = _slot_readers(slots, node.field)
            if slot_readers is None:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            single = [
                j for j in range(len(slots)) if len(slot_readers[j]) == 1
            ]
            if not single:
                return None  # every slot is a multiterm expansion —
                # no single bounded generator list; caller falls back to
                # the exact full-lead path
            lead = min(single, key=lambda j: costs[j])
            r0 = slot_readers[lead][0]
            w = node.boost * sum(
                idf_l.get((node.field, t), 0.0)
                for slot in slots
                for t in slot
            )
            avgdl = field_avgdl(node.field)
            ub_blocks = w * tfn(
                r0.bmax[:, 0].astype(np.float64),
                r0.bmax[:, 1].astype(np.float64),
                avgdl,
            )
            order = np.argsort(-ub_blocks, kind="stable")
            ub_desc = ub_blocks[order]
            n = len(order)
            docs_acc = np.empty(0, np.int64)
            score_acc = np.empty(0, np.float64)
            theta = -np.inf
            pos = 0
            chunk = max(4, (k + 127) // 128)
            while pos < n:
                end = (
                    n
                    if theta == -np.inf
                    else int(
                        np.searchsorted(
                            -ub_desc, -(theta - EPS), side="right"
                        )
                    )
                )
                if pos >= end:
                    break
                take = np.sort(order[pos : min(pos + chunk, end)])
                pos = min(pos + chunk, end)
                chunk *= 2
                cand, _tf = r0.decode_blocks(take)
                if mask is not None and len(cand):
                    cand = cand[~np.isin(cand, mask, assume_unique=True)]
                if not len(cand):
                    continue
                cand = _seek_intersect_slots(
                    cand, slot_readers, costs, skip={lead}
                )
                d_new, s_new = _verify_positions(
                    slots, offsets, node.boost, node.field, cand
                )
                if not len(d_new):
                    continue
                docs_acc = np.concatenate([docs_acc, d_new])
                score_acc = np.concatenate([score_acc, s_new])
                if len(score_acc) >= k:
                    theta = float(
                        np.partition(score_acc, len(score_acc) - k)[
                            len(score_acc) - k
                        ]
                    )
            if score_round is not None:
                score_acc = np.round(score_acc, score_round)
            if len(docs_acc) > k:
                sel = np.lexsort((docs_acc, -score_acc))[:k]
                return docs_acc[sel], score_acc[sel]
            return docs_acc, score_acc

        def _as_slots(parts):
            return [
                tuple(p.terms) if isinstance(p, qf.Terms) else (p,)
                for p in parts
            ]

        def eval_phrase(node):
            slots = _as_slots(node.terms)
            return _positional_match(
                slots, list(node.slot_offsets()), node.boost, node.field
            )

        def eval_same_position(node):
            slots = _as_slots(node.terms)
            return _positional_match(
                slots, [0] * len(slots), node.boost, node.field
            )

        def eval_ngram_similarity(node):
            """F9: longest positionally-increasing chain of matched target
            grams / gram count >= threshold; score = boost * similarity
            ([up] ngram_similarity_filter.cpp's longest-sequence search).

            Two-phase: (1) a fully vectorized count prefilter — a chain of
            length L uses L distinct gram slots, so sim >= threshold needs
            at least ceil(threshold·m) slots present, computed with one
            scatter-add over the candidate union (common grams matching
            most of the corpus cost one searchsorted, not a Python pass);
            (2) the grouped-LIS runs ONLY on survivors, whose positions
            are the only ones decoded — and runs BATCHED: one tails
            MATRIX (n_survivors × m) receives vectorized patience updates
            for every surviving doc at once (per-(doc,gram) position
            ranks are the only Python loop, bounded by m × max_tf — no
            per-doc pass even when a low threshold lets most of the
            corpus through the prefilter)."""
            grams = list(node.grams())
            m = len(grams)
            if m == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            import math

            per_gram = []  # (row, docs, tfs) per gram present in segment
            for g in grams:
                key = (node.field, g)
                row = term_rows.get(key)
                if row is None:
                    per_gram.append(None)
                    continue
                docs, tfs = get_postings(key)
                per_gram.append((row, docs, tfs))
            present_pg = [pg for pg in per_gram if pg]
            if not present_pg:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            cand_all = np.unique(np.concatenate([pg[1] for pg in present_pg]))
            # phase 1: slots-present count per candidate (vectorized)
            need = max(1, int(math.ceil(node.threshold * m - 1e-9)))
            cnt = np.zeros(len(cand_all), np.int64)
            for pg in present_pg:
                cnt[np.searchsorted(cand_all, pg[1])] += 1
            cand = cand_all[cnt >= need]
            if len(cand) == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            # phase 2: grams in order, positions DESCENDING within each
            # (doc, gram) — so one gram extends a chain at most once (the
            # classic grouped-LIS trick). tails[k] = min end-position of a
            # length-(k+1) chain, kept as one (n_cand × m) matrix; each
            # rank-round applies the patience replace (bisect_left ≡
            # count of finite tails < p) to EVERY doc's row in one
            # vectorized step.
            _INF = np.iinfo(np.int64).max
            tails_m = np.full((len(cand), m), _INF, dtype=np.int64)
            for pg in per_gram:
                if pg is None:
                    continue
                row, docs, tfs = pg
                idx = np.searchsorted(docs, cand)
                idx_c = np.minimum(idx, max(len(docs) - 1, 0))
                present = (len(docs) > 0) & (docs[idx_c] == cand)
                sel = idx_c[present]
                counts = tfs[sel].astype(np.int64)
                pls = decode_positions_for(
                    bytes(row.pos_off), bytes(row.pos_pay), sel, counts
                )
                ci_idx = np.flatnonzero(present)
                if not len(ci_idx):
                    continue
                pos_flat = (
                    np.concatenate(list(pls))
                    if len(counts)
                    else np.empty(0, np.int64)
                ).astype(np.int64)
                ci_rep = np.repeat(ci_idx, counts)
                if not len(pos_flat):
                    continue
                order = np.lexsort((-pos_flat, ci_rep))
                ci_s, pos_s = ci_rep[order], pos_flat[order]
                starts = np.flatnonzero(np.r_[True, ci_s[1:] != ci_s[:-1]])
                seg_lens = np.diff(np.r_[starts, len(ci_s)])
                rank = np.arange(len(ci_s)) - np.repeat(starts, seg_lens)
                for r in range(int(seg_lens.max())):
                    sel_r = rank == r
                    rows = ci_s[sel_r]
                    p = pos_s[sel_r]
                    j = (tails_m[rows] < p[:, None]).sum(axis=1)
                    tails_m[rows, j] = p
            sims = (tails_m < _INF).sum(axis=1) / m
            keep = sims >= node.threshold
            return (
                cand[keep].astype(np.int64),
                (node.boost * sims[keep]).astype(np.float64),
            )

        out_frames = []
        for qid, tree in trees.items():
            if match_only:
                docs, _ = eval_node(tree)
                if mask is not None and len(docs):
                    keep = ~np.isin(docs, mask, assume_unique=True)
                    docs = docs[keep]
                if len(docs) == 0:
                    continue
                out_frames.append(
                    pd.DataFrame(
                        {
                            "qid": np.full(len(docs), qid, dtype=np.int64),
                            "seg_id": np.full(len(docs), seg_id, dtype=np.int32),
                            "doc_id": docs,
                            "score": np.zeros(len(docs), dtype=np.float64),
                        }
                    )
                )
                continue
            docs = scores = None
            # scored_all (grouped top-k / collapse): the caller needs the
            # FULL scored match set, so WAND's top-k pruning is invalid —
            # take the exact-eval path and skip truncation below
            ft = None if scored_all else _flatten_or_terms(tree)
            if ft is not None and len(ft) >= 2:
                pairs = [
                    (
                        m * idf_l.get(key, 0.0),
                        get_reader(key),
                        field_dls(key[0]),
                        field_avgdl(key[0]),
                    )
                    for key, m in ft
                    if get_reader(key) is not None
                ]
                docs, scores = or_terms_topk(
                    pairs, k, tfn, mask=mask, score_round=score_round
                )
            else:
                # one boolean level deeper: Or over And-of-Term groups —
                # propagate block bounds through the conjunctions
                # (or_groups_topk); only worth it when at least one child
                # is a real conjunction (all-singleton = the ft path)
                gs = None if scored_all else _flatten_or_groups(tree)
                if (
                    gs is not None
                    and len(gs) >= 2
                    and any(len(g) > 1 for g in gs)
                ):
                    group_pairs = [
                        [
                            (
                                m * idf_l.get(key, 0.0),
                                get_reader(key),
                                field_dls(key[0]),
                                field_avgdl(key[0]),
                            )
                            for key, m in g
                        ]
                        for g in gs
                    ]
                    docs, scores = or_groups_topk(
                        group_pairs, k, tfn, mask=mask,
                        score_round=score_round,
                    )
                elif (
                    not scored_all
                    and isinstance(tree, (qf.Phrase, qf.SamePosition))
                    and (pt := _positional_topk(tree, k)) is not None
                ):
                    docs, scores = pt
                elif (
                    fa := None if scored_all else _flatten_and_terms(tree)
                ) is not None and len(fa) >= 2:
                    if any(get_reader(key) is None for key, _m in fa):
                        continue  # a missing term empties the conjunction
                    pairs = [
                        (
                            m * idf_l.get(key, 0.0),
                            get_reader(key),
                            field_dls(key[0]),
                            field_avgdl(key[0]),
                        )
                        for key, m in fa
                    ]
                    docs, scores = and_terms(pairs, tfn, mask=mask)
                else:
                    docs, scores = eval_node(tree)
                    if mask is not None and len(docs):
                        keep = ~np.isin(docs, mask, assume_unique=True)
                        docs, scores = docs[keep], scores[keep]
            if len(docs) == 0:
                continue
            if score_round is not None:
                scores = np.round(scores, score_round)
            order = np.lexsort((docs, -scores))
            if not scored_all:
                order = order[:k]
            out_frames.append(
                pd.DataFrame(
                    {
                        "qid": np.full(len(order), qid, dtype=np.int64),
                        "seg_id": np.full(len(order), seg_id, dtype=np.int32),
                        "doc_id": docs[order],
                        "score": scores[order],
                    }
                )
            )
        if not out_frames:
            return empty
        return pd.concat(out_frames, ignore_index=True)

    return kernel
