"""The query algebra: a boolean filter tree over named indexed fields.

Mirrors the reference's filter object model ([up] core/search/filter.hpp and
the concrete filters under core/search/ — see SURVEY.md §2c F1–F16): every
leaf is field-qualified (`field` defaults to "text"), matches terms in that
field's dictionary, and scores with that FIELD's statistics (df, dl,
avgdl — per-field norms, exactly the reference's per-field model); inner
nodes combine children. There is no SQL layer in the reference; this tree
IS the query IR.

Scoring spec (frozen; the oracle in iresearch_spark.oracle and the Spark
executor in iresearch_spark.query.executor must agree exactly, float64):

  idf(f,t)    = ln(1 + (N - df_f(t) + 0.5) / (df_f(t) + 0.5))
  tfn(tf, dl) = (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl_f))  # k1=1.2 b=.75
  Term        : (boost * idf) * tfn   — float64, THIS association order
                (rank-identity requires bitwise-stable float evaluation)
  And         : docs in ALL children; score = Σ child scores
  Or          : docs in ≥ min_match children; score = Σ matching child scores
  Not         : docs of `child` minus docs of `excluded`; child's score
  Terms       : Or over the term set; per-term `weights` multiply the
                contribution (weight 0 = matches but unscored)
  Prefix/Wildcard/Fuzzy/TermRange : expand against the field dictionary;
                the top `scored_terms_limit` expansions by (df desc, term
                asc) score normally, the REST match with weight 0
                ([up] core/search/multiterm_query.cpp's
                limited_sample_collector semantics)
  Phrase      : slots at consecutive positions; a slot is a term or a
                multiterm part (expanded uncapped); phrase_tf = #anchor
                positions where every slot matches; score =
                (Σ slots Σ slot-terms idf) * tfn(phrase_tf, dl)
  NgramSim    : longest positionally-increasing chain of target grams /
                gram count >= threshold; score = boost * similarity
  Ties        : (score desc, seg_id asc, doc_id asc) — total order
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Filter:
    """Base class; nodes are immutable value objects."""


@dataclass(frozen=True)
class Term(Filter):
    term: str
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class Terms(Filter):
    """Weak disjunction over a term set (F2). `weights` (aligned with
    `terms`, default 1.0) carry per-term score multipliers; weight 0.0
    means "matches but is not scored" — the reference's multiterm
    expansion keeps matching terms beyond scored_terms_limit unscored
    ([up] core/search/multiterm_query.cpp limited_sample_collector)."""

    terms: tuple[str, ...]
    boost: float = 1.0
    field: str = "text"
    weights: tuple[float, ...] = ()

    def __init__(self, terms, boost: float = 1.0, field: str = "text",
                 weights=None):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "field", field)
        object.__setattr__(
            self,
            "weights",
            tuple(weights) if weights is not None
            else tuple(1.0 for _ in self.terms),
        )


@dataclass(frozen=True)
class Prefix(Filter):
    prefix: str
    scored_terms_limit: int = 64
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class TermRange(Filter):
    lo: str | None
    hi: str | None
    include_lo: bool = True
    include_hi: bool = False
    scored_terms_limit: int = 64
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class GranularRange(Filter):
    """F5 by_granular_range ([up] core/search/granular_range_filter.cpp)
    over a `numeric`-analyzed field (A7): the signed-integer range is
    decomposed into the fewest per-precision-level term ranges (full
    precision only at the ragged edges — see analysis.numeric), expanded
    against the term dictionary and scored exactly like every other
    multiterm node (top scored_terms_limit by df weighted, the rest
    matched-unscored). `step` must equal the field's analyzer step;
    dtype "f64" (for `numericd` fields) takes float bounds through the
    sortable double bit pattern."""

    lo: int | float | None
    hi: int | float | None
    include_lo: bool = True
    include_hi: bool = False
    step: int = 16
    dtype: str = "i64"
    scored_terms_limit: int = 64
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class Wildcard(Filter):
    pattern: str  # '%' = any run, '_' = any single char (reference syntax)
    scored_terms_limit: int = 64
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class Regexp(Filter):
    """Multiterm regular-expression filter: the term dictionary is
    expanded by FULL-match against `pattern` and the matches score like
    any other multiterm node (top scored_terms_limit by df weighted, the
    rest matched-unscored). The ArangoSearch REGEX_TEST / Lucene
    RegexpQuery surface; the engine evaluates the pattern JVM-side
    (`rlike`), the oracles with `re.fullmatch` / DuckDB
    `regexp_full_match` — stick to the portable RE2-ish subset
    (character classes, alternation, `*+?{m,n}` quantifiers; anchoring
    is implicit, don't write ^ $)."""

    pattern: str
    scored_terms_limit: int = 64
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class Fuzzy(Filter):
    """F8 by_edit_distance. `prefix` is the reference's fixed-prefix
    option ([up] core/search/levenshtein_filter.cpp by_edit_distance_
    options::prefix; ArangoSearch LEVENSHTEIN_MATCH's prefix argument):
    a dictionary term matches when it starts with `prefix` EXACTLY and
    the remaining suffix is within `max_distance` of `term`. The prefix
    both narrows the automaton-equivalent scan (JVM startswith pushdown)
    and anchors the common head outside the edit budget."""

    term: str
    max_distance: int = 1
    with_transpositions: bool = False
    scored_terms_limit: int = 64
    boost: float = 1.0
    field: str = "text"
    prefix: str = ""


@dataclass(frozen=True)
class Phrase(Filter):
    """Ordered positional match (F6). Each element of `terms` is either a
    plain term string or a "phrase part" — a Prefix/Wildcard/Fuzzy node
    whose dictionary expansion may match at that position
    ([up] core/search/phrase_filter.cpp's per-position variants).

    `offsets` (default 0,1,2,… — consecutive positions) gives each slot's
    position relative to the anchor, mirroring the reference's
    by_phrase::push_back(part, offs) which admits GAPS: e.g. offsets
    (0, 2) matches term0 followed by term1 two positions later with any
    single token between them. Offsets must be strictly increasing
    (co-located slots are by_same_position's job, F10)."""

    terms: tuple
    boost: float = 1.0
    field: str = "text"
    offsets: tuple[int, ...] | None = None

    def __init__(self, terms, boost: float = 1.0, field: str = "text",
                 offsets=None):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "field", field)
        if offsets is not None:
            offsets = tuple(int(o) for o in offsets)
            if len(offsets) != len(self.terms):
                raise ValueError("offsets must align with terms")
            if any(b <= a for a, b in zip(offsets, offsets[1:])):
                raise ValueError("offsets must be strictly increasing")
        object.__setattr__(self, "offsets", offsets)

    def slot_offsets(self) -> tuple[int, ...]:
        if self.offsets is not None:
            return self.offsets
        return tuple(range(len(self.terms)))


@dataclass(frozen=True)
class ColumnExists(Filter):
    """Docs whose stored column is non-null (F11,
    [up] core/search/column_existence_filter.cpp). Resolved fully
    distributed: one doc-table scan emits per-segment sorted doc-id blobs
    that ride the cogroup into the scoring kernel (the reference
    materializes a per-segment column iterator the same way). Filter-only
    semantics: constant score = boost."""

    column: str
    boost: float = 1.0


@dataclass(frozen=True)
class DocSet(Filter):
    """Pre-materialized per-segment doc-id set (F18 cached bitset filter,
    [up] core/search/bitset_doc_iterator.cpp). seg_docs is a tuple of
    (seg_id, sorted tuple of doc_ids); score = boost for every member."""

    seg_docs: tuple[tuple[int, tuple[int, ...]], ...]
    boost: float = 1.0

    def __init__(self, seg_docs, boost: float = 1.0):
        norm = tuple(
            sorted((int(s), tuple(sorted(int(d) for d in docs))) for s, docs in (
                seg_docs.items() if isinstance(seg_docs, dict) else seg_docs
            ))
        )
        object.__setattr__(self, "seg_docs", norm)
        object.__setattr__(self, "boost", boost)

    def for_segment(self, seg_id: int) -> tuple[int, ...]:
        for s, docs in self.seg_docs:
            if s == seg_id:
                return docs
        return ()


@dataclass(frozen=True)
class NgramSimilarity(Filter):
    """Approximate-match filter (F9,
    [up] core/search/ngram_similarity_filter.cpp): the target string is
    split into character n-grams (the A4 analyzer); a doc matches when the
    longest positionally-increasing chain of matched grams, relative to
    the target's gram count, reaches `threshold`; score = boost ·
    similarity · Σ idf(gram present). The chain criterion mirrors the
    reference's longest-sequence search over positions."""

    target: str
    threshold: float = 0.7
    n: int = 2
    boost: float = 1.0
    field: str = "text"

    def grams(self) -> tuple[str, ...]:
        t = self.target
        if len(t) < self.n:
            return (t,) if t else ()
        return tuple(t[i : i + self.n] for i in range(len(t) - self.n + 1))


@dataclass(frozen=True)
class SamePosition(Filter):
    """Terms co-occurring at the identical position (F10,
    [up] core/search/same_position_filter.cpp). In a single-valued text
    field distinct terms never share a position, so this matches only via
    repeated terms / multi-valued ingestion — kept for algebra parity;
    evaluation shares the positional kernel with Phrase (offset 0)."""

    terms: tuple[str, ...]
    boost: float = 1.0
    field: str = "text"

    def __init__(self, terms, boost: float = 1.0, field: str = "text"):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "field", field)


@dataclass(frozen=True)
class Nested(Filter):
    """Parent/child block-join filter (F19,
    [up] core/search/nested_filter.cpp :: ByNestedFilter). Documents are
    ingested in blocks — the children first, their parent LAST — so within
    a segment a child's parent is the nearest parent-marked docID strictly
    greater than the child's (the reference walks the parent bitset the
    same way). `parent` is any filter marking the parent docs (the
    reference takes a prepared parent bitset provider); `child` is any
    filter; a parent matches when the number of its children matched by
    `child` lies in [min_children, max_children] (upstream's Match range;
    kMatchNone is expressible as Not(parent, Nested(...))). The parent's
    score merges its matching children's scores per `merge`
    (upstream ScoreMergeType): "sum" | "max" | "min" | "avg" | "none"
    (none = constant 1), times boost. A doc matched by `child` that is
    itself a parent is not a child of anything and is ignored; children
    above the last parent (an unterminated block) are ignored too."""

    parent: Filter
    child: Filter
    min_children: int = 1
    max_children: int | None = None
    merge: str = "sum"
    boost: float = 1.0

    def __post_init__(self):
        if self.min_children < 1:
            raise ValueError("min_children must be >= 1 (use Not for none-match)")
        if self.max_children is not None and self.max_children < self.min_children:
            raise ValueError("max_children < min_children")
        if self.merge not in ("sum", "max", "min", "avg", "none"):
            raise ValueError(f"unknown merge type {self.merge!r}")


@dataclass(frozen=True)
class And(Filter):
    children: tuple[Filter, ...]
    boost: float = 1.0

    def __init__(self, *children, boost: float = 1.0):
        if len(children) == 1 and isinstance(children[0], (list, tuple)):
            children = tuple(children[0])
        object.__setattr__(self, "children", tuple(children))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class Or(Filter):
    children: tuple[Filter, ...]
    min_match: int = 1
    boost: float = 1.0

    def __init__(self, *children, min_match: int = 1, boost: float = 1.0):
        if len(children) == 1 and isinstance(children[0], (list, tuple)):
            children = tuple(children[0])
        object.__setattr__(self, "children", tuple(children))
        object.__setattr__(self, "min_match", min_match)
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class Not(Filter):
    child: Filter
    excluded: Filter
    boost: float = 1.0


@dataclass(frozen=True)
class Boost(Filter):
    child: Filter
    boost: float


@dataclass(frozen=True)
class AllDocs(Filter):
    boost: float = 1.0


@dataclass(frozen=True)
class Empty(Filter):
    pass


def _scaled(node: Filter, factor: float) -> Filter:
    """Return node with its boost multiplied by factor."""
    if factor == 1.0 or isinstance(node, Empty):
        return node
    if isinstance(node, Boost):
        return Boost(node.child, node.boost * factor)
    kwargs = {f.name: getattr(node, f.name) for f in node.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    kwargs["boost"] = node.boost * factor
    if isinstance(node, And):
        return And(*kwargs.pop("children"), **kwargs)
    if isinstance(node, Or):
        return Or(*kwargs.pop("children"), **kwargs)
    if isinstance(node, (Terms, Phrase, SamePosition)):
        return type(node)(kwargs.pop("terms"), **kwargs)
    return type(node)(**kwargs)


def normalize(node: Filter) -> Filter:
    """Boolean normalization, mirroring the reference's prepare-time rewrites
    ([up] core/search/boolean_filter.cpp :: optimize): fold Boost wrappers,
    flatten nested And/Or (when min_match allows), unwrap single children,
    propagate Empty (And with Empty child -> Empty; Or drops Empty children).
    """
    if isinstance(node, Boost):
        return normalize(_scaled(node.child, node.boost))
    if isinstance(node, Not):
        child = normalize(node.child)
        excluded = normalize(node.excluded)
        if isinstance(child, Empty):
            return Empty()
        if isinstance(excluded, Empty):
            return normalize(_scaled(child, node.boost))
        return Not(child, excluded, node.boost)
    if isinstance(node, And):
        kids = [normalize(_scaled(c, node.boost)) for c in node.children]
        flat: list[Filter] = []
        for c in kids:
            if isinstance(c, Empty):
                return Empty()
            if isinstance(c, And):
                flat.extend(_scaled(g, c.boost) for g in c.children)
            else:
                flat.append(c)
        if not flat:
            return Empty()
        if len(flat) == 1:
            return flat[0]
        return And(*flat)
    if isinstance(node, Nested):
        # boost stays on the Nested node (the merge runs over the child's
        # own scores, then multiplies); parent matching is score-free
        parent = normalize(node.parent)
        child = normalize(node.child)
        if isinstance(parent, Empty) or isinstance(child, Empty):
            return Empty()
        return Nested(
            parent, child, node.min_children, node.max_children,
            node.merge, node.boost,
        )
    if isinstance(node, Or):
        kids = [normalize(_scaled(c, node.boost)) for c in node.children]
        flat: list[Filter] = []
        for c in kids:
            if isinstance(c, Empty):
                continue
            if isinstance(c, Or) and c.min_match == 1 and node.min_match == 1:
                flat.extend(_scaled(g, c.boost) for g in c.children)
            else:
                flat.append(c)
        if not flat or node.min_match > len(flat):
            return Empty()
        if len(flat) == 1 and node.min_match <= 1:
            return flat[0]
        return Or(*flat, min_match=node.min_match)
    return node
