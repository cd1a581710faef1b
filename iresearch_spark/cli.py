"""Command-line utilities mirroring the reference's benchmark harness
surface ([up] utils/index-put.cpp — ingest — and utils/index-search.cpp —
query): build an index from a parquet corpus, search it with a compact
query syntax, print snapshot stats, consolidate, and delete-by-query.

    python -m iresearch_spark build  --input corpus.parquet --store ./idx
    python -m iresearch_spark search --store ./idx 'w3 w7 -w999' -k 10
    python -m iresearch_spark stats  --store ./idx
    python -m iresearch_spark consolidate --store ./idx --policy tier
    python -m iresearch_spark delete --store ./idx 'w999'

Query syntax (`parse_query`):

    clause  := ['-'] [field ':'] atom ['^' boost]
    atom    := '"w1 w2"'        phrase (a trailing-* word is a prefix part)
             | 'pre*'           prefix
             | 'wild*card?'     wildcard (* = any run, ? = one char)
             | 'term~1'         fuzzy (Levenshtein; '~1t' = OSA/
                                transpositions; distance 1 or 2)
             | '[lo TO hi]'     term range (lo inclusive, hi exclusive —
                                the engine's TermRange default; '*' =
                                open bound; over a numeric-analyzed
                                field this resolves to the F5 granular
                                range with the manifest's frozen step)
             | '/pat/'          regexp (full-match, portable subset)
             | 'term'           exact term

Clauses combine as a disjunction (`Or`, min_match=1); `--all` combines
them as a conjunction. '-'-prefixed clauses are excluded via `Not`.
"""

from __future__ import annotations

import argparse
import json
import re
import sys

from iresearch_spark.query import filters as qf

_CLAUSE_RE = re.compile(
    r"""(?P<neg>-)?
        (?:(?P<field>[A-Za-z_]\w*):)?
        (?P<atom>"[^"]*"|\[[^\]]*\]|[^\s^]+)
        (?:\^(?P<boost>\d+(?:\.\d+)?))?""",
    re.VERBOSE,
)
_FUZZY_RE = re.compile(r"^(?P<term>.+?)~(?P<d>[12])(?P<osa>t?)$")


def _atom_filter(atom: str, field: str) -> qf.Filter:
    if atom.startswith('"') and atom.endswith('"'):
        words = atom[1:-1].split()
        parts = [
            qf.Prefix(w[:-1], field=field) if w.endswith("*") and len(w) > 1 else w
            for w in words
        ]
        return qf.Phrase(parts, field=field)
    if atom.startswith("[") and atom.endswith("]"):
        m = re.match(r"^\[(\S+)\s+TO\s+(\S+)\]$", atom)
        if not m:
            raise ValueError(f"bad range syntax: {atom!r} (want '[lo TO hi]')")
        lo, hi = m.group(1), m.group(2)  # '*' = open bound
        return qf.TermRange(
            None if lo == "*" else lo, None if hi == "*" else hi, field=field
        )
    if atom.startswith("/") and atom.endswith("/") and len(atom) > 2:
        # /pattern/ — multiterm regexp, implicit full-match anchoring
        return qf.Regexp(atom[1:-1], field=field)
    m = _FUZZY_RE.match(atom)
    if m:
        return qf.Fuzzy(
            m.group("term"),
            max_distance=int(m.group("d")),
            with_transpositions=bool(m.group("osa")),
            field=field,
        )
    if re.search(r"~\w*$", atom):
        raise ValueError(
            f"bad fuzzy syntax: {atom!r} (want term~1, term~2, or term~1t)"
        )
    if "*" in atom or "?" in atom:
        if atom.endswith("*") and "?" not in atom and "*" not in atom[:-1]:
            return qf.Prefix(atom[:-1], field=field)
        pat = (
            atom.replace("\\", "\\\\")
            .replace("%", "\\%")
            .replace("_", "\\_")
            .replace("*", "%")
            .replace("?", "_")
        )
        return qf.Wildcard(pat, field=field)
    return qf.Term(atom, field=field)


def parse_query(
    q: str, field: str = "text", require_all: bool = False
) -> qf.Filter:
    """Parse the compact query syntax into the engine's filter algebra."""
    pos: list[qf.Filter] = []
    neg: list[qf.Filter] = []
    rest = q.strip()
    if not rest:
        raise ValueError("empty query")
    idx = 0
    for m in _CLAUSE_RE.finditer(rest):
        if rest[idx : m.start()].strip():
            raise ValueError(f"bad query near: {rest[idx:m.start()]!r}")
        idx = m.end()
        f = _atom_filter(m.group("atom"), m.group("field") or field)
        if m.group("boost"):
            f = qf.Boost(f, float(m.group("boost")))
        (neg if m.group("neg") else pos).append(f)
    if rest[idx:].strip():
        raise ValueError(f"bad query near: {rest[idx:]!r}")
    if pos:
        base = (
            pos[0]
            if len(pos) == 1
            else (qf.And(*pos) if require_all else qf.Or(*pos))
        )
    else:
        base = qf.AllDocs()
    if neg:
        base = qf.Not(base, neg[0] if len(neg) == 1 else qf.Or(*neg))
    return base


def resolve_numeric_ranges(node: qf.Filter, analyzers: dict[str, str]) -> qf.Filter:
    """Rewrite `[lo TO hi]` ranges over numeric-analyzed fields (A7) into
    the F5 granular filter with the field's FROZEN analyzer step — the CLI
    consults the snapshot manifest exactly as the reference resolves a
    range filter against the field's indexed type
    ([up] core/search/granular_range_filter.cpp expecting the
    numeric_token_stream's granularity terms)."""
    from iresearch_spark.analysis.numeric import parse_numeric_spec_typed

    if isinstance(node, qf.TermRange):
        nspec = parse_numeric_spec_typed(analyzers.get(node.field, ""))
        if nspec is None:
            return node
        step, dtype = nspec
        cast = float if dtype == "f64" else int
        try:
            lo = None if node.lo is None else cast(node.lo)
            hi = None if node.hi is None else cast(node.hi)
        except ValueError:
            raise ValueError(
                f"field {node.field!r} is numeric-indexed; range bounds "
                f"must be numbers (got [{node.lo} TO {node.hi}])"
            ) from None
        return qf.GranularRange(
            lo,
            hi,
            include_lo=node.include_lo,
            include_hi=node.include_hi,
            step=step,
            dtype=dtype,
            scored_terms_limit=node.scored_terms_limit,
            boost=node.boost,
            field=node.field,
        )
    if isinstance(node, qf.And):
        return qf.And(
            *[resolve_numeric_ranges(c, analyzers) for c in node.children],
            boost=node.boost,
        )
    if isinstance(node, qf.Or):
        return qf.Or(
            *[resolve_numeric_ranges(c, analyzers) for c in node.children],
            boost=node.boost,
            min_match=node.min_match,
        )
    if isinstance(node, qf.Not):
        return qf.Not(
            resolve_numeric_ranges(node.child, analyzers),
            resolve_numeric_ranges(node.excluded, analyzers),
            node.boost,
        )
    if isinstance(node, qf.Boost):
        return qf.Boost(
            resolve_numeric_ranges(node.child, analyzers), node.boost
        )
    return node


def _field_analyzers(store, sid=None) -> dict[str, str]:
    return {
        d["name"]: d.get("analyzer", "") for d in store.fields(sid)
    }


# ------------------------------------------------------------- commands


def _get_spark(master: str | None):
    from pyspark.sql import SparkSession

    b = SparkSession.builder
    if master:
        b = b.master(master)
    return (
        b.appName("iresearch_spark_cli")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def _parse_field(spec: str):
    from iresearch_spark.fields import FieldSpec

    parts = spec.split(",")
    if not 1 <= len(parts) <= 5:
        raise ValueError(
            f"bad --field {spec!r}: want name[,source[,analyzer[,offsets[,payloads]]]]"
        )
    name = parts[0]
    source = parts[1] if len(parts) > 1 else "__text__"
    analyzer = parts[2] if len(parts) > 2 else "text"
    offsets = "offsets" in parts[3:]
    payloads = "payloads" in parts[3:]
    return FieldSpec(
        name, source, analyzer, offsets=offsets or payloads, payloads=payloads
    )


def _open_store(args):
    """SnapshotStore honoring the S9 encryption flags: --key-hex takes a
    raw 16/24/32-byte AES key in hex; --key derives one from a
    passphrase (store.derive_key)."""
    from iresearch_spark.store import SnapshotStore, derive_key

    key = None
    if getattr(args, "key_hex", None):
        key = bytes.fromhex(args.key_hex)
    elif getattr(args, "key", None):
        key = derive_key(args.key)
    return SnapshotStore(args.store, key=key)


def cmd_build(args, spark) -> int:
    from iresearch_spark.build.indexer import build_index

    corpus = spark.read.parquet(args.input)
    store = _open_store(args)
    fields = [_parse_field(s) for s in args.field] or None
    stored = tuple(c for c in (args.stored or "").split(",") if c)
    sid = build_index(
        spark,
        corpus,
        store,
        n_segments=args.segments,
        fields=fields,
        source=args.input,
        mode="append" if args.append else "replace",
        stored_cols=stored,
    )
    snap = store.snapshot(sid)
    print(
        json.dumps(
            {
                "snapshot_id": sid,
                "n_docs": snap["stats"]["n_docs"],
                "n_segments": len(snap["segments"]),
                "metrics": snap.get("metrics", {}),
            }
        )
    )
    return 0


def cmd_search(args, spark) -> int:
    from iresearch_spark.query.executor import IndexSearcher

    # the output-mode flags each pick a different search surface; they are
    # dispatched first-match-wins below, so combining them would silently
    # ignore all but one — fail loudly instead
    modes = {
        "--sorted": bool(getattr(args, "sorted", False)),
        "--facet": getattr(args, "facet", None) is not None,
        "--after": getattr(args, "after", None) is not None,
        "--sort-by": getattr(args, "sort_by", None) is not None,
        "--explain": bool(getattr(args, "explain", False)),
        "--snippet": getattr(args, "snippet", None) is not None,
        "--collapse": getattr(args, "collapse", None) is not None,
    }
    chosen = [name for name, on in modes.items() if on]
    if len(chosen) > 1:
        raise SystemExit(
            "search: choose at most one output mode, got "
            + " ".join(chosen)
        )
    flt = parse_query(args.query, field=args.field, require_all=args.all)
    s = IndexSearcher(spark, _open_store(args), scorer=args.scorer)
    flt = resolve_numeric_ranges(flt, _field_analyzers(s.store, s.sid))
    if getattr(args, "sorted", False):
        # scoring-free first-k matches in index order (url order, or the
        # primary sort of a build_index(sort_by=...) index — S10)
        for i, r in enumerate(s.sorted_topk(flt, k=args.k).collect(), 1):
            print(json.dumps({"rank": i, "url": r["url"]}))
        return 0
    if getattr(args, "facet", None):
        # faceted aggregation over the FULL match set
        for r in s.facets(flt, group_by=(args.facet,)).collect():
            print(
                json.dumps(
                    {
                        args.facet: r[args.facet],
                        "n_docs": int(r["n_docs"]),
                        "sum_dl": int(r["sum_dl"]),
                    },
                    default=str,
                )
            )
        return 0
    if getattr(args, "after", None):
        score_s, _, url = args.after.partition(",")
        if not _ or not url:
            raise SystemExit("--after needs SCORE,URL (from the last hit)")
        res = s.search_after(flt, k=args.k, after=(float(score_s), url))
        for r in res.collect():
            print(
                json.dumps(
                    {
                        "rank": int(r["rank"]),
                        "url": r["url"],
                        "score": float(r["score"]),
                    }
                )
            )
        return 0
    if getattr(args, "sort_by", None):
        spec, asc = args.sort_by, True
        if ":" in spec:
            spec, d = spec.rsplit(":", 1)
            asc = d != "desc"
        for r in s.sort_by_topk(flt, by=spec, k=args.k, ascending=asc).collect():
            print(
                json.dumps(
                    {"rank": int(r["rank"]), "url": r["url"], spec: r[spec]},
                    default=str,
                )
            )
        return 0
    if getattr(args, "explain", False):
        for r in s.explain_score(flt, k=args.k, score_round=6).collect():
            print(
                json.dumps(
                    {
                        "rank": int(r["rank"]),
                        "url": r["url"],
                        "field": r["field"],
                        "term": r["term"],
                        "tf": int(r["tf"]),
                        "df": int(r["df"]),
                        "weight": float(r["weight"]),
                        "contribution": float(r["contribution"]),
                        "score": float(r["score"]),
                    }
                )
            )
        return 0
    if getattr(args, "collapse", None):
        # exact field collapsing: <= 1 hit per stored-column value
        res = s.grouped_topk(
            flt, args.collapse, k=args.k, per_group=1, score_round=6
        )
        for r in res.collect():
            print(
                json.dumps(
                    {
                        "rank": int(r["rank"]),
                        "url": r["url"],
                        args.collapse: r[args.collapse],
                        "score": float(r["score"]),
                    },
                    default=str,
                )
            )
        return 0
    if getattr(args, "snippet", None):
        # highlighting: offset spans + snippet from the stored source col
        res = s.highlights(
            flt, k=args.k, source_col=args.snippet, score_round=6
        )
        for r in res.collect():
            print(
                json.dumps(
                    {
                        "rank": int(r["rank"]),
                        "url": r["url"],
                        "score": float(r["score"]),
                        "n_matches": int(r["n_matches"]),
                        "spans": [
                            [sp["start"], sp["length"]] for sp in r["spans"] or []
                        ],
                        "snippet": r["snippet"],
                    }
                )
            )
        return 0
    cols = tuple(
        c for c in (args.cols or "").split(",") if c
    )  # stored-column retrieval (columnstore surface)
    res = s.search_batch(
        {0: flt}, k=args.k, with_urls=True, score_round=6, with_cols=cols
    )
    for r in res.select("rank", "url", "score", *cols).collect():
        out = {"rank": int(r["rank"]), "url": r["url"], "score": float(r["score"])}
        out.update({c: (None if r[c] is None else str(r[c])) for c in cols})
        print(json.dumps(out))
    return 0


def cmd_mlt(args, spark) -> int:
    from iresearch_spark.query.executor import IndexSearcher

    s = IndexSearcher(spark, _open_store(args))
    res = s.more_like_this(
        args.url, k=args.k, max_query_terms=args.terms,
        field=args.field, source_col=args.source_col, score_round=6,
        min_tf=args.min_tf, min_df=args.min_df,
    )
    for r in res.collect():
        print(
            json.dumps(
                {
                    "rank": int(r["rank"]),
                    "url": r["url"],
                    "score": float(r["score"]),
                }
            )
        )
    return 0


def cmd_search_batch(args, spark) -> int:
    """Many queries from a file through ONE search_batch call (the
    reference's index-search harness shape: query file in, hits + QPS
    out). Lines are CLI-syntax queries; blank lines and '#' comments are
    skipped."""
    import time

    from iresearch_spark.query.executor import IndexSearcher

    with open(args.queries) as f:
        lines = [
            (i, ln.strip())
            for i, ln in enumerate(f)
            if ln.strip() and not ln.lstrip().startswith("#")
        ]
    batch = {
        qid: parse_query(q, field=args.field, require_all=args.all)
        for qid, q in lines
    }
    s = IndexSearcher(spark, _open_store(args), scorer=args.scorer)
    an = _field_analyzers(s.store, s.sid)
    batch = {qid: resolve_numeric_ranges(f, an) for qid, f in batch.items()}
    t0 = time.time()
    rows = s.search_batch(
        batch, k=args.k, with_urls=True, score_round=6
    ).collect()
    wall = time.time() - t0
    by_q = {qid: [] for qid, _ in lines}
    for r in rows:
        by_q[int(r["qid"])].append(
            {"rank": int(r["rank"]), "url": r["url"], "score": float(r["score"])}
        )
    for qid, q in lines:
        print(json.dumps({"query": q, "hits": by_q[qid]}))
    print(
        json.dumps(
            {
                "n_queries": len(lines),
                "wall_s": round(wall, 3),
                "qps": round(len(lines) / wall, 2) if wall else None,
            }
        )
    )
    return 0


def cmd_suggest(args, spark) -> int:
    """Prefix autocomplete from the term dictionary (df-ranked)."""
    from iresearch_spark.query.executor import IndexSearcher

    s = IndexSearcher(spark, _open_store(args))
    for r in s.suggest(args.prefix, k=args.k, field=args.field).collect():
        print(json.dumps({"term": r["term"], "df": int(r["df"])}))
    return 0


def cmd_stats(args, spark) -> int:
    store = _open_store(args)
    snap = store.snapshot()
    print(
        json.dumps(
            {
                "snapshot_id": snap["snapshot_id"],
                "stats": snap["stats"],
                "n_segments": len(snap["segments"]),
                "fields": [f["name"] for f in snap.get("fields", [])],
                "metrics": snap.get("metrics", {}),
                "operation": snap.get("operation"),
            }
        )
    )
    return 0


def cmd_consolidate(args, spark) -> int:
    from iresearch_spark.build import policy as pol

    policy = getattr(pol, f"consolidate_{args.policy}")
    kwargs = {}
    for opt in args.opt:
        k, _, v = opt.partition("=")
        kwargs[k] = float(v) if "." in v else int(v)
    sids = pol.consolidate(
        spark, _open_store(args), policy=policy, **kwargs
    )
    print(json.dumps({"merge_rounds": len(sids), "snapshot_ids": sids}))
    return 0


def cmd_delete(args, spark) -> int:
    from iresearch_spark.build.merge import delete_by_query

    flt = parse_query(args.query, field=args.field, require_all=args.all)
    store = _open_store(args)
    sid = delete_by_query(spark, store, flt)
    snap = store.snapshot(sid)
    # stats stay pre-delete until compaction (tombstone semantics): report
    # which segments gained masks; a later consolidate purges them
    masked = next(
        (ln["segments"] for ln in snap.get("lineage", []) if ln.get("operation") == "delete"),
        [],
    )
    print(json.dumps({"snapshot_id": sid, "masked_segments": masked}))
    return 0


def cmd_snapshots(args, _spark) -> int:
    """List the store's generations (Iceberg snapshot history)."""
    store = _open_store(args)
    out = []
    for sid in store.snapshots():
        snap = store.snapshot(sid)
        out.append(
            {
                "snapshot_id": sid,
                "operation": snap.get("operation"),
                "timestamp_ms": snap.get("timestamp_ms"),
                "n_segments": len(snap["segments"]),
                "n_docs": snap["stats"].get("n_docs"),
                "current": sid == store.current_snapshot_id(),
                **(
                    {"rolled_back_to": snap["rolled_back_to"]}
                    if "rolled_back_to" in snap
                    else {}
                ),
            }
        )
    print(json.dumps(out))
    return 0


def cmd_rollback(args, _spark) -> int:
    """Restore an older generation as a NEW snapshot (Iceberg
    rollback_to_snapshot; the reference abandoning a bad generation by
    reopening an older index_meta)."""
    store = _open_store(args)
    sid = store.rollback_to(args.to)
    print(json.dumps({"snapshot_id": sid, "restored": args.to}))
    return 0


def cmd_abort_staged(args, _spark) -> int:
    """Discard a staged-but-uncommitted build checkpoint
    (index_writer::rollback)."""
    store = _open_store(args)
    print(json.dumps({"discarded": store.abort_staged()}))
    return 0


def cmd_unlock(args, _spark) -> int:
    """Operator escape hatch for the single-writer lock: a live holder on
    THIS host is refused without --force (killing a running writer's lock
    corrupts no data — commits are atomic — but lets a second writer race
    the staging dir); dead/remote holders are removed."""
    import os
    import socket

    from iresearch_spark.store.snapshot import WriteLock

    lk = WriteLock(os.path.abspath(args.store))
    holder = lk._holder()
    if holder is None:
        print(json.dumps({"removed": False, "reason": "not locked"}))
        return 0
    alive_here = holder.get("host") == socket.gethostname() and lk._pid_alive(
        int(holder.get("pid", -1))
    )
    if alive_here and not args.force:
        print(
            json.dumps(
                {"removed": False, "reason": "holder alive on this host",
                 "holder": holder}
            )
        )
        return 1
    try:
        os.remove(lk.path)
    except FileNotFoundError:
        pass
    print(json.dumps({"removed": True, "holder": holder}))
    return 0


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(
        prog="iresearch_spark",
        description="index-put / index-search style utilities",
    )
    p.add_argument("--master", default=None, help="Spark master (default: session default)")
    keyp = argparse.ArgumentParser(add_help=False)
    keyp.add_argument(
        "--key", default=None,
        help="encryption passphrase (S9 at-rest AES-GCM; key derived "
        "via sha256)",
    )
    keyp.add_argument(
        "--key-hex", default=None,
        help="raw 16/24/32-byte AES key as hex (overrides --key)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", parents=[keyp], help="build an index from a parquet corpus")
    b.add_argument("--input", required=True)
    b.add_argument("--store", required=True)
    b.add_argument("--segments", type=int, default=8)
    b.add_argument("--append", action="store_true")
    b.add_argument(
        "--field",
        action="append",
        default=[],
        help="name[,source[,analyzer[,offsets[,payloads]]]] (repeatable)",
    )
    b.add_argument(
        "--stored", default="",
        help="comma-separated corpus columns persisted as stored user "
        "columns (columnstore; retrievable via --cols/--snippet/--facet)",
    )
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", parents=[keyp], help="BM25 top-k search")
    s.add_argument("--store", required=True)
    s.add_argument("query")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--field", default="text")
    s.add_argument("--all", action="store_true", help="AND clauses (default OR)")
    s.add_argument("--scorer", choices=("bm25", "tfidf"), default="bm25")
    s.add_argument(
        "--cols",
        default="",
        help="comma-separated stored doc columns to return with each hit",
    )
    s.add_argument(
        "--sorted", action="store_true",
        help="first-k matches in index (primary-sort) order, no scoring",
    )
    s.add_argument(
        "--facet", default=None, metavar="COL",
        help="facet the FULL match set by a stored doc column",
    )
    s.add_argument(
        "--snippet", default=None, metavar="COL",
        help="highlight: offset spans + snippet from stored column COL",
    )
    s.add_argument(
        "--collapse", default=None, metavar="COL",
        help="field collapsing: at most one hit per COL value (exact)",
    )
    s.add_argument(
        "--sort-by", dest="sort_by", default=None, metavar="COL[:desc]",
        help="query-time attribute sort: top-k matches by a stored doc "
        "column instead of BM25 (append :desc for descending)",
    )
    s.add_argument(
        "--explain", action="store_true",
        help="per-term score breakdown rows instead of plain hits",
    )
    s.add_argument(
        "--after", default=None, metavar="SCORE,URL",
        help="cursor pagination: the page after this (score, url) cursor "
        "(take both from the previous page's last hit)",
    )
    s.set_defaults(fn=cmd_search)

    sb = sub.add_parser(
        "search-batch", parents=[keyp],
        help="run a query file as one amortized batch",
    )
    sb.add_argument("--store", required=True)
    sb.add_argument("--queries", required=True, help="file, one query per line")
    sb.add_argument("-k", type=int, default=10)
    sb.add_argument("--field", default="text")
    sb.add_argument("--all", action="store_true")
    sb.add_argument("--scorer", choices=("bm25", "tfidf"), default="bm25")
    sb.set_defaults(fn=cmd_search_batch)

    m = sub.add_parser(
        "mlt", parents=[keyp],
        help="more-like-this: docs similar to a seed url (tf-idf term "
        "selection from its stored source text)",
    )
    m.add_argument("--store", required=True)
    m.add_argument("url")
    m.add_argument("-k", type=int, default=10)
    m.add_argument("--field", default="text")
    m.add_argument("--source-col", dest="source_col", default="text")
    m.add_argument("--terms", type=int, default=10, help="max query terms")
    # Lucene MLT's defaults: a seed doc's df=1 singletons are perfect
    # tf-idf scorers but match nobody else — filter them out up front
    m.add_argument("--min-tf", dest="min_tf", type=int, default=2)
    m.add_argument("--min-df", dest="min_df", type=int, default=5)
    m.set_defaults(fn=cmd_mlt)

    sg = sub.add_parser(
        "suggest", parents=[keyp],
        help="prefix autocomplete from the term dictionary (df-ranked)",
    )
    sg.add_argument("--store", required=True)
    sg.add_argument("prefix")
    sg.add_argument("-k", type=int, default=10)
    sg.add_argument("--field", default="text")
    sg.set_defaults(fn=cmd_suggest)

    st = sub.add_parser("stats", parents=[keyp], help="print current snapshot stats")
    st.add_argument("--store", required=True)
    st.set_defaults(fn=cmd_stats)

    c = sub.add_parser("consolidate", parents=[keyp], help="run a consolidation policy")
    c.add_argument("--store", required=True)
    c.add_argument(
        "--policy",
        default="tier",
        choices=("tier", "count", "bytes", "bytes_accum", "docs_live", "docs_fill"),
    )
    c.add_argument(
        "--opt",
        action="append",
        default=[],
        help="policy kwarg, e.g. --opt max_segments=4 (repeatable)",
    )
    c.set_defaults(fn=cmd_consolidate)

    d = sub.add_parser("delete", parents=[keyp], help="delete-by-query (tombstones)")
    d.add_argument("--store", required=True)
    d.add_argument("query")
    d.add_argument("--field", default="text")
    d.add_argument("--all", action="store_true")
    d.set_defaults(fn=cmd_delete)

    sn = sub.add_parser(
        "snapshots", parents=[keyp], help="list the index's generations"
    )
    sn.add_argument("--store", required=True)
    sn.set_defaults(fn=cmd_snapshots, no_spark=True)

    rb = sub.add_parser(
        "rollback", parents=[keyp],
        help="restore an older generation as a new snapshot",
    )
    rb.add_argument("--store", required=True)
    rb.add_argument("--to", type=int, required=True, help="target snapshot id")
    rb.set_defaults(fn=cmd_rollback, no_spark=True)

    ab = sub.add_parser(
        "abort-staged", parents=[keyp],
        help="discard a staged-but-uncommitted build checkpoint",
    )
    ab.add_argument("--store", required=True)
    ab.set_defaults(fn=cmd_abort_staged, no_spark=True)

    u = sub.add_parser(
        "unlock", help="force-remove a dead writer's write.lock"
    )
    u.add_argument("--store", required=True)
    u.add_argument(
        "--force",
        action="store_true",
        help="remove even if the holder looks alive on this host",
    )
    u.set_defaults(fn=cmd_unlock, no_spark=True)

    args = p.parse_args(argv)
    if getattr(args, "no_spark", False):
        return args.fn(args, None)
    own = spark is None
    if own:
        spark = _get_spark(args.master)
    try:
        return args.fn(args, spark)
    finally:
        if own:
            spark.stop()


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
