"""The analyzer family: frozen deterministic specs + vectorized kernels.

Mirrors the reference's analyzer registry ([up] core/analysis/analyzers.cpp;
SURVEY.md §2b A1-A6): each analyzer turns one stored value into a token
stream with positions. Specs are strings so they can live in the snapshot
manifest:

  "text"             A2 — NFKC + lower + [a-z0-9]+ runs − stopwords;
                     positions = post-filter sequential index
                     ([up] core/analysis/text_token_stream.cpp).
  "identity"         A1 — the whole value as one token at position 0
                     ([up] core/analysis/analyzers.cpp identity).
  "delimiter:<sep>"  A3 — split on the literal separator, drop empties,
                     no case folding; positions sequential
                     ([up] core/analysis/delimited_token_stream.cpp).
  "ngram:<min>,<max>" A4 — all char n-grams of each length in [min,max];
                     POSITION = START OFFSET in the value, so grams of
                     different lengths starting at the same offset share a
                     position (this is what makes by_same_position and
                     ngram phrase chains meaningful over ngram fields;
                     [up] core/analysis/ngram_token_stream.cpp).
  "segmentation"     A6 — frozen ICU-free UAX#29-lite word break for
                     mixed-script text ([up] core/analysis/
                     segmentation_token_stream.cpp role): NFKC + lower,
                     then (a) every CJK ideograph is its own token
                     (unigram), (b) maximal same-kind runs of Hiragana /
                     Katakana are tokens, (c) maximal runs of other
                     letters/marks/digits are tokens; everything else
                     breaks. Positions sequential, spans in the
                     normalized string.
  "a|b|..."          A5 — pipeline: each token of stage k feeds stage k+1;
                     final position = parent_pos * PIPE_STRIDE + child_pos
                     (packed pair, collision-free for tokens shorter than
                     PIPE_STRIDE; [up] core/analysis/
                     pipeline_token_stream.cpp composes offsets the same
                     conceptual way). SINGLETON stages (identity, stem —
                     exactly one output token at position 0 per input)
                     pass the parent position through unchanged, so e.g.
                     "text|stem" keeps 0..n-1 phrase-compatible positions.

  "stem"             A6 — frozen Porter-STYLE suffix stripper (see
                     stem_token below; deliberately simpler than Snowball
                     so the DuckDB oracle can replicate it with regexes);
                     usually used as the pipeline tail "text|stem"
                     ([up] core/analysis/stem_token_stream.cpp role).

Two implementations per spec, asserted equal by tests/test_analyzers.py:
  * analyze_one(value, spec)   — pure-Python reference (oracle side);
  * analyze_batch(series, spec) — vectorized (pandas/numpy) kernel used
    inside mapInArrow by the build pipeline: returns flat token/position
    arrays + per-row counts, no per-row Python on the text/ngram paths.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

from iresearch_spark.analysis.collation import (
    collation_key,
    collation_keys_batch,
    parse_collation_spec,
)
from iresearch_spark.analysis.numeric import (
    double_to_sortable,
    doubles_to_sortable_batch,
    numeric_terms,
    numeric_terms_batch,
    parse_numeric_spec_typed,
    shifts,
)
from iresearch_spark.analysis.tokenizer import STOPWORDS, _TOKEN_RE

PIPE_STRIDE = 4096  # position packing stride per pipeline level


# --------------------------------------------------------------- stemming

# Frozen Porter-style suffix table (applied ONCE, longest match first,
# with a minimum-stem-length guard). This is deliberately a small,
# regex-expressible subset of Porter so the DuckDB oracle can mirror it
# exactly; it is NOT Snowball.
STEM_RULES: tuple[tuple[str, str, int], ...] = (
    # (suffix, replacement, min remaining stem length)
    ("ational", "ate", 2),
    ("ization", "ize", 2),
    ("fulness", "ful", 2),
    ("ousness", "ous", 2),
    ("iveness", "ive", 2),
    ("tional", "tion", 2),
    ("biliti", "ble", 2),
    ("lessli", "less", 2),
    ("entli", "ent", 2),
    ("ation", "ate", 2),
    ("alism", "al", 2),
    ("aliti", "al", 2),
    ("ement", "e", 2),
    ("ments", "ment", 2),
    ("iviti", "ive", 2),
    ("ness", "", 3),
    ("ance", "", 3),
    ("ence", "", 3),
    ("able", "", 3),
    ("ible", "", 3),
    ("ment", "", 3),
    ("sses", "ss", 2),
    ("ies", "i", 2),
    ("ing", "", 3),
    ("eed", "ee", 2),
    ("edly", "", 3),
    ("ed", "", 3),
    ("ly", "", 3),
    ("er", "", 3),
    ("es", "e", 2),
    ("s", "", 3),
)


def stem_token(tok: str) -> str:
    """Apply the first matching rule (rules are ordered longest-first)."""
    for suf, rep, keep in STEM_RULES:
        if tok.endswith(suf) and len(tok) - len(suf) >= keep:
            return tok[: len(tok) - len(suf)] + rep
    return tok


def stem_sql_expr(var: str) -> str:
    """DuckDB CASE expression computing stem_token(var) — the oracle twin
    of the frozen rule table (rules applied in order, first match wins)."""
    parts = ["CASE"]
    for suf, rep, keep in STEM_RULES:
        cond = f"len({var}) - {len(suf)} >= {keep} AND {var} LIKE '%{suf}'"
        then = f"substr({var}, 1, len({var}) - {len(suf)})"
        if rep:
            then += f" || '{rep}'"
        parts.append(f"WHEN {cond} THEN {then}")
    parts.append(f"ELSE {var} END")
    return " ".join(parts)


def _stem_series(toks: pd.Series) -> pd.Series:
    """Vectorized-enough stemming: stem each UNIQUE token once."""
    uniq = pd.unique(toks)
    table = {u: stem_token(u) for u in uniq}
    return toks.map(table)


# ---------------------------------------------------- pure-Python reference


# --------------------------------------------------- minhash (A10) wrapper

def _md5_long_py(s: str) -> int:
    """Python twin of textops.common.md5_long / MD5_LONG_SQL: first 15 hex
    digits of md5 as a non-negative int (60 bits)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def parse_minhash(spec: str) -> tuple[int, str] | None:
    """Parse the A10 minhash WRAPPER spec `minhash:<k>(<inner>)` — e.g.
    "minhash:8(text)", "minhash:16(text|stem)". Unlike pipeline stages
    (which map token -> tokens), minhash consumes the inner analyzer's
    WHOLE stream and emits k signature tokens, mirroring the reference's
    analyzer-wrapping MinHash token stream ([up]
    core/analysis/minhash_token_stream.cpp: wraps a stored analyzer
    definition, emits numHashes min-hash terms). Returns (k, inner spec)
    or None when `spec` is not a minhash spec."""
    if not spec.startswith("minhash:"):
        return None
    body = spec[len("minhash:"):]
    i = body.find("(")
    if i <= 0 or not body.endswith(")"):
        raise ValueError(f"malformed minhash spec: {spec!r}")
    k = int(body[:i])
    if k < 1:
        raise ValueError(f"minhash k must be >= 1: {spec!r}")
    inner = body[i + 1 : -1]
    if not inner:
        raise ValueError(f"minhash spec needs an inner analyzer: {spec!r}")
    return k, inner


def _minhash_terms(tokens: set[str], k: int) -> list[str]:
    """Signature token i = "i:" + min over distinct inner tokens t of
    md5_long("i:" + t) — the SAME seeded hash family as textops.dedup's
    MinHash (so the DuckDB twin is list_min(list_transform(...)))."""
    out = []
    for i in range(k):
        pfx = f"{i}:"
        m = min(_md5_long_py(pfx + t) for t in tokens)
        out.append(f"{i}:{m}")
    return out


def parse_spec(spec: str) -> list[str]:
    # stages are NOT stripped: "delimiter: " legitimately splits on space
    stages = [s for s in spec.split("|") if s]
    if not stages:
        raise ValueError(f"empty analyzer spec: {spec!r}")
    return stages


# ------------------------------------------------- segmentation (A6)

# frozen code-point classes for the UAX#29-lite word break
_SEG_BREAK, _SEG_WORD, _SEG_HAN, _SEG_HIRA, _SEG_KATA = 0, 1, 2, 3, 4


def _seg_class(cp: int) -> int:
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF or 0xF900 <= cp <= 0xFAFF:
        return _SEG_HAN
    if 0x3040 <= cp <= 0x309F:
        return _SEG_HIRA
    if 0x30A0 <= cp <= 0x30FF:
        return _SEG_KATA
    if unicodedata.category(chr(cp))[0] in ("L", "M", "N"):
        return _SEG_WORD
    return _SEG_BREAK


def _segment_one(value: str) -> list[tuple[str, int, int, int]]:
    """Pure-Python twin of the frozen segmentation spec: [(token, pos,
    start, length)] over the NFKC-lowercased value."""
    norm = unicodedata.normalize("NFKC", value).lower()
    out: list[tuple[str, int, int, int]] = []
    pos = 0
    i, n = 0, len(norm)
    while i < n:
        c = _seg_class(ord(norm[i]))
        if c == _SEG_BREAK:
            i += 1
            continue
        if c == _SEG_HAN:
            out.append((norm[i], pos, i, 1))
            pos += 1
            i += 1
            continue
        j = i + 1
        while j < n and _seg_class(ord(norm[j])) == c:
            j += 1
        out.append((norm[i:j], pos, i, j - i))
        pos += 1
        i = j
    return out


def _batch_segmentation(values: pd.Series):
    """Vectorized segmentation: one UTF-32 buffer over the joined rows,
    code-point classes resolved per UNIQUE code point, run boundaries by
    mask arithmetic — no per-char Python."""
    norm = values.fillna("").astype(str).str.normalize("NFKC").str.lower()
    joined = "\n".join(norm.tolist())
    buf = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    n_rows = len(norm)
    if len(buf) == 0:
        z = np.empty(0, dtype=np.int64)
        return (
            np.empty(0, dtype=object),
            np.zeros(n_rows, dtype=np.int64),
            z, z.copy(), z.copy(),
        )
    uniq, inv = np.unique(buf, return_inverse=True)
    cls_u = np.fromiter(
        (_seg_class(int(cp)) for cp in uniq), count=len(uniq), dtype=np.int8
    )
    cls = cls_u[inv]
    # run starts: class change, HAN always starts (unigram), row boundary
    prev_cls = np.empty_like(cls)
    prev_cls[0] = _SEG_BREAK
    prev_cls[1:] = cls[:-1]
    row_lens = norm.str.len().to_numpy(np.int64)
    row_starts_buf = np.cumsum(row_lens + 1) - (row_lens + 1)
    at_row_start = np.zeros(len(buf), dtype=bool)
    at_row_start[row_starts_buf] = True
    is_tok = cls != _SEG_BREAK
    new_run = is_tok & (
        (cls != prev_cls) | (cls == _SEG_HAN) | at_row_start
    )
    run_s = np.flatnonzero(new_run)
    if len(run_s) == 0:
        z = np.empty(0, dtype=np.int64)
        return (
            np.empty(0, dtype=object),
            np.zeros(n_rows, dtype=np.int64),
            z, z.copy(), z.copy(),
        )
    # end of run k = first index > run_s[k] that is a break or a new run
    boundary = np.flatnonzero(~is_tok | new_run)
    run_e = np.empty(len(run_s), dtype=np.int64)
    ins = np.searchsorted(boundary, run_s, side="right")
    run_e[:] = np.where(
        ins < len(boundary), boundary[np.minimum(ins, len(boundary) - 1)], len(buf)
    )
    owner = np.searchsorted(row_starts_buf, run_s, side="right") - 1
    starts = run_s - row_starts_buf[owner]
    lens = run_e - run_s
    # token strings: slice the joined python string (C-level slicing)
    flat = np.array(
        [joined[s:e] for s, e in zip(run_s.tolist(), run_e.tolist())],
        dtype=object,
    )
    counts = np.bincount(owner, minlength=n_rows).astype(np.int64)
    kstarts = np.cumsum(counts) - counts
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(kstarts, counts)
    return flat, counts, pos, starts, lens


def _one_stage(value: str | None, stage: str) -> list[tuple[str, int, int, int]]:
    """[(token, position, span start, span length)] for one stage.

    Spans (A8 offset attribute) address the stage's INPUT string — for the
    text stage, the NFKC-lowercased text (identical to the raw text for
    ASCII input)."""
    if value is None:
        return []
    if stage == "text":
        norm = unicodedata.normalize("NFKC", value).lower()
        out = []
        pos = 0
        for m in _TOKEN_RE.finditer(norm):
            if m.group(0) in STOPWORDS:
                continue
            out.append((m.group(0), pos, m.start(), m.end() - m.start()))
            pos += 1
        return out
    if stage == "identity":
        return [(value, 0, 0, len(value))]
    if stage.startswith("delimiter:"):
        sep = stage[len("delimiter:") :]
        out = []
        pos = 0
        at = 0
        for part in value.split(sep):
            if part:
                out.append((part, pos, at, len(part)))
                pos += 1
            at += len(part) + len(sep)
        return out
    if stage.startswith("ngram:"):
        lo, hi = (int(x) for x in stage[len("ngram:") :].split(","))
        out = []
        for n in range(lo, hi + 1):
            for i in range(0, len(value) - n + 1):
                out.append((value[i : i + n], i, i, n))
        return out
    if stage == "stem":
        return [(stem_token(value), 0, 0, len(value))]
    if stage == "segmentation":
        return _segment_one(value)
    if (_cloc := parse_collation_spec(stage)) is not None:
        # A6 collation ([up] core/analysis/collation_token_stream.cpp):
        # the whole value becomes one locale-sort-key term
        return [(collation_key(value, _cloc), 0, 0, len(value))]
    nspec = parse_numeric_spec_typed(stage)
    if nspec is not None:
        # A7 numeric token stream ([up] core/analysis/token_streams.hpp ::
        # numeric_token_stream): one term per precision level, all spanning
        # the whole input; position = level index (positions are
        # meaningless for numeric terms — phrase queries don't apply).
        # The double variant maps through the sortable bit pattern first.
        step, dtype = nspec
        sv = value.strip()
        if not sv:
            return []
        v = double_to_sortable(float(sv)) if dtype == "f64" else int(sv)
        return [
            (t, i, 0, len(value))
            for i, t in enumerate(numeric_terms(v, step))
        ]
    raise ValueError(f"unknown analyzer stage: {stage!r}")


def _is_singleton_stage(stage: str) -> bool:
    """Stages that always emit exactly one token at position 0 per input —
    their pipeline output keeps the PARENT's position."""
    return stage in ("identity", "stem") or stage.startswith("collation:")


def analyze_one_spans(
    value: str | None, spec: str
) -> list[tuple[str, int, int, int]]:
    """Reference implementation: [(token, position, span start, span
    length)] for one value. Spans address the top-level input value;
    pipeline stages compose child start + parent start, singleton stages
    keep the parent's span."""
    mh = parse_minhash(spec)
    if mh is not None:
        k, inner = mh
        toks = {t for t, _p in analyze_one(value, inner)}
        if not toks:
            return []
        return [
            (t, i, 0, len(value or ""))
            for i, t in enumerate(_minhash_terms(toks, k))
        ]
    stages = parse_spec(spec)
    stream: list[tuple[str, int, int, int]] = (
        [(value, 0, 0, len(value))] if value is not None else []
    )
    first = True
    for stage in stages:
        singleton = _is_singleton_stage(stage)
        nxt: list[tuple[str, int, int, int]] = []
        for tok, pos, start, length in stream:
            children = _one_stage(tok, stage)
            if first:
                nxt.extend(children)
            elif singleton:
                nxt.extend((ctok, pos, start, length) for ctok, _p, _s, _l in children)
            else:
                for ctok, cpos, cstart, clen in children:
                    nxt.append(
                        (
                            ctok,
                            pos * PIPE_STRIDE + min(cpos, PIPE_STRIDE - 1),
                            start + cstart,
                            clen,
                        )
                    )
        stream = nxt
        first = False
    return stream


def analyze_one(value: str | None, spec: str) -> list[tuple[str, int]]:
    """Reference implementation: [(token, position)] for one value."""
    return [(t, p) for t, p, _s, _l in analyze_one_spans(value, spec)]


def analyze_one_payloads(
    value: str | None, spec: str
) -> list[tuple[str, int, int, int, str]]:
    """Reference implementation with the A8 payload attribute: [(token,
    position, span start, span length, payload)]. The payload is the
    occurrence's SURFACE FORM — the token fed into the final pipeline
    stage (singleton stages like stem keep the parent's token, exactly as
    they keep the parent's span), so e.g. "text|stem" stores the pre-stem
    word each posting came from ([up] token_attributes.hpp :: payload)."""
    if parse_minhash(spec) is not None:
        # a signature token has no surface occurrence; it IS its payload
        return [
            (t, p, s, ln, t) for t, p, s, ln in analyze_one_spans(value, spec)
        ]
    stages = parse_spec(spec)
    stream: list[tuple[str, int, int, int, str]] = (
        [(value, 0, 0, len(value), value)] if value is not None else []
    )
    first = True
    for stage in stages:
        singleton = _is_singleton_stage(stage)
        nxt: list[tuple[str, int, int, int, str]] = []
        for tok, pos, start, length, surf in stream:
            children = _one_stage(tok, stage)
            for ctok, cpos, cstart, clen in children:
                if first:
                    npos, nstart, nlen = cpos, cstart, clen
                elif singleton:
                    npos, nstart, nlen = pos, start, length
                else:
                    npos = pos * PIPE_STRIDE + min(cpos, PIPE_STRIDE - 1)
                    nstart, nlen = start + cstart, clen
                nsurf = surf if singleton else ctok
                nxt.append((ctok, npos, nstart, nlen, nsurf))
        stream = nxt
        first = False
    return stream


# ------------------------------------------------------- vectorized kernels


def _flatten_lists(lists: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    counts = lists.str.len().fillna(0).to_numpy(np.int64)
    total = int(counts.sum())
    if total:
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in lists if isinstance(t, list) and t]
        )
    else:
        flat = np.empty(0, dtype=object)
    return flat, counts


def _batch_text(values: pd.Series, with_spans: bool = True):
    norm = values.fillna("").astype(str).str.normalize("NFKC").str.lower()
    tok_lists = norm.str.findall(_TOKEN_RE)
    flat, counts = _flatten_lists(tok_lists)
    if with_spans and len(flat):
        # spans via a char-class mask over the concatenated UTF-32 buffer;
        # rows joined with '\n' (never a token char) so runs cannot cross
        # row boundaries. Run order == findall order.
        joined = "\n".join(norm.tolist())
        buf = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        is_tok = ((buf >= 0x61) & (buf <= 0x7A)) | ((buf >= 0x30) & (buf <= 0x39))
        prev = np.concatenate(([False], is_tok[:-1]))
        nxt = np.concatenate((is_tok[1:], [False]))
        run_s = np.flatnonzero(is_tok & ~prev)
        run_e = np.flatnonzero(is_tok & ~nxt) + 1
        row_lens = norm.str.len().to_numpy(np.int64)
        row_starts = np.cumsum(row_lens + 1) - (row_lens + 1)
        owner_r = np.searchsorted(row_starts, run_s, side="right") - 1
        all_starts = run_s - row_starts[owner_r]
        all_lens = run_e - run_s
    else:
        all_starts = np.zeros(len(flat), dtype=np.int64)
        all_lens = np.zeros(len(flat), dtype=np.int64)
    # stopword filter via factorize: one membership test per UNIQUE token
    codes, uniq = pd.factorize(flat, sort=False)
    stop = STOPWORDS
    is_stop_u = np.fromiter(
        (u in stop for u in np.asarray(uniq, dtype=object)),
        count=len(uniq),
        dtype=bool,
    )
    keep = ~is_stop_u[codes] if len(codes) else np.empty(0, bool)
    owner = np.repeat(np.arange(len(values), dtype=np.int64), counts)[keep]
    flat = flat[keep]
    starts, lens = all_starts[keep], all_lens[keep]
    kcounts = np.bincount(owner, minlength=len(values)).astype(np.int64)
    kstarts = np.cumsum(kcounts) - kcounts
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(kstarts, kcounts)
    return flat, kcounts, pos, starts, lens


def _batch_identity(values: pd.Series):
    notna = values.notna().to_numpy()
    flat = values.to_numpy(dtype=object)[notna]
    counts = notna.astype(np.int64)
    lens = np.fromiter((len(v) for v in flat), count=len(flat), dtype=np.int64)
    z = np.zeros(len(flat), dtype=np.int64)
    return flat, counts, z, z.copy(), lens


def _batch_delimiter(values: pd.Series, sep: str):
    lists = values.fillna("").astype(str).str.split(re.escape(sep), regex=True)
    flat, counts = _flatten_lists(lists)  # includes empty parts
    if len(flat):
        part_lens = np.fromiter((len(v) for v in flat), count=len(flat), dtype=np.int64)
        idx_in_row = np.arange(len(flat), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        cum = np.cumsum(part_lens)
        row_first = np.cumsum(counts) - counts
        base = np.repeat(cum[row_first] - part_lens[row_first], counts)
        all_starts = (cum - part_lens - base) + idx_in_row * len(sep)
    else:
        part_lens = all_starts = np.empty(0, dtype=np.int64)
    nonempty = flat != "" if len(flat) else np.empty(0, bool)
    owner = np.repeat(np.arange(len(values), dtype=np.int64), counts)[nonempty]
    flat = flat[nonempty]
    starts, lens = all_starts[nonempty], part_lens[nonempty]
    kcounts = np.bincount(owner, minlength=len(values)).astype(np.int64)
    kstarts = np.cumsum(kcounts) - kcounts
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(kstarts, kcounts)
    return flat, kcounts, pos, starts, lens


def _batch_ngram(values: pd.Series, lo: int, hi: int):
    """All char n-grams per value, fully vectorized: the batch's values are
    concatenated into one UTF-32 buffer; each gram length is a stride-
    tricks window over it, materialized as fixed-width numpy strings —
    no per-row Python. Span = (start offset, n)."""
    s = values.fillna("").astype(str)
    lens = s.str.len().to_numpy(np.int64)
    joined = "".join(s.tolist())
    buf = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    starts = np.cumsum(lens) - lens
    n_rows = len(s)
    flat_parts, pos_parts, owner_parts, len_parts = [], [], [], []
    for n in range(lo, hi + 1):
        cnt_n = np.maximum(lens - n + 1, 0)
        if cnt_n.sum() == 0 or len(buf) < n:
            continue
        win = np.lib.stride_tricks.sliding_window_view(buf, n)
        # window index w starts a gram of row r iff w in
        # [starts[r], starts[r] + cnt_n[r])
        w_idx = np.repeat(starts, cnt_n) + (
            np.arange(int(cnt_n.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(cnt_n) - cnt_n, cnt_n)
        )
        grams = (
            np.ascontiguousarray(win[w_idx]).view(f"<U{n}").reshape(-1)
        ).astype(object)
        flat_parts.append(grams)
        pos_parts.append(w_idx - np.repeat(starts, cnt_n))
        owner_parts.append(np.repeat(np.arange(n_rows, dtype=np.int64), cnt_n))
        len_parts.append(np.full(len(grams), n, dtype=np.int64))
    if not flat_parts:
        z = np.empty(0, dtype=np.int64)
        return (
            np.empty(0, dtype=object),
            np.zeros(n_rows, dtype=np.int64),
            z, z.copy(), z.copy(),
        )
    flat = np.concatenate(flat_parts)
    pos = np.concatenate(pos_parts)
    owner = np.concatenate(owner_parts)
    glens = np.concatenate(len_parts)
    # canonical emission order: by (owner, then length-major as appended) —
    # order is irrelevant downstream (the build lexsorts), but counts must
    # be per owner
    order = np.argsort(owner, kind="stable")
    flat, pos, owner, glens = flat[order], pos[order], owner[order], glens[order]
    counts = np.bincount(owner, minlength=n_rows).astype(np.int64)
    return flat, counts, pos, pos.copy(), glens


def _batch_stage(values: pd.Series, stage: str):
    if stage == "text":
        return _batch_text(values)
    if stage == "identity":
        return _batch_identity(values)
    if stage.startswith("delimiter:"):
        return _batch_delimiter(values, stage[len("delimiter:") :])
    if stage.startswith("ngram:"):
        lo, hi = (int(x) for x in stage[len("ngram:") :].split(","))
        return _batch_ngram(values, lo, hi)
    if stage == "stem":
        flat, counts, pos, starts, lens = _batch_identity(values)
        stemmed = _stem_series(pd.Series(flat, dtype=object)).to_numpy(object)
        return stemmed, counts, pos, starts, lens
    if stage == "segmentation":
        return _batch_segmentation(values)
    if (_cloc := parse_collation_spec(stage)) is not None:
        return collation_keys_batch(values, _cloc)
    nspec = parse_numeric_spec_typed(stage)
    if nspec is not None:
        return _batch_numeric(values, *nspec)
    raise ValueError(f"unknown analyzer stage: {stage!r}")


def _batch_numeric(values: pd.Series, step: int, dtype: str = "i64"):
    """Vectorized A7 numeric token stream: sign-flip + per-level shift are
    pure uint64 numpy; term strings come from numpy's own decimal
    formatting (no per-row Python). Null/blank rows emit no tokens;
    non-numeric input raises (the reference's numeric stream is typed).
    dtype "f64" first maps values through the sortable double bit
    pattern (order-preserving float64 -> int64)."""
    raw = values.fillna("").astype(str)
    sv = raw.str.strip()
    mask = (sv != "").to_numpy()
    kept = sv.to_numpy(dtype=object)[mask]
    if dtype == "f64":
        ints = doubles_to_sortable_batch(kept.astype(np.float64))
    else:
        ints = kept.astype(np.int64)
    nlev = len(shifts(step))
    terms = numeric_terms_batch(ints, step)
    counts = np.where(mask, nlev, 0).astype(np.int64)
    pos = np.tile(np.arange(nlev, dtype=np.int64), int(mask.sum()))
    starts = np.zeros(len(terms), dtype=np.int64)
    lens = np.repeat(raw.str.len().to_numpy(np.int64)[mask], nlev)
    return terms, counts, pos, starts, lens


def _batch_minhash(values: pd.Series, k: int, inner: str):
    """Vectorized A10 minhash: the inner stream's UNIQUE tokens are hashed
    once per (seed, unique token) — dictionary-sized Python md5 work, like
    the reference hashing its wrapped stream's terms — then every row's
    per-seed minimum falls out of one np.minimum.reduceat per seed over
    the factorized token array. Rows with an empty inner stream emit no
    signature."""
    import hashlib

    flat, counts, _pos = analyze_batch(values, inner)
    n_rows = len(counts)
    nz = counts > 0
    if not nz.any():
        z = np.empty(0, dtype=np.int64)
        return (
            np.empty(0, dtype=object),
            np.zeros(n_rows, dtype=np.int64),
            z, z.copy(), z.copy(),
            np.empty(0, dtype=object),
        )
    codes, uniq = pd.factorize(flat, sort=False)
    uniq_b = [str(u).encode() for u in uniq]
    offsets = (np.cumsum(counts) - counts)[nz]
    sig = np.empty((int(nz.sum()), k), dtype=np.int64)
    for i in range(k):
        pfx = f"{i}:".encode()
        htab = np.fromiter(
            (
                int(hashlib.md5(pfx + tb).hexdigest()[:15], 16)
                for tb in uniq_b
            ),
            count=len(uniq_b),
            dtype=np.int64,
        )
        sig[:, i] = np.minimum.reduceat(htab[codes], offsets)
    terms = np.array(
        [f"{i}:{v}" for row in sig for i, v in enumerate(row)], dtype=object
    )
    out_counts = np.where(nz, k, 0).astype(np.int64)
    pos = np.tile(np.arange(k, dtype=np.int64), int(nz.sum()))
    starts = np.zeros(len(terms), dtype=np.int64)
    lens = np.repeat(
        values.fillna("").astype(str).str.len().to_numpy(np.int64)[nz], k
    )
    return terms, out_counts, pos, starts, lens, terms.copy()


def analyze_batch_payloads(values: pd.Series, spec: str):
    """Vectorized analyzer with A8 spans AND payloads: (flat tokens,
    per-row counts, positions, span starts, span lengths, surfaces).
    `surfaces` is an object array aligned with the tokens carrying each
    occurrence's surface form (see analyze_one_payloads)."""
    mh = parse_minhash(spec)
    if mh is not None:
        return _batch_minhash(values, *mh)
    stages = parse_spec(spec)
    flat, counts, pos, starts, lens = _batch_stage(values, stages[0])
    if _is_singleton_stage(stages[0]):
        # singleton first stage: ≤1 token per non-null value; the surface
        # is the raw input value (the parent token)
        surface = values.to_numpy(dtype=object)[values.notna().to_numpy()]
    else:
        surface = np.asarray(flat, dtype=object)
    for stage in stages[1:]:
        # feed each token of the previous stage through the next one;
        # vectorization carries over because the flattened token array is
        # just another series
        c_flat, c_counts, c_pos, c_start, c_len = _batch_stage(
            pd.Series(flat, dtype=object), stage
        )
        parent_pos = np.repeat(pos, c_counts)
        parent_start = np.repeat(starts, c_counts)
        parent_len = np.repeat(lens, c_counts)
        if _is_singleton_stage(stage):
            new_pos, new_start, new_len = parent_pos, parent_start, parent_len
            new_surface = np.repeat(surface, c_counts)
        else:
            new_pos = parent_pos * PIPE_STRIDE + np.minimum(c_pos, PIPE_STRIDE - 1)
            new_start = parent_start + c_start
            new_len = c_len
            new_surface = np.asarray(c_flat, dtype=object)
        # regroup child counts to original rows
        owner_tok = np.repeat(
            np.arange(len(flat), dtype=np.int64), c_counts
        )  # child -> parent token
        tok_row = np.repeat(
            np.arange(len(counts), dtype=np.int64), counts
        )  # parent token -> row
        new_counts = (
            np.bincount(tok_row[owner_tok], minlength=len(counts)).astype(np.int64)
            if len(owner_tok)
            else np.zeros(len(counts), dtype=np.int64)
        )
        flat, counts = c_flat, new_counts
        pos, starts, lens = new_pos, new_start, new_len
        surface = new_surface
    return flat, counts, pos, starts, lens, surface


def analyze_batch_spans(values: pd.Series, spec: str):
    """Vectorized analyzer with A8 spans: (flat tokens, per-row counts,
    positions, span starts, span lengths). Spans address the top-level
    input value (pipeline stages compose: child start + parent start;
    singleton stages keep the parent's span)."""
    flat, counts, pos, starts, lens, _surf = analyze_batch_payloads(values, spec)
    return flat, counts, pos, starts, lens


def analyze_batch(values: pd.Series, spec: str):
    """Vectorized analyzer: (flat tokens, per-row counts, positions)."""
    flat, counts, pos, _s, _l = analyze_batch_spans(values, spec)
    return flat, counts, pos


# ------------------------------------------------- arrow-native text path


def text_tokenize_arrow(arr, with_spans: bool = False):
    """The build-pipeline fast path for the plain "text" analyzer: token
    extraction stays entirely in Arrow C++ (utf8_lower +
    split_pattern_regex + dictionary_encode + filter) — no per-token
    Python objects, which is what makes 32 concurrent workers scale on
    memory bandwidth instead of allocator churn. Falls back to the pandas
    kernel when the batch contains non-ASCII (NFKC needed).

    Returns (flat: pa.StringArray, counts, pos, starts, lens) — spans are
    zero arrays unless with_spans.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    n = len(arr)
    if not pc.all(pc.string_is_ascii(arr)).as_py():
        s = arr.to_pandas()
        flat, counts, pos, starts, lens = _batch_text(s, with_spans)
        return pa.array(flat, pa.string()), counts, pos, starts, lens
    low = pc.utf8_lower(arr)
    splits = pc.split_pattern_regex(low, "[^a-z0-9]+")
    flat_all = splits.values
    if isinstance(flat_all, pa.ChunkedArray):  # pragma: no cover
        flat_all = flat_all.combine_chunks()
    offs = np.frombuffer(splits.buffers()[1], dtype=np.int32)[
        splits.offset : splits.offset + n + 1
    ].astype(np.int64)
    counts_all = np.diff(offs)
    # stopword + empty filter: one Python membership test per UNIQUE token
    denc = flat_all.dictionary_encode()
    codes = denc.indices.to_numpy()
    uniq = denc.dictionary.to_pylist()
    stop = STOPWORDS
    keep_u = np.fromiter(
        ((u != "") and (u not in stop) for u in uniq), count=len(uniq), dtype=bool
    )
    keep = keep_u[codes] if len(codes) else np.empty(0, bool)
    owner = np.repeat(np.arange(n, dtype=np.int64), counts_all)[keep]
    kept = flat_all.filter(pa.array(keep))
    kcounts = np.bincount(owner, minlength=n).astype(np.int64)
    kstarts = np.cumsum(kcounts) - kcounts
    pos = np.arange(len(kept), dtype=np.int64) - np.repeat(kstarts, kcounts)
    if with_spans and len(kept):
        # ASCII: utf8 byte offsets == char offsets. Runs over the value
        # buffer, broken at row boundaries.
        lbuf = low.combine_chunks() if isinstance(low, pa.ChunkedArray) else low
        v_off = np.frombuffer(lbuf.buffers()[1], dtype=np.int32)[
            lbuf.offset : lbuf.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(lbuf.buffers()[2] or b"", dtype=np.uint8)[
            v_off[0] : v_off[-1]
        ]
        v_off = v_off - v_off[0]
        is_tok = ((data >= 0x61) & (data <= 0x7A)) | (
            (data >= 0x30) & (data <= 0x39)
        )
        at_row_start = np.zeros(len(data) + 1, dtype=bool)
        at_row_start[v_off[:-1]] = True
        prev = np.concatenate(([False], is_tok[:-1]))
        prev[at_row_start[: len(data)]] = False
        nxt = np.concatenate((is_tok[1:], [False]))
        nxt[at_row_start[1 : len(data) + 1]] = False
        run_s = np.flatnonzero(is_tok & ~prev)
        run_e = np.flatnonzero(is_tok & ~nxt) + 1
        owner_r = np.searchsorted(v_off, run_s, side="right") - 1
        all_starts = run_s - v_off[owner_r]
        all_lens = run_e - run_s
        # runs correspond 1:1 (in order) to the NON-EMPTY split tokens;
        # apply the stopword keep mask restricted to those
        nonempty_u = np.fromiter(
            (u != "" for u in uniq), count=len(uniq), dtype=bool
        )
        ne_idx = np.flatnonzero(nonempty_u[codes])
        assert len(ne_idx) == len(all_starts), (len(ne_idx), len(all_starts))
        sel = keep[ne_idx]
        starts, lens = all_starts[sel], all_lens[sel]
    else:
        starts = np.zeros(len(kept), dtype=np.int64)
        lens = np.zeros(len(kept), dtype=np.int64)
    return kept, kcounts, pos, starts, lens
