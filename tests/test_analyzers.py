"""Analyzer family (SURVEY.md §2b A1-A6): the vectorized batch kernels must
agree token-for-token (and position-for-position) with the pure-Python
reference spec, and the stem rule table must agree with its DuckDB SQL twin.
No Spark needed — these are pure kernel tests (mirroring the per-analyzer
suites of [up] tests/analysis/)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from iresearch_spark.analysis.analyzers import (
    PIPE_STRIDE,
    analyze_batch,
    analyze_one,
    stem_sql_expr,
    stem_token,
)

VALUES = [
    "Hello, World of data",
    "cc-main-2024-10",
    "",
    None,
    "ab",
    "table scan hash join",
    "a-b--c-",
    "xyz",
    "the quick brown ordering",
    "ABBA abba",
    "s",
]

SPECS = [
    "text",
    "identity",
    "delimiter:-",
    "delimiter: ",
    "ngram:2,3",
    "ngram:1,1",
    "delimiter:-|ngram:2,2",
    "delimiter: |stem",
    "text|stem",
    "delimiter: |identity",
    "minhash:4(text)",
    "minhash:1(delimiter: )",
    "minhash:8(text|stem)",
]


def _regroup(flat, counts, pos):
    out, k = [], 0
    for c in counts:
        out.append([(flat[k + i], int(pos[k + i])) for i in range(c)])
        k += c
    return out


@pytest.mark.parametrize("spec", SPECS)
def test_batch_matches_reference(spec):
    flat, counts, pos = analyze_batch(pd.Series(VALUES, dtype=object), spec)
    got = _regroup(flat, counts, pos)
    for v, g in zip(VALUES, got):
        ref = analyze_one(v, spec)
        assert sorted(g) == sorted(ref), (spec, v, g, ref)


def test_ngram_positions_are_start_offsets():
    """A4: grams of different lengths starting at the same offset share the
    position — the property by_same_position exploits over ngram fields."""
    toks = analyze_one("abc", "ngram:2,3")
    assert ("ab", 0) in toks and ("abc", 0) in toks and ("bc", 1) in toks


def test_pipeline_positions_pack_parent_and_child():
    toks = analyze_one("ab-cd", "delimiter:-|ngram:2,2")
    assert ("ab", 0) in toks
    assert ("cd", PIPE_STRIDE) in toks  # parent pos 1, child offset 0


def test_singleton_stage_keeps_parent_positions():
    """identity/stem emit one token per input -> positions pass through,
    keeping "text|stem" phrase-compatible."""
    toks = analyze_one("table ordering filter", "text|stem")
    assert toks == [("table", 0), ("order", 1), ("filt", 2)]


def test_stem_rules_examples():
    assert stem_token("ordering") == "order"  # 'ing' rule, applied once
    cases = {
        "running": "runn",
        "caresses": "caress",
        "ponies": "poni",
        "agreed": "agree",
        "filter": "filt",
        "order": "ord",
        "table": "table",
        # min-stem guards block the long-suffix rules; shorter ones apply
        "sses": "sse",
        "ness": "nes",
    }
    for w, want in cases.items():
        assert stem_token(w) == want, w


def test_stem_sql_twin_matches_python():
    import duckdb

    words = sorted(
        {
            w
            for v in VALUES
            if v
            for w in v.lower().replace("-", " ").split()
        }
        | set(
            "running caresses ponies agreed filter order table ordering "
            "rational nationalization hopefulness happiness abatement "
            "cats dogs es s a ab abc conditional".split()
        )
    )
    con = duckdb.connect()
    expr = stem_sql_expr("w")
    got = dict(
        con.execute(
            f"SELECT w, {expr} FROM (SELECT unnest(?) AS w)", [words]
        ).fetchall()
    )
    for w in words:
        assert got[w] == stem_token(w), w


def test_batch_ngram_empty_and_short():
    flat, counts, pos = analyze_batch(
        pd.Series(["", "a", None], dtype=object), "ngram:2,3"
    )
    assert counts.tolist() == [0, 0, 0] and len(flat) == 0


def test_batch_is_vectorized_over_large_input():
    vals = pd.Series([f"prefix-{i}-suffix" for i in range(5000)], dtype=object)
    flat, counts, pos = analyze_batch(vals, "ngram:3,3")
    assert counts.sum() == len(flat)
    assert (counts == np.char.str_len(vals.to_numpy(str)) - 2).all()


# ---------------------------------------------------------- A6 segmentation

SEG_VALUES = [
    "Hello, World",                      # plain ASCII with a break char
    "日本語のテキストです",                  # CJK unigrams + kana runs
    "Spark入門ガイド2024",                  # mixed script + digits
    "",                                  # empty
    None,                                # null
    "ＦｕｌｌＷｉｄｔｈ１２３",               # NFKC folds fullwidth forms
    "καλημέρα κόσμε",                    # Greek (generic letter runs)
    "a漢b",                              # alternating 1-char runs
    "　 \t\n",                           # whitespace only
    "ひらがなカタカナ混在",                  # hira run | kata run | CJK
]


@pytest.mark.parametrize("spec", ["segmentation", "segmentation|stem"])
def test_segmentation_batch_matches_reference(spec):
    from iresearch_spark.analysis.analyzers import (
        analyze_batch_spans,
        analyze_one_spans,
    )

    flat, counts, pos, sts, lns = analyze_batch_spans(
        pd.Series(SEG_VALUES, dtype=object), spec
    )
    k = 0
    for row, v in enumerate(SEG_VALUES):
        ref = analyze_one_spans(v, spec)
        c = int(counts[row])
        got = [
            (flat[k + i], int(pos[k + i]), int(sts[k + i]), int(lns[k + i]))
            for i in range(c)
        ]
        k += c
        assert got == ref, (spec, v, got, ref)


def test_segmentation_spec_frozen_examples():
    """Frozen-spec goldens: CJK unigrams, same-kind kana runs, NFKC fold,
    spans addressing the normalized string."""
    from iresearch_spark.analysis.analyzers import analyze_one_spans

    assert analyze_one_spans("日本語のテキスト", "segmentation") == [
        ("日", 0, 0, 1),
        ("本", 1, 1, 1),
        ("語", 2, 2, 1),
        ("の", 3, 3, 1),
        ("テキスト", 4, 4, 4),
    ]
    assert analyze_one_spans("Spark入門2024", "segmentation") == [
        ("spark", 0, 0, 5),
        ("入", 1, 5, 1),
        ("門", 2, 6, 1),
        ("2024", 3, 7, 4),
    ]
    # NFKC: fullwidth Ａ１ -> a1 (one word run in the normalized string)
    assert analyze_one_spans("Ａ１", "segmentation") == [("a1", 0, 0, 2)]
    # hiragana and katakana are DIFFERENT kinds -> separate runs
    assert analyze_one_spans("かなカナ", "segmentation") == [
        ("かな", 0, 0, 2),
        ("カナ", 1, 2, 2),
    ]


# ------------------------------------------------------- minhash (A10)


def test_minhash_spec_properties():
    """The signature is a set-hash: token order and multiplicity must not
    matter; distinct token sets must (overwhelmingly) differ; the hash
    family is the frozen md5_long used by textops.dedup."""
    from iresearch_spark.analysis.analyzers import parse_minhash

    a = analyze_one("table scan hash join", "minhash:8(text)")
    b = analyze_one("join join hash scan table table", "minhash:8(text)")
    assert a == b  # order/multiplicity-invariant
    assert len(a) == 8 and [p for _t, p in a] == list(range(8))
    c = analyze_one("completely different words", "minhash:8(text)")
    assert c != a
    # overlap monotonicity on a known case: supersets share >= as many
    # signature slots as a disjoint set does
    sup = analyze_one("table scan hash join extra", "minhash:8(text)")
    shared_sup = len(set(a) & set(sup))
    shared_dis = len(set(a) & set(c))
    assert shared_sup >= shared_dis
    assert parse_minhash("text") is None
    with pytest.raises(ValueError):
        parse_minhash("minhash:0(text)")
    with pytest.raises(ValueError):
        parse_minhash("minhash:8")
    with pytest.raises(ValueError):
        parse_minhash("minhash:8()")


def test_minhash_matches_duckdb_twin():
    import duckdb

    from iresearch_spark.textops.sqlgen import minhash_tokens_expr

    vals = [v for v in VALUES if v is not None]
    rows = duckdb.sql(
        "SELECT "
        + minhash_tokens_expr(4, "x")
        + " FROM (SELECT unnest(?) AS x)",
        params=[vals],
    ).fetchall()
    for v, (sig,) in zip(vals, rows):
        want = [t for t, _p in analyze_one(v, "minhash:4(text)")]
        assert list(sig) == want, (v, sig, want)


def test_minhash_payload_and_span_twins():
    from iresearch_spark.analysis.analyzers import (
        analyze_batch_payloads,
        analyze_one_payloads,
    )

    spec = "minhash:4(text)"
    flat, counts, pos, sts, lns, surf = analyze_batch_payloads(
        pd.Series(VALUES, dtype=object), spec
    )
    k = 0
    for row, v in enumerate(VALUES):
        ref = analyze_one_payloads(v, spec)
        c = int(counts[row])
        assert c == len(ref), (v, c, len(ref))
        got = [
            (flat[k + i], int(pos[k + i]), int(sts[k + i]), int(lns[k + i]),
             surf[k + i])
            for i in range(c)
        ]
        assert got == ref, (v, got, ref)
        k += c
    assert k == len(flat)
