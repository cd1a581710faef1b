"""A6 collation analyzer: the frozen DUCET-subset sort key must reproduce
ICU's collation order (verified against DuckDB's bundled ICU — the same
oracle the driver twin uses) on the supported repertoire, stay
deterministic beyond it, and compose as a pipeline stage."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from iresearch_spark.analysis.analyzers import analyze_one, analyze_batch
from iresearch_spark.analysis.collation import (
    SUPPORTED_LOCALES,
    collation_key,
    parse_collation_spec,
)

REPERTOIRE = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789"
    " _-,;:!?.'\"()/"
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿß"
    "ÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
)


def _icu_order(strings: list[str], locale: str = "de") -> list[str]:
    con = duckdb.connect()
    df = pd.DataFrame({"s": strings})
    con.register("t", df)
    return [
        r[0]
        for r in con.execute(
            f"select s from t order by icu_sort_key(s, '{locale}'), s"
        ).fetchall()
    ]


def test_key_order_matches_icu_randomized():
    rng = random.Random(1234)
    strings = list(
        {
            "".join(
                rng.choice(REPERTOIRE)
                for _ in range(rng.randint(0, 12))
            )
            for _ in range(600)
        }
    )
    ours = sorted(strings, key=lambda s: (collation_key(s), s))
    icu = _icu_order(strings)
    assert ours == icu


def test_key_order_matches_icu_targeted():
    """The cases the frozen table was calibrated on: accents share the
    base letter's primary (DIN 5007-1), accent secondary order, case
    tertiary order, ß directly after ss, punctuation ladder."""
    cases = [
        ["a", "A", "á", "à", "â", "å", "ä", "Ä", "ã", "b"],
        ["ob", "Ob", "öa", "öb", "Öb", "õa", "pa"],
        ["ss", "ß", "st", "sz", "s"],
        ["Straße", "Strasse", "Strasze"],
        [" ", "_", "-", ",", ";", ":", "!", "?", ".", "'", '"', "(", ")",
         "/", "0", "9", "a", "z"],
        ["", " ", " a", "a", "a ", "aa"],
        ["müller", "Müller", "mueller", "Mueller", "muffe"],
    ]
    for strings in cases:
        ours = sorted(strings, key=lambda s: (collation_key(s), s))
        assert ours == _icu_order(strings), strings


def test_analyzer_stage_and_pipeline():
    got = analyze_one("Äpfel", "collation:de")
    assert len(got) == 1 and got[0][1] == 0
    assert got[0][0] == collation_key("Äpfel")
    # pipeline: per-word sort keys (delimiter feeds collation)
    toks = analyze_one("zb ä", "delimiter: |collation:de")
    assert [t for t, _p in toks] == [collation_key("zb"), collation_key("ä")]
    # locale-order property rides the term order
    assert collation_key("ä") < collation_key("zb")


def test_batch_matches_reference_and_nulls():
    vals = pd.Series(["Äpfel", None, "ß", "", "apfel", "Äpfel"])
    flat, counts, pos = analyze_batch(vals, "collation:de")
    assert counts.tolist() == [1, 0, 1, 1, 1, 1]
    expect = [collation_key(v) for v in vals if v is not None]
    assert flat.tolist() == expect
    assert pos.tolist() == [0] * 5


def test_unknown_codepoints_deterministic_tail():
    a, b = collation_key("日"), collation_key("語")
    assert a != b
    assert (a < b) == (ord("日") < ord("語"))
    assert collation_key("z") < a  # repertoire sorts before the tail


def test_locale_validation():
    assert parse_collation_spec("collation:de") == "de"
    assert parse_collation_spec("text") is None
    with pytest.raises(ValueError, match="not in frozen subset"):
        parse_collation_spec("collation:sv")
    assert set(SUPPORTED_LOCALES) == {"root", "en", "de"}
