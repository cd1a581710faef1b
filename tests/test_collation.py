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
    assert parse_collation_spec("collation:fr_ca") == "fr_ca"
    assert parse_collation_spec("collation:da") == "da"
    assert parse_collation_spec("text") is None
    with pytest.raises(ValueError, match="not in frozen subset"):
        parse_collation_spec("collation:sv")
    assert set(SUPPORTED_LOCALES) == {"root", "en", "de", "fr_ca", "da"}


# r5 locale breadth: fr_ca (backwards secondary) and da (post-z
# primaries, the "aa" contraction, caseFirst=upper), same randomized
# ICU-agreement protocol as de.

DA_REPERTOIRE = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789"
    " _-,;:!?.'\"()/"
    "\u00e6\u00f8\u00e5\u00e4\u00f6\u00fc"
    "\u00c6\u00d8\u00c5\u00c4\u00d6\u00dc"
    "\u00e1\u00e0\u00e2\u00e3\u00e9\u00e8\u00ea\u00eb"
    "\u00ed\u00ec\u00ee\u00ef\u00f1\u00f3\u00f2\u00f4\u00f5"
    "\u00fa\u00f9\u00fb\u00e7"
    "\u00c1\u00c0\u00c9\u00c8\u00ca\u00cd\u00d3\u00da"
)


@pytest.mark.parametrize("locale,repertoire", [
    ("fr_ca", REPERTOIRE),
    ("da", DA_REPERTOIRE),
])
def test_new_locale_order_matches_icu_randomized(locale, repertoire):
    rng = random.Random(4321)
    strings = list(
        {
            "".join(
                rng.choice(repertoire)
                for _ in range(rng.randint(0, 12))
            )
            for _ in range(600)
        }
    )
    ours = sorted(strings, key=lambda s: (collation_key(s, locale), s))
    icu = _icu_order(strings, locale)
    assert ours == icu


def test_fr_ca_backwards_secondary_targeted():
    """The canonical Canadian-French case: accents compared from the END
    of the string — cote < côte < coté < côté (forward locales give
    cote < coté < côte < côté)."""
    strings = ["côté", "coté", "côte", "cote", "cotés", "côtes"]
    ours = sorted(strings, key=lambda s: (collation_key(s, "fr_ca"), s))
    assert ours == _icu_order(strings, "fr_ca")
    assert ours[:4] == ["cote", "côte", "coté", "côté"]
    # de (forward) disagrees on the same strings — the locales really
    # produce different keys
    fwd = sorted(strings, key=lambda s: (collation_key(s, "de"), s))
    assert fwd[:4] == ["cote", "coté", "côte", "côté"]


def test_da_contraction_and_primaries_targeted():
    """Danish: æ < ø < å after z; "aa" sorts as å (contraction, case
    patterns aa/Aa/AA but NOT aA); ä ≡ æ, ö ≡ ø, ü ≡ y at the secondary
    level; caseFirst=upper (A < a)."""
    cases = [
        ["z", "æ", "ø", "å", "aa", "ab", "b"],
        ["aa", "aA", "Aa", "AA", "å", "Å", "ab"],
        ["aab", "åb", "aac", "zz", "aaa"],
        ["æ", "ä", "ab", "æa", "äa"],
        ["ø", "ö", "oa", "øb", "öb"],
        ["y", "ü", "ya", "üa", "yb", "u"],
        ["a", "A", "b", "B"],
        ["aä", "aa", "añ", "aà"],
    ]
    for strings in cases:
        ours = sorted(strings, key=lambda s: (collation_key(s, "da"), s))
        assert ours == _icu_order(strings, "da"), strings
