"""A6 collation analyzer — frozen ICU-free DUCET-subset sort keys.

Mirrors the reference's collation_token_stream ([up]
core/analysis/collation_token_stream.cpp): the analyzer consumes the
whole value and emits ONE term whose BYTES are a locale collation sort
key, so lexicographic term order == locale order — locale-correct range
scans and index sorts ride the ordinary term dictionary.

The reference binds ICU; this sandbox has none, so the key derives from
a FROZEN subset of the DUCET/CLDR collation.  Supported locales:

* root / en / de (DIN 5007-1 dictionary order) — share the repertoire's
  order: accented letters take their base letter's primary with an
  accent secondary, case is tertiary (lower < upper), ß = s·s with a
  raised tertiary on the first element.
* fr_ca (r5) — Canadian French BACKWARDS SECONDARY: accents are
  compared from the END of the string (cote < côte < coté < côté), the
  classic UCA "french accents" tailoring.  Same elements as root; only
  the secondary weight sequence is reversed when the key is built.
  (Modern fr-FR uses forward accents — verified against ICU — so the
  backwards locale is named fr_ca, matching CLDR.)
* da (r5) — Danish: æ < ø < å as REAL primaries after z; the "aa"
  CONTRACTION sorts as å (case patterns aa/Aa/AA — NOT aA — with the
  second a's accents carried as the contraction's secondary, ICU's
  discontiguous-contraction behavior); ä ≡ æ, ö ≡ ø, ü ≡ y at the
  secondary level; caseFirst=upper (A < a), so the tertiary ladder is
  flipped.

Key layout (all locales): three UCA levels, low-terminated —
`P…!S…!T…` with 6-hex-digit primary weights, '!'-separated 2-hex-digit
secondary then tertiary weights ('!' < '0' in ASCII, so a string that
is a prefix at one level sorts first — the standard sort-key layout).
Primaries: space < _ < - < , < ; < : < ! < ? < . < ' < " < ( < ) < /
< digits < a..z (< æ < ø < å for da).  Code points beyond the
repertoire get a deterministic codepoint-ordered primary tail
(0x8000 + cp) — stable, but outside the ICU-verified subset.

The weight tables are calibrated against DuckDB's bundled ICU
(icu_sort_key with locales de / fr_ca / da) and pinned by
tests/test_collation.py, which re-verifies order agreement on
randomized strings over each locale's repertoire.
"""

from __future__ import annotations

import functools
import unicodedata

import numpy as np
import pandas as pd

SUPPORTED_LOCALES = ("root", "en", "de", "fr_ca", "da")

# combining mark -> secondary weight (ICU-de calibrated, frozen)
_ACCENT_SEC = {
    0x0301: 2,  # acute
    0x0300: 3,  # grave
    0x0302: 4,  # circumflex
    0x030A: 5,  # ring above
    0x0308: 6,  # diaeresis / umlaut
    0x0303: 7,  # tilde
    0x0327: 8,  # cedilla
}

# ICU-de calibrated punctuation primary order (frozen)
_PUNCT_PRI = {
    " ": 0x0010, "_": 0x0011, "-": 0x0012, ",": 0x0013, ";": 0x0014,
    ":": 0x0015, "!": 0x0016, "?": 0x0017, ".": 0x0018, "'": 0x0019,
    '"': 0x001A, "(": 0x001B, ")": 0x001C, "/": 0x001D,
}

_LETTER_BASE = 0x0050  # 'a' primary; b..z follow
_DIGIT_BASE = 0x0030
_UNKNOWN_BASE = 0x8000

# Danish post-z primaries (CLDR da: &z < æ <<< Æ < ø <<< Ø < å <<< Å)
_DA_AE = _LETTER_BASE + 26
_DA_OSLASH = _LETTER_BASE + 27
_DA_ARING = _LETTER_BASE + 28

# Danish å-group tertiary ladder, ICU-observed with caseFirst=upper:
# Å < AA < Aa < å < aa  (single letters use ranks 1/4 so they interleave
# exactly where ICU puts them)
_DA_ARING_TER = {"Å": 1, "AA": 2, "Aa": 3, "å": 4, "aa": 5}


def parse_collation_spec(stage: str) -> str | None:
    """`collation:<locale>` -> locale, else None."""
    if not stage.startswith("collation:"):
        return None
    locale = stage[len("collation:") :]
    if locale not in SUPPORTED_LOCALES:
        raise ValueError(
            f"collation locale {locale!r} not in frozen subset "
            f"{SUPPORTED_LOCALES} (ICU-bound locales unavailable)"
        )
    return locale


@functools.lru_cache(maxsize=4096)
def _char_elements(ch: str) -> tuple[tuple[int, int, int], ...]:
    """Collation elements (primary, secondary, tertiary) for one char —
    the root/en/de table (tertiary: lower=1 < upper=2)."""
    if ch in _PUNCT_PRI:
        return ((_PUNCT_PRI[ch], 1, 1),)
    cp = ord(ch)
    if 0x30 <= cp <= 0x39:
        return ((_DIGIT_BASE + cp - 0x30, 1, 1),)
    if ch == "ß":
        s = _LETTER_BASE + (ord("s") - ord("a"))
        return ((s, 1, 3), (s, 1, 1))
    d = unicodedata.normalize("NFD", ch)
    base = d[0]
    bl = base.lower()
    if len(bl) == 1 and "a" <= bl <= "z":
        sec = 1
        ok = True
        for m in d[1:]:
            w = _ACCENT_SEC.get(ord(m))
            if w is None or sec != 1:
                ok = False  # unknown or stacked marks: fall through
                break
            sec = w
        if ok:
            ter = 2 if base != bl else 1
            return ((_LETTER_BASE + ord(bl) - ord("a"), sec, ter),)
    return ((_UNKNOWN_BASE + cp, 1, 1),)


def _clusters(value: str) -> list[tuple[str, tuple[int, ...]]]:
    """NFD grapheme-ish clusters: (starter char, combining-mark cps)."""
    out: list[tuple[str, list[int]]] = []
    for ch in unicodedata.normalize("NFD", value):
        if unicodedata.combining(ch) and out:
            out[-1][1].append(ord(ch))
        else:
            out.append((ch, []))
    return [(b, tuple(m)) for b, m in out]


def _marks_sec(marks: tuple[int, ...]) -> int | None:
    """Single known accent -> its secondary; none -> 1; else None."""
    if not marks:
        return 1
    if len(marks) == 1:
        return _ACCENT_SEC.get(marks[0])
    return None


def _da_cluster_element(base: str, marks: tuple[int, ...]):
    """Danish element for one non-contraction cluster, or None to fall
    back to the root table (punct/digits/unknown)."""
    bl = base.lower()
    upper = base != bl
    ter = 1 if upper else 2  # caseFirst=upper
    sec = _marks_sec(marks)
    if sec is None:
        return None
    if bl == "a" and marks == (0x030A,):  # å — a real letter after ø
        return (_DA_ARING, 1, _DA_ARING_TER["Å" if upper else "å"])
    if bl == "a" and marks == (0x0308,):  # ä ≡ æ + diaeresis secondary
        return (_DA_AE, 6, ter)
    if bl == "o" and marks == (0x0308,):  # ö ≡ ø + diaeresis secondary
        return (_DA_OSLASH, 6, ter)
    if bl == "u" and marks == (0x0308,):  # ü ≡ y + diaeresis secondary
        return (_LETTER_BASE + (ord("y") - ord("a")), 6, ter)
    if bl == "æ":
        return (_DA_AE, 1, ter)
    if bl == "ø":
        return (_DA_OSLASH, 1, ter)
    if len(bl) == 1 and "a" <= bl <= "z":
        return (_LETTER_BASE + ord(bl) - ord("a"), sec, ter)
    return None


def _da_elements(value: str) -> list[tuple[int, int, int]]:
    """Danish element sequence with the aa-contraction."""
    cl = _clusters(value)
    out: list[tuple[int, int, int]] = []
    i = 0
    while i < len(cl):
        b, marks = cl[i]
        if b in "aA" and not marks and i + 1 < len(cl):
            b2, marks2 = cl[i + 1]
            # contraction fires for aa / Aa / AA — NOT aA (CLDR da rule
            # list) — with the second a's accents as the contraction's
            # secondary (ICU discontiguous-contraction behavior)
            if b2 in "aA" and not (b == "a" and b2 == "A"):
                sec2 = _marks_sec(marks2)
                if sec2 is not None:
                    out.append((_DA_ARING, sec2, _DA_ARING_TER[b + b2]))
                    i += 2
                    continue
        el = _da_cluster_element(b, marks)
        if el is not None:
            out.append(el)
        else:
            # punct/digit/unknown: root table, with the da case flip for
            # any letter it might still resolve
            for p, s, t in _char_elements(
                unicodedata.normalize(
                    "NFC", b + "".join(chr(m) for m in marks)
                )
            ):
                if _LETTER_BASE <= p < _UNKNOWN_BASE:
                    t = {1: 2, 2: 1}.get(t, t)
                out.append((p, s, t))
        i += 1
    return out


def _elements(value: str, locale: str) -> list[tuple[int, int, int]]:
    if locale == "da":
        return _da_elements(value)
    elems: list[tuple[int, int, int]] = []
    for ch in unicodedata.normalize("NFC", value):
        elems.extend(_char_elements(ch))
    return elems


@functools.lru_cache(maxsize=65536)
def collation_key(value: str, locale: str = "root") -> str:
    """Frozen DUCET-subset sort key for one value."""
    elems = _elements(value, locale)
    secs = [s for _p, s, _t in elems]
    if locale == "fr_ca":  # backwards secondary: accents from the end
        secs = secs[::-1]
    return (
        "".join(format(p, "06X") for p, _s, _t in elems)
        + "!"
        + "".join(format(s, "02X") for s in secs)
        + "!"
        + "".join(format(t, "02X") for _p, _s, t in elems)
    )


def collation_keys_batch(values: pd.Series, locale: str = "root"):
    """Batch kernel: one key per non-null value. Dictionary-bounded
    Python — keys are computed once per UNIQUE value (lru-cached per
    unique char inside), the factorized inverse fans them back out."""
    notna = values.notna().to_numpy()
    flat_vals = values.to_numpy(dtype=object)[notna]
    codes, uniques = pd.factorize(pd.Series(flat_vals, dtype=object))
    ukeys = np.array(
        [collation_key(u, locale) for u in uniques], dtype=object
    )
    flat = ukeys[codes] if len(codes) else np.empty(0, dtype=object)
    counts = notna.astype(np.int64)
    lens = np.fromiter(
        (len(v) for v in flat_vals), count=len(flat_vals), dtype=np.int64
    )
    z = np.zeros(len(flat), dtype=np.int64)
    return flat, counts, z, z.copy(), lens
