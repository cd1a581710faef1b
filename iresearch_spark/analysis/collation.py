"""A6 collation analyzer — frozen ICU-free DUCET-subset sort keys.

Mirrors the reference's collation_token_stream ([up]
core/analysis/collation_token_stream.cpp): the analyzer consumes the
whole value and emits ONE term whose BYTES are a locale collation sort
key, so lexicographic term order == locale order — locale-correct range
scans and index sorts ride the ordinary term dictionary.

The reference binds ICU; this sandbox has none, so the key derives from
a FROZEN subset of the DUCET/CLDR-root collation (which the supported
locales — root, en, de (DIN 5007-1 dictionary order) — share on this
character repertoire):

* three UCA levels, low-terminated: `P…!S…!T…` with 6-hex-digit primary
  weights, '!'-separated 2-hex-digit secondary then tertiary weights
  ('!' < '0' in ASCII, so a string that is a prefix at one level sorts
  first — the standard sort-key layout);
* primaries: space < _ < - < , < ; < : < ! < ? < . < ' < " < ( < ) < /
  < digits < a..z (accented letters share their base letter's primary —
  ä sorts with a, DIN 5007-1);
* secondaries (accent, from NFD decomposition): none < acute < grave <
  circumflex < ring < diaeresis < tilde < cedilla;
* tertiaries (case): lower < upper; ß = s·s with a higher tertiary on
  the first element (sorts directly after "ss");
* code points beyond the repertoire get a deterministic
  codepoint-ordered primary tail (0x8000 + cp) — stable, but outside
  the ICU-verified subset.

The weight tables are calibrated against DuckDB's bundled ICU
(icu_sort_key / COLLATE de) and pinned by tests/test_collation.py, which
re-verifies order agreement on randomized strings over the repertoire.
"""

from __future__ import annotations

import functools
import unicodedata

import numpy as np
import pandas as pd

SUPPORTED_LOCALES = ("root", "en", "de")

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
    """Collation elements (primary, secondary, tertiary) for one char."""
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


@functools.lru_cache(maxsize=65536)
def collation_key(value: str) -> str:
    """Frozen DUCET-subset sort key for one value (NFC-normalized)."""
    elems: list[tuple[int, int, int]] = []
    for ch in unicodedata.normalize("NFC", value):
        elems.extend(_char_elements(ch))
    return (
        "".join(format(p, "06X") for p, _s, _t in elems)
        + "!"
        + "".join(format(s, "02X") for _p, s, _t in elems)
        + "!"
        + "".join(format(t, "02X") for _p, _s, t in elems)
    )


def collation_keys_batch(values: pd.Series):
    """Batch kernel: one key per non-null value. Dictionary-bounded
    Python — keys are computed once per UNIQUE value (lru-cached per
    unique char inside), the factorized inverse fans them back out."""
    notna = values.notna().to_numpy()
    flat_vals = values.to_numpy(dtype=object)[notna]
    codes, uniques = pd.factorize(pd.Series(flat_vals, dtype=object))
    ukeys = np.array([collation_key(u) for u in uniques], dtype=object)
    flat = ukeys[codes] if len(codes) else np.empty(0, dtype=object)
    counts = notna.astype(np.int64)
    lens = np.fromiter(
        (len(v) for v in flat_vals), count=len(flat_vals), dtype=np.int64
    )
    z = np.zeros(len(flat), dtype=np.int64)
    return flat, counts, z, z.copy(), lens
