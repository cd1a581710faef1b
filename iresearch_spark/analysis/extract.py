"""Deterministic html -> text extraction (SURVEY.md A9).

Not present in the reference (IResearch indexes already-extracted text);
required by the graft: BASELINE.json:6 "tokenize/normalize Common-Crawl-style
pages", BASELINE.json:15 input columns (html:binary, text:string) with the
per-row invariant "byte-identical extracted text per url". The spec below is
therefore FROZEN (ANALYZER_VERSION gates changes) and self-contained (no
bs4/lxml in the sandbox):

  1. decode html bytes as UTF-8 (errors='replace')
  2. strip <!-- comments -->
  3. strip <script>/<style> elements including their content
  4. replace every remaining tag with a single space
  5. decode HTML entities (python stdlib html.unescape — deterministic)
  6. collapse all whitespace runs to a single space; strip ends
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes | str) -> str:
    """Extract visible text from one HTML document (frozen spec)."""
    if html_bytes is None:
        return ""
    s = (
        html_bytes.decode("utf-8", errors="replace")
        if isinstance(html_bytes, (bytes, bytearray))
        else str(html_bytes)
    )
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_series(html_col: pd.Series) -> pd.Series:
    """Vectorized extraction over a pandas Series of binary/str html.

    Same spec as extract_text, applied with pandas' C string kernels
    (str.replace with compiled regexes); html.unescape is applied only to
    rows that actually contain '&' (vectorized mask), keeping the common
    path loop-free.
    """
    s = html_col.map(
        lambda b: b.decode("utf-8", errors="replace")
        if isinstance(b, (bytes, bytearray))
        else ("" if b is None else str(b))
    )
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    has_ent = s.str.contains("&", regex=False)
    if has_ent.any():
        s.loc[has_ent] = s.loc[has_ent].map(_html.unescape)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s
