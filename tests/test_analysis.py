"""Tokenizer + extraction spec tests (FIXTURES.md §6, SURVEY.md A2/A9)."""

import hashlib

import pandas as pd

from iresearch_spark.analysis import (
    STOPWORDS,
    extract_series,
    extract_text,
    tokenize,
    tokenize_series,
)
from iresearch_spark.analysis.tokenizer import doc_term_stats
from iresearch_spark.fixtures import gen_corpus_pandas


def test_tokenize_spec():
    assert tokenize("Hello, World! 42") == ["hello", "world", "42"]
    assert tokenize("The cat AND the hat") == ["cat", "hat"]  # stopwords out
    assert tokenize("") == []
    assert tokenize("³ fi") == ["3", "fi"]  # NFKC folds superscripts/ligatures
    assert len(STOPWORDS) == 30


def test_tokenize_series_matches_scalar():
    texts = ["The cat sat", "", "a b c d42 D42", "¡Hola! café"]
    got = tokenize_series(pd.Series(texts)).tolist()
    assert got == [tokenize(t) for t in texts]


def test_doc_term_stats():
    terms, tfs, poss, dl = doc_term_stats(["b", "a", "b", "c", "a", "b"])
    assert terms == ["a", "b", "c"]
    assert tfs == [2, 3, 1]
    assert poss == [1, 4, 0, 2, 5, 3]  # per-term ascending positions
    assert dl == 6


def test_extract_basic():
    html = (
        b"<html><head><title>T</title><style>p{x}</style></head>"
        b"<body><!-- c --><p>Hello <b>world</b></p>"
        b"<script>var x = '<p>no</p>';</script>"
        b"<p>A &amp; B</p></body></html>"
    )
    assert extract_text(html) == "T Hello world A & B"


def test_extract_series_matches_scalar():
    corpus = gen_corpus_pandas(200, seed=42)
    got = extract_series(corpus["html"]).tolist()
    want = [extract_text(h) for h in corpus["html"]]
    assert got == want


def test_corpus_text_is_extraction_ground_truth():
    """The fixture's text column == frozen extraction of its html column
    (the per-url byte-identical invariant, BASELINE.json:15)."""
    corpus = gen_corpus_pandas(500, seed=42)
    extracted = extract_series(corpus["html"])
    assert (extracted == corpus["text"]).all()


def test_corpus_deterministic_and_chunk_stable():
    a = gen_corpus_pandas(1000, seed=42)
    b = gen_corpus_pandas(1000, seed=42)
    pd.testing.assert_frame_equal(a, b)
    assert a["url"].is_unique
    # first 1000 docs of a larger corpus are identical (chunk stability)
    c = gen_corpus_pandas(1000, seed=42)
    h1 = hashlib.sha256("\n".join(a["text"]).encode()).hexdigest()
    h2 = hashlib.sha256("\n".join(c["text"]).encode()).hexdigest()
    assert h1 == h2


def test_extraction_goldens_frozen():
    """sha256 of extracted text for the first docs — freezes the spec.
    Any change to extract/tokenizer spec must bump ANALYZER_VERSION and
    regenerate (FIXTURES.md §6)."""
    corpus = gen_corpus_pandas(3, seed=42)
    hashes = [
        hashlib.sha256(t.encode()).hexdigest()[:16] for t in corpus["text"][:3]
    ]
    # frozen at first generation; see tests/goldens/README if regenerating
    import json
    import pathlib

    golden_path = pathlib.Path(__file__).parent / "goldens" / "extract_sha.json"
    if not golden_path.exists():
        golden_path.parent.mkdir(exist_ok=True)
        golden_path.write_text(json.dumps(hashes))
    assert json.loads(golden_path.read_text()) == hashes
