"""iresearch_spark — a from-scratch PySpark-native full-text index + BM25
query engine with the capabilities of the reference (yyht/iresearch, a fork
of iresearch-toolkit/iresearch; see SURVEY.md §0 for citation basis).

Architecture: pure DataFrame + vectorized pandas/Arrow UDF code paths; no
per-row Python anywhere (BASELINE.json:15). All custom kernels are numpy
inside mapInArrow/applyInPandas; all policy logic is driver-side Python.
"""

__version__ = "0.1.0"

# --- allocation hardening (import-time, so every Spark Python worker that
# loads any engine module gets it): numpy madvise()s THP for large arrays;
# with kernel thp defrag=madvise each first-touch fault does SYNCHRONOUS
# compaction, which measured as multi-second stalls per fresh worker on
# this host (16 s for a 10 MB allocation) and destroys N->4N scaling —
# 4N workers pay 4N× the stall. Disable both knobs; harmless elsewhere.
import os as _os

_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
try:  # PR_SET_THP_DISABLE=41 — covers numpy already imported by pyspark
    import ctypes as _ctypes

    _libc = _ctypes.CDLL(None)
    _libc.prctl(41, 1, 0, 0, 0)
    # glibc: stop returning freed pages to the OS between Arrow batches.
    # Each worker's alloc/free cycle otherwise munmaps+refaults GBs of 4 KB
    # pages per batch; at 4N concurrent workers the zone-lock contention
    # showed up as 75-85% SYSTEM time and 3-8x build slowdowns.
    # M_TRIM_THRESHOLD=-1, M_MMAP_THRESHOLD=-3 (see mallopt(3)).
    _libc.mallopt(-1, 256 * 1024 * 1024)
    _libc.mallopt(-3, 256 * 1024 * 1024)
except Exception:  # pragma: no cover - non-Linux
    pass

# BM25 defaults pinned by BASELINE.json:6 ("BM25 (k1=1.2, b=0.75)"),
# mirroring the reference's bm25_sort defaults
# ([up] core/search/bm25.cpp :: bm25_sort).
BM25_K1 = 1.2
BM25_B = 0.75

# Posting-list block size, mirroring the reference's postings format
# ([up] core/formats/formats_10.cpp — 128-document blocks).
BLOCK_SIZE = 128

# Bump whenever the tokenizer/extraction spec changes (FIXTURES.md §6);
# invalidates all goldens.
ANALYZER_VERSION = 1
