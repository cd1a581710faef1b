"""Driver-contract parity suite: every `__spark_entry__.queries()` entry is
run against its `oracle_sql()` DuckDB twin on the sf0.01 testdata — the
exact comparison the driver performs (row count + column names + values),
so CORRECTNESS_r{N}.json can't surprise us.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )
        except duckdb.Error:
            pass
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # canonicalize dtypes: floats -> float64, ints -> int64, rest -> str
    out = {}
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("bool")
        else:
            out[c] = s.astype(str)
    pdf = pd.DataFrame(out)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def _compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for c in a.columns:
        if a[c].dtype == "float64":
            bad = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(a[c], b[c]))
                if not (
                    (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-9
                )
            ]
            assert not bad, f"{name}.{c}: float mismatches {bad[:5]}"
        else:
            mism = a[c][a[c] != b[c]]
            assert mism.empty, (
                f"{name}.{c}: {len(mism)} mismatches, first: "
                f"{a[c][a[c] != b[c]].head(3).tolist()} vs "
                f"{b[c][a[c] != b[c]].head(3).tolist()}"
            )


_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def test_corpus_is_ascii(ddb):
    """sqlgen's NFKC==identity assumption holds for the driver corpora."""
    n = ddb.execute(
        "SELECT count(*) FROM documents WHERE text <> "
        "regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')"
    ).fetchone()[0]
    assert n == 0


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    sql = _ORACLES.get(name)
    if sql is None:
        # rows-only contract (non-SQL-expressible op): schema sanity only
        assert len(spark_pdf) >= 0
        return
    oracle_pdf = ddb.execute(sql).fetchdf()
    _compare(name, spark_pdf, oracle_pdf)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert {"qid", "rank", "doc_id", "score"}.issubset(pdf.columns)
