"""significant_terms: JLH scaled-lift vs a pure-pandas re-derivation."""

import pandas as pd

from iresearch_spark.analysis.tokenizer import tokenize
from iresearch_spark.textops.quality import significant_terms


def test_significant_terms_match_pandas(spark):
    rows = []
    for i in range(60):
        fg = i % 3 == 0
        text = "common words here " + ("special drift token " if fg else "plain filler stuff ") * 2
        rows.append({"doc_id": i, "lang": "de" if fg else "en", "text": text + f"w{i}"})
    pdf = pd.DataFrame(rows)
    got = significant_terms(
        spark.createDataFrame(pdf), "lang = 'de'", k=10, min_fg=3
    ).collect()
    # pandas ground truth
    toks = {r["doc_id"]: set(tokenize(r["text"])) for r in rows}
    fg_ids = {r["doc_id"] for r in rows if r["lang"] == "de"}
    n_bg, n_fg = len(rows), len(fg_ids)
    vocab = set().union(*toks.values())
    scored = []
    for t in vocab:
        df_bg = sum(1 for s in toks.values() if t in s)
        df_fg = sum(1 for i in fg_ids if t in toks[i])
        if df_fg < 3:
            continue
        fr, br = df_fg / n_fg, df_bg / n_bg
        if fr - br <= 0:
            continue
        scored.append((round((fr - br) * (fr / br), 6), t, df_fg, df_bg))
    want = sorted(scored, key=lambda x: (-x[0], x[1]))[:10]
    assert [(r["score"], r["term"], r["df_fg"], r["df_bg"]) for r in got] == want
    # the drift tokens dominate
    assert {r["term"] for r in got[:3]} <= {"special", "drift", "token"}


def test_contamination_vs_pandas(spark):
    """Decontamination probe vs a pure-pandas ground truth: per-doc
    distinct-shingle overlap fraction against the benchmark slice."""
    from iresearch_spark.textops.quality import contamination

    rows = []
    for i in range(80):
        body = f"alpha beta gamma doc {i} " + (
            "shared evaluation phrase here " if i % 5 == 0 else ""
        )
        rows.append({"doc_id": i, "text": body + f"tail w{i} w{i+1}"})
    pdf = pd.DataFrame(rows)
    docs_df = spark.createDataFrame(pdf)
    bench = docs_df.filter("doc_id % 3 = 0")
    got = {
        int(r["doc_id"]): (int(r["n_shingles"]), int(r["n_hits"]),
                           float(r["frac"]), bool(r["contaminated"]))
        for r in contamination(docs_df, bench, n=3, threshold=0.5).collect()
    }

    def sh(text):
        toks = tokenize(text)
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    bench_sh = set()
    for _, row in pdf[pdf.doc_id % 3 == 0].iterrows():
        bench_sh |= sh(row["text"])
    for _, row in pdf.iterrows():
        s = sh(row["text"])
        if not s:
            assert int(row["doc_id"]) not in got
            continue
        hits = len(s & bench_sh)
        frac = round(hits / len(s), 6)
        assert got[int(row["doc_id"])] == (
            len(s), hits, frac, frac >= 0.5
        ), row["doc_id"]
    # the benchmark slice itself is fully contaminated
    for did, (_n, _h, frac, flag) in got.items():
        if did % 3 == 0:
            assert frac == 1.0 and flag


def test_repetition_stats_vs_pandas(spark):
    """Gopher repetition signals vs a pure-Python re-derivation."""
    import re as _re

    from iresearch_spark.textops.quality import repetition_stats

    rows = [
        {"doc_id": 0, "text": "spam spam spam spam ham"},
        {"doc_id": 1, "text": "all words fully distinct here now"},
        {"doc_id": 2, "text": "ab cd ab cd ab cd"},
        {"doc_id": 3, "text": "single"},  # < 2 tokens: excluded
        {"doc_id": 4, "text": "The the THE mixed Case case"},
    ]
    got = {
        int(r["doc_id"]): r.asDict()
        for r in repetition_stats(
            spark.createDataFrame(pd.DataFrame(rows))
        ).collect()
    }
    assert 3 not in got
    for row in rows:
        if row["doc_id"] == 3:
            continue
        toks = [
            t
            for t in _re.split("[^a-z0-9]+", row["text"].lower())
            if t
        ]
        two = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        g = got[row["doc_id"]]
        assert g["n_toks"] == len(toks)
        assert g["uniq_tok_frac"] == round(len(set(toks)) / len(toks), 6)
        assert g["max_tok_frac"] == round(
            max(toks.count(t) for t in set(toks)) / len(toks), 6
        )
        assert g["dup_bigram_frac"] == round(
            1.0 - len(set(two)) / len(two), 6
        )
