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
