"""Block-max WAND pruning-rate bench: dynamic-θ vs the static-θ baseline.

The round-3 verdict asked for a measured blocks-decoded / blocks-skipped
metric showing the dynamic threshold actually prunes more on a large
index (long postings + small k is where BMW earns its keep — Ding & Suel
2011). This script opens a prebuilt index, pulls the posting rows of a
family of disjunction shapes driver-side (the same rows the mapInArrow
kernel would see per segment), runs BOTH kernels on identical readers,
verifies rank-identical results, and reports per-query blocks decoded
vs total.

Usage (repo root):
    python scripts/wand_pruning.py build <root> <n_docs> <cpus>
    python scripts/wand_pruning.py measure <root> [k]
Each prints one JSON line; `measure` prints a per-query table first.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _build(root: str, n_docs: int, cpus: int) -> None:
    spark = bench._mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from iresearch_spark.build.indexer import build_index
    from iresearch_spark.fixtures.corpus import gen_corpus_spark
    from iresearch_spark.store import SnapshotStore

    corpus_dir = os.path.join(root, "corpus")
    if not os.path.exists(corpus_dir):
        gen_corpus_spark(spark, n_docs).write.parquet(corpus_dir)
    store = SnapshotStore(os.path.join(root, "index"))
    sid = build_index(
        spark,
        spark.read.parquet(corpus_dir),
        store,
        n_segments=int(os.environ.get("WP_SEGMENTS", "16")),
        source=f"wandprune-{n_docs}",
    )
    print(json.dumps({"built": sid, "n_docs": n_docs}))
    spark.stop()


def _measure(root: str, k: int) -> None:
    from pyspark.sql import functions as F

    from iresearch_spark import BM25_B, BM25_K1
    from iresearch_spark.query.wand import (
        TermPostings,
        _or_topk_static,
        or_terms_topk,
    )
    from iresearch_spark.store import SnapshotStore

    spark = bench._mk_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    store = SnapshotStore(os.path.join(root, "index"))
    sid = store.current_snapshot_id()
    stats = store.global_stats()
    n_docs = stats["n_docs"]
    avgdl = stats["avgdl_by_field"].get("text") or stats["avgdl"]
    fields = [d["name"] for d in store.fields(sid)] or ["text"]
    text_fidx = fields.index("text")

    # term selection by df decile from the global dictionary: "hot" terms
    # near the df ceiling (longest lists), "mid" and "rare" below
    dic = (
        store.read_postings(spark, sid)
        .filter(F.col("field") == "text")
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    top = dic.orderBy(F.desc("df"), F.asc("term")).limit(2000).collect()
    hot = [r["term"] for r in top[:4]]
    mid = [r["term"] for r in top[400:404]]
    rare = [r["term"] for r in top[1600:1604]]
    gdf = {r["term"]: int(r["df"]) for r in top}

    shapes = {
        "or2_hot_hot": [hot[0], hot[1]],
        "or2_hot_rare": [hot[0], rare[0]],
        "or3_hot_mid_rare": [hot[2], mid[0], rare[1]],
        "or4_mixed": [hot[3], mid[1], mid[2], rare[2]],
        "or3_rare": [rare[0], rare[1], rare[3]],
    }
    all_terms = sorted({t for ts in shapes.values() for t in ts})

    # fetch every involved posting row + per-segment text norms driver-side
    rows = (
        store.read_postings(spark, sid)
        .filter(F.col("field") == "text")
        .filter(F.col("term").isin(all_terms))
        .select("seg_id", "term", "blob", "skip", "bmax", "df")
        .collect()
    )
    norm_rows = (
        store.read_norms(spark, sid)
        .filter(F.col("fidx") == text_fidx)
        .select("seg_id", "dls_bin")
        .collect()
    )
    dls_by_seg = {
        int(r["seg_id"]): np.frombuffer(r["dls_bin"], dtype="<u4").astype(
            np.float64
        )
        for r in norm_rows
    }
    by_seg: dict[int, dict[str, tuple]] = {}
    for r in rows:
        by_seg.setdefault(int(r["seg_id"]), {})[r["term"]] = (
            bytes(r["blob"]),
            bytes(r["skip"]),
            bytes(r["bmax"]),
            int(r["df"]),
        )

    def idf(df_):
        return math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))

    def tfn(tf, dl_arr, _avgdl):
        return (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl_arr / _avgdl)
        )

    # seek-conjunction decode fraction (and_terms — the same cost-ordered
    # seek machinery the positional/phrase kernel now uses for its doc
    # intersection): lead list decodes fully, the hot list only the
    # blocks the lead's docs touch
    for name, terms in {
        "and2_hot_rare": [hot[0], rare[0]],
        "and2_hot_mid": [hot[1], mid[0]],
    }.items():
        dec = blocks = 0
        from iresearch_spark.query.wand import and_terms

        for seg, termmap in sorted(by_seg.items()):
            dls = dls_by_seg[seg]
            pairs = [
                (idf(gdf[t]), TermPostings(*termmap[t]), dls, avgdl)
                for t in terms
                if t in termmap
            ]
            if len(pairs) < len(terms):
                continue
            and_terms(pairs, tfn)
            dec += sum(len(r.decoded) for _w, r, _d, _a in pairs)
            blocks += sum(r.n_blocks for _w, r, _d, _a in pairs)
        print(
            json.dumps(
                {
                    name: {
                        "terms": terms,
                        "dfs": [gdf[t] for t in terms],
                        "blocks_total": blocks,
                        "blocks_decoded_seek": dec,
                        "decode_frac_seek": round(dec / blocks, 4)
                        if blocks
                        else 0,
                    }
                }
            )
        )

    report = {}
    tot_dyn = tot_sta = tot_blocks = 0
    for name, terms in shapes.items():
        dyn_dec = sta_dec = blocks = 0
        for seg, termmap in sorted(by_seg.items()):
            dls = dls_by_seg[seg]

            def mk():
                return [
                    (idf(gdf[t]), TermPostings(*termmap[t]), dls, avgdl)
                    for t in terms
                    if t in termmap
                ]

            p_dyn = mk()
            if not p_dyn:
                continue
            d_docs, d_sc = or_terms_topk(p_dyn, k, tfn, score_round=6)
            p_sta = mk()
            s_docs, s_sc = _or_topk_static(p_sta, k, tfn, score_round=6)
            got_d = sorted(zip(d_docs, d_sc), key=lambda kv: (-kv[1], kv[0]))
            got_s = sorted(zip(s_docs, s_sc), key=lambda kv: (-kv[1], kv[0]))
            assert got_d == got_s, f"{name} seg {seg}: rank mismatch"
            dyn_dec += sum(len(r.decoded) for _w, r, _d, _a in p_dyn)
            sta_dec += sum(len(r.decoded) for _w, r, _d, _a in p_sta)
            blocks += sum(r.n_blocks for _w, r, _d, _a in p_dyn)
        report[name] = {
            "terms": terms,
            "dfs": [gdf[t] for t in terms],
            "blocks_total": blocks,
            "blocks_decoded_static": sta_dec,
            "blocks_decoded_dynamic": dyn_dec,
            "decode_frac_static": round(sta_dec / blocks, 4) if blocks else 0,
            "decode_frac_dynamic": round(dyn_dec / blocks, 4) if blocks else 0,
        }
        tot_dyn += dyn_dec
        tot_sta += sta_dec
        tot_blocks += blocks
        print(json.dumps({name: report[name]}))
    print(
        json.dumps(
            {
                "metric": "wand_block_decode_fraction",
                "k": k,
                "n_docs": n_docs,
                "blocks_total": tot_blocks,
                "static": round(tot_sta / tot_blocks, 4),
                "dynamic": round(tot_dyn / tot_blocks, 4),
                "improvement_x": round(tot_sta / max(tot_dyn, 1), 2),
                "rank_identical": True,
            }
        )
    )

    # ------------------------------------------------------- positional
    # Phrase top-k with per-block bounds (r5): drive the REAL segment
    # kernel driver-side (same callable the cogroup runs) twice per
    # phrase shape — pruned top-k vs the exhaustive scored_all path —
    # and read decode counters back through wand.INSTRUMENT.  The
    # selective-anchor shape (rare lead slot + hot second slot) is where
    # the bound skips candidate-generation blocks the exact seek
    # intersection still had to cover.
    import pandas as pd

    from iresearch_spark.query import filters as qf
    from iresearch_spark.query import wand as wand_mod
    from iresearch_spark.query.executor import _make_segment_kernel

    pos_rows = (
        store.read_postings(spark, sid)
        .filter(F.col("field") == "text")
        .filter(F.col("term").isin(all_terms))
        .select(
            "seg_id", "field", "term", "blob", "skip", "bmax", "df",
            "pos_off", "pos_pay",
        )
        .collect()
    )
    seg_pdfs: dict[int, pd.DataFrame] = {}
    for r in pos_rows:
        seg_pdfs.setdefault(int(r["seg_id"]), []).append(
            {
                "field": r["field"],
                "term": r["term"],
                "blob": bytes(r["blob"]),
                "skip": bytes(r["skip"]),
                "bmax": bytes(r["bmax"]),
                "df": int(r["df"]),
                "pos_off": bytes(r["pos_off"]),
                "pos_pay": bytes(r["pos_pay"]) if r["pos_pay"] else b"",
            }
        )
    seg_pdfs = {s: pd.DataFrame(rows) for s, rows in seg_pdfs.items()}
    norm_pdfs = {
        s: pd.DataFrame(
            {
                "seg_id": [s],
                "fidx": [text_fidx],
                "dls_bin": [dls_by_seg[s].astype("<u4").tobytes()],
            }
        )
        for s in seg_pdfs
    }
    idf_all = {("text", t): idf(gdf[t]) for t in all_terms}

    def _run_phrase(terms, k_, scored_all_):
        dec = blocks = 0
        rows_out = {}
        tree = qf.Phrase(list(terms), field="text")
        for s, pdf in sorted(seg_pdfs.items()):
            kern = _make_segment_kernel(
                {0: tree}, idf_all, {"text": avgdl}, fields,
                BM25_K1, BM25_B, k_, True, score_round=6,
                n_docs=n_docs, scored_all=scored_all_,
            )
            wand_mod.INSTRUMENT = []
            try:
                out = kern(pdf, norm_pdfs[s])
            finally:
                readers = wand_mod.INSTRUMENT
                wand_mod.INSTRUMENT = None
            dec += sum(len(r.decoded) for r in readers)
            blocks += sum(r.n_blocks for r in readers)
            for rr in out.itertuples():
                rows_out[(s, int(rr.doc_id))] = float(rr.score)
        return rows_out, dec, blocks

    for name, terms in {
        "phrase_rare_hot": [rare[0], hot[0]],
        "phrase_mid_hot": [mid[0], hot[1]],
    }.items():
        pruned, dec_p, blocks_p = _run_phrase(terms, k, False)
        full, dec_f, blocks_f = _run_phrase(terms, k, True)
        # rank identity: pruned global top-k ⊆ exhaustive, same scores,
        # same (score desc, seg asc, doc asc) head
        want = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))
        have = sorted(pruned.items(), key=lambda kv: (-kv[1], kv[0]))
        # per-segment top-k union vs global: every pruned row must match
        # the exhaustive score and the global head must be covered
        assert all(full.get(key) == sc for key, sc in have), name
        head = [key for key, _ in want[:k]]
        assert set(head) <= {key for key, _ in have}, name
        print(
            json.dumps(
                {
                    f"positional_{name}": {
                        "terms": terms,
                        "dfs": [gdf[t] for t in terms],
                        "blocks_total": blocks_f,
                        "blocks_decoded_exhaustive": dec_f,
                        "blocks_decoded_pruned": dec_p,
                        "decode_frac_exhaustive": round(
                            dec_f / blocks_f, 4
                        ) if blocks_f else 0,
                        "decode_frac_pruned": round(dec_p / blocks_p, 4)
                        if blocks_p
                        else 0,
                        "rank_identical": True,
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "build":
        _build(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        _measure(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
