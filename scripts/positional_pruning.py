"""Positional block-max pruning bench on a tf-SKEWED corpus.

The flat synthetic corpus of scripts/wand_pruning.py gives every lead
block the same (max_tf, min_dl) bound, so phrase top-k pruning cannot
skip anything there (wand_pruning_2m_r5.json positional rows: pruned ==
exhaustive, rank-identical).  Real web corpora are Zipfian: a term's tf
varies by orders of magnitude across documents, so per-block bounds
spread and θ (filled from the high-tf blocks first) cuts the tail.  This
script builds a corpus with that shape — anchor-term tf follows a
deterministic heavy-tail across docs — and measures the lead-slot blocks
decoded by the pruned Phrase top-k vs the exhaustive scored_all path,
asserting rank-identical global top-k.

Usage (repo root):
    python scripts/positional_pruning.py <root> <n_docs> [k]
Prints one JSON line per shape + a summary line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main(root: str, n_docs: int, k: int) -> None:
    from pyspark.sql import functions as F

    from iresearch_spark import BM25_B, BM25_K1
    from iresearch_spark.build.indexer import build_index
    from iresearch_spark.query import filters as qf
    from iresearch_spark.query import wand as wand_mod
    from iresearch_spark.query.executor import (
        IndexSearcher,
        _make_segment_kernel,
    )
    from iresearch_spark.store import SnapshotStore

    spark = bench._mk_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    idx_root = os.path.join(root, "index")
    if not os.path.exists(os.path.join(idx_root, "snapshots")):
        # deterministic heavy-tail anchor tf: doc i repeats the phrase
        # "anchor corpus" round(80 / (1 + (i*2654435761 % 997))) times —
        # a few hundred high-tf docs per million, tf=1 bulk, plus pure
        # "corpus"-only docs diluting the hot slot.  dl varies with a
        # second hash so (max_tf, min_dl) bounds spread across blocks.
        df_seq = (
            spark.range(n_docs)
            .withColumn("h1", (F.col("id") * 2654435761) % 997)
            .withColumn("h2", (F.col("id") * 40503) % 53)
            .withColumn(
                "reps",
                F.when(F.col("h1") < 1, 80)
                .when(F.col("h1") < 8, 12)
                .when(F.col("h1") < 60, 3)
                .otherwise(1),
            )
            .withColumn(
                "has_anchor", (F.col("id") % 3) == 0
            )  # anchor df = n/3; "corpus" df = n (the hot slot)
            .select(
                F.format_string("%09d", F.col("id")).alias("url"),
                F.concat(
                    F.when(
                        F.col("has_anchor"),
                        F.expr(
                            "repeat('anchor corpus ', CAST(reps AS INT))"
                        ),
                    ).otherwise(F.lit("")),
                    F.lit("corpus "),
                    F.expr("repeat('pad word ', CAST(h2 AS INT))"),
                ).alias("text"),
            )
        )
        store = SnapshotStore(idx_root)
        build_index(
            spark, df_seq, store,
            n_segments=int(os.environ.get("WP_SEGMENTS", "16")),
            source=f"posprune-{n_docs}",
        )
    store = SnapshotStore(idx_root)
    sid = store.current_snapshot_id()
    s = IndexSearcher(spark, store, sid)
    fields = s.field_names
    avgdl = s.avgdl_by_field.get("text", s.avgdl)

    terms = ["anchor", "corpus"]
    rows = (
        store.read_postings(spark, sid)
        .filter(F.col("field") == "text")
        .filter(F.col("term").isin(terms))
        .select(
            "seg_id", "field", "term", "blob", "skip", "bmax", "df",
            "pos_off", "pos_pay",
        )
        .collect()
    )
    seg_pdfs: dict[int, list] = {}
    for r in rows:
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
    seg_pdfs = {sg: pd.DataFrame(v) for sg, v in seg_pdfs.items()}
    text_fidx = fields.index("text")
    norm_rows = (
        store.read_norms(spark, sid)
        .filter(F.col("fidx") == text_fidx)
        .select("seg_id", "fidx", "dls_bin")
        .collect()
    )
    norm_pdfs = {
        int(r["seg_id"]): pd.DataFrame(
            {
                "seg_id": [int(r["seg_id"])],
                "fidx": [text_fidx],
                "dls_bin": [bytes(r["dls_bin"])],
            }
        )
        for r in norm_rows
    }
    gdf = {
        t: sum(
            int(pdf.loc[pdf["term"] == t, "df"].sum())
            for pdf in seg_pdfs.values()
        )
        for t in terms
    }
    idf = {("text", t): s.idf(gdf[t]) for t in terms}
    tree = qf.Phrase(terms, field="text")

    def run(scored_all):
        dec_lead = blocks_lead = dec_all = blocks_all = 0
        out_rows = {}
        for sg in sorted(seg_pdfs):
            kern = _make_segment_kernel(
                {0: tree}, idf, {"text": avgdl}, fields,
                BM25_K1, BM25_B, k, True, score_round=6,
                n_docs=s.n_docs, scored_all=scored_all,
            )
            wand_mod.INSTRUMENT = []
            try:
                out = kern(seg_pdfs[sg], norm_pdfs[sg])
            finally:
                readers = wand_mod.INSTRUMENT
                wand_mod.INSTRUMENT = None
            lead_df = min(r.df for r in readers)
            for r in readers:
                dec_all += len(r.decoded)
                blocks_all += r.n_blocks
                if r.df == lead_df:
                    dec_lead += len(r.decoded)
                    blocks_lead += r.n_blocks
            for rr in out.itertuples():
                out_rows[(sg, int(rr.doc_id))] = float(rr.score)
        return out_rows, dec_lead, blocks_lead, dec_all, blocks_all

    pruned, dl_p, bl_p, da_p, ba_p = run(False)
    full, dl_f, bl_f, da_f, ba_f = run(True)
    want = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert all(full.get(key) == sc for key, sc in pruned.items())
    assert {key for key, _ in want} <= set(pruned), "global head not covered"
    print(
        json.dumps(
            {
                "metric": "positional_block_decode_fraction",
                "n_docs": n_docs,
                "k": k,
                "dfs": gdf,
                "lead_blocks_total": bl_f,
                "lead_blocks_decoded_exhaustive": dl_f,
                "lead_blocks_decoded_pruned": dl_p,
                "lead_decode_frac_exhaustive": round(dl_f / bl_f, 4),
                "lead_decode_frac_pruned": round(dl_p / bl_p, 4),
                "all_decode_frac_exhaustive": round(da_f / ba_f, 4),
                "all_decode_frac_pruned": round(da_p / ba_p, 4),
                "rank_identical": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]) if len(sys.argv) > 3 else 10,
    )
