"""Compose BENCH.md's Pair-1 numbers from the recorded scaling reps.

Inputs (bench_runs/): full `bench.py --scaling --widths=2,8` reports
(scaling_2v8_*.json) plus extra `--single-scaling-run` rep lines
(local8_reps.jsonl, scale24_reps.jsonl ...). Capacity per width = min
over its reps (min-of-N under interference; every rep is listed in
BENCH.md so the estimate is auditable). Run from the repo root:

    python scripts/compose_bench.py          # prints the pair-1 table
"""

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(ROOT, "bench_runs")


def load_reps() -> dict[tuple[int, int], dict[int, list[dict]]]:
    """-> {n_docs: {cpus: [{'build_s':…, 'query_s':…}, …]}}"""
    by_scale: dict[int, dict[int, list[dict]]] = {}

    def add(docs: int, cpus: int, build_s: float, query_s: float) -> None:
        by_scale.setdefault(docs, {}).setdefault(cpus, []).append(
            {"build_s": build_s, "query_s": query_s}
        )

    for path in sorted(glob.glob(os.path.join(RUNS, "scaling_*.json"))):
        rep = json.load(open(path))
        docs = rep["input_docs"]
        for w in rep["widths"]:
            for r in rep["all_runs"][f"local{w}"]:
                add(docs, w, r["build_s"], r["query_s"])
    for path in sorted(glob.glob(os.path.join(RUNS, "*reps.jsonl"))):
        for ln in open(path):
            r = json.loads(ln)
            docs = int(str(r["sf"]).split("-")[-1])
            add(
                docs,
                r["cpus"],
                r["build"]["wall_s"],
                r["queries"]["batch300"],
            )
    return by_scale


def pair_table(reps: dict[int, list[dict]], n: int, n4: int, docs: int) -> str:
    ln, l4 = reps[n], reps[n4]
    b_n = min(r["build_s"] for r in ln)
    q_n = min(r["query_s"] for r in ln)
    b_4 = min(r["build_s"] for r in l4)
    q_4 = min(r["query_s"] for r in l4)
    rows = lambda rs: "; ".join(f"{r['build_s']:.0f}/{r['query_s']:.0f}" for r in rs)
    return (
        f"### {docs:,} docs — local[{n}] vs local[{n4}]\n\n"
        f"| phase | local[{n}] | local[{n4}] | efficiency |\n|---|---|---|---|\n"
        f"| index build (docs/sec) | {docs / b_n:,.0f} | {docs / b_4:,.0f} |"
        f" **{b_n / (4 * b_4):.2f}** |\n"
        f"| 300-query BM25 batch (s) | {q_n:.1f} | {q_4:.1f} |"
        f" **{q_n / (4 * q_4):.2f}** |\n"
        f"| end-to-end (s) | {b_n + q_n:.1f} | {b_4 + q_4:.1f} |"
        f" **{(b_n + q_n) / (4 * (b_4 + q_4)):.2f}** |\n\n"
        f"All reps (build_s/query_s): local[{n}]: {rows(ln)} — "
        f"local[{n4}]: {rows(l4)}.\n"
    )


if __name__ == "__main__":
    for docs, by_w in sorted(load_reps().items()):
        widths = sorted(by_w)
        for i in range(len(widths) - 1):
            n, n4 = widths[i], widths[i + 1]
            if n4 == 4 * n:
                print(pair_table(by_w, n, n4, docs))
