"""Compose BENCH.md from every recorded N-vs-4N scaling rep.

Reads bench_runs/: single-run rep lines (*_reps.jsonl — filename prefix
is the protocol label, e.g. tmpfs_/disk_) and full --scaling reports
(scaling_*.json, disk protocol). Reports, per (protocol, corpus size):

  * min-of-N capacity per width + the efficiency that implies, and
  * every consecutive (w2 -> w8) same-window PAIR's efficiency — the
    only same-window control available on a host whose background
    tenant load swings identical runs 1.5-3x.

Run from the repo root:  python scripts/compose_bench2.py [--write]
"""

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(ROOT, "bench_runs")
N, N4 = 2, 8


def load() -> dict:
    """-> {(protocol, docs): {width: [{'build_s','query_s'}...] in order}}"""
    out: dict = {}

    def add(proto, docs, cpus, b, q):
        out.setdefault((proto, docs), {}).setdefault(cpus, []).append(
            {"build_s": b, "query_s": q}
        )

    for path in sorted(glob.glob(os.path.join(RUNS, "*reps.jsonl"))):
        proto = "tmpfs" if "tmpfs" in os.path.basename(path) else "disk"
        for ln in open(path):
            r = json.loads(ln)
            add(
                proto,
                int(str(r["sf"]).split("-")[-1]),
                r["cpus"],
                r["build"]["wall_s"],
                r["queries"]["batch300"],
            )
    for path in sorted(glob.glob(os.path.join(RUNS, "scaling_*.json"))):
        rep = json.load(open(path))
        for w in rep["widths"]:
            for r in rep["all_runs"][f"local{w}"]:
                add("disk", rep["input_docs"], w, r["build_s"], r["query_s"])
    return out


def eff(tn, t4):
    return tn / (4 * t4)


def section(proto: str, docs: int, by_w: dict) -> str:
    if N not in by_w or N4 not in by_w:
        return ""
    l2, l8 = by_w[N], by_w[N4]
    b2 = min(r["build_s"] for r in l2)
    q2 = min(r["query_s"] for r in l2)
    b8 = min(r["build_s"] for r in l8)
    q8 = min(r["query_s"] for r in l8)
    # consecutive (w2 -> w8) runs form a same-window pair only when the
    # record streams are actually alternating (equal counts); the disk
    # 600k history mixes extra w8-only reps, so no pairing there
    pairs = (
        [
            (
                eff(a["build_s"], b["build_s"]),
                eff(a["query_s"], b["query_s"]),
                eff(a["build_s"] + a["query_s"], b["build_s"] + b["query_s"]),
            )
            for a, b in zip(l2, l8)
        ]
        if len(l2) == len(l8)
        else []
    )
    rows = lambda rs: "; ".join(
        f"{r['build_s']:.0f}/{r['query_s']:.0f}" for r in rs
    )
    pair_str = "; ".join(f"{p[0]:.2f}/{p[1]:.2f}/{p[2]:.2f}" for p in pairs)
    best = max(pairs, key=lambda p: p[2]) if pairs else None
    md = (
        f"### {docs:,} docs — {proto} working dirs\n\n"
        f"| phase | local[{N}] | local[{N4}] | min-of-N efficiency |\n"
        f"|---|---|---|---|\n"
        f"| index build (docs/sec) | {docs / b2:,.0f} | {docs / b8:,.0f} |"
        f" **{eff(b2, b8):.2f}** |\n"
        f"| 300-query BM25 batch (s) | {q2:.1f} | {q8:.1f} |"
        f" **{eff(q2, q8):.2f}** |\n"
        f"| end-to-end (s) | {b2 + q2:.1f} | {b8 + q8:.1f} |"
        f" **{eff(b2 + q2, b8 + q8):.2f}** |\n\n"
        f"All reps (build_s/query_s) local[{N}]: {rows(l2)} — "
        f"local[{N4}]: {rows(l8)}.\n"
    )
    if pairs:
        md += (
            f"Same-window pairs (build/query/e2e eff): {pair_str}"
            + (
                f"; best pair **{best[0]:.2f}/{best[1]:.2f}/{best[2]:.2f}**.\n"
                if best
                else "\n"
            )
        )
    return md + "\n"


if __name__ == "__main__":
    data = load()
    out = []
    for (proto, docs), by_w in sorted(data.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        s = section(proto, docs, by_w)
        if s:
            out.append(s)
    print("".join(out))
