"""Consolidation policies (SURVEY.md M2) — driver-side candidate selection
over segment metadata, mirroring [up] core/utils/index_utils.cpp:

  consolidate_tier        log-structured tiered merge (the default policy;
                          floor-adjusted sizes, candidate windows over the
                          size-sorted live segment list, skew-scored)
  consolidate_count       merge when the live segment count exceeds a cap
  consolidate_bytes_accum accumulate smallest segments up to a byte budget
  consolidate_bytes       segments smaller than threshold x the per-segment
                          average byte size
  consolidate_docs_live   segments whose live-doc count is below threshold
                          x the per-segment average
  consolidate_docs_fill   segments whose live/total doc fill ratio dropped
                          below threshold (delete-heavy segments)

Each policy is a pure function: (segment metas) -> list of seg_ids to merge
(empty = nothing to do). `consolidate()` drives policy -> merge_segments
rounds until quiescent — the log-structured loop of the reference's
index_writer::consolidate.
"""

from __future__ import annotations

import os

from iresearch_spark.build.merge import merge_segments
from iresearch_spark.store import SnapshotStore


def segment_bytes(store: SnapshotStore, seg: dict) -> int:
    """On-disk footprint of one segment (docs + postings + norms dirs)."""
    total = 0
    for key in ("docs_path", "postings_path", "norms_path"):
        d = store.abs_path(seg.get(key, ""))
        if os.path.isdir(d):
            for root, _dirs, files in os.walk(d):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def consolidate_tier(
    segments: list[dict],
    sizes: dict[int, int],
    *,
    min_segments: int = 2,
    max_segments: int = 10,
    floor_segment_bytes: int = 1 << 21,
    max_segments_bytes: int = 5 << 30,
    min_score: float = 0.0,
) -> list[int]:
    """Tiered candidate selection: sort live segments by floor-adjusted
    size, slide windows of [min_segments, max_segments] consecutive
    segments whose total stays under max_segments_bytes, score each window
    by count utilization x size balance (1 - largest/total), and return
    the best-scoring window above min_score.

    Floor adjustment (small segments count as floor_segment_bytes) is what
    makes the policy log-structured: many tiny flush segments always look
    mergeable, while a window spanning very different tiers scores low on
    balance — the skew penalty of the reference's tier policy."""
    if len(segments) < min_segments:
        return []
    adj = sorted(
        (
            (max(sizes.get(int(s["seg_id"]), 0), floor_segment_bytes), int(s["seg_id"]))
            for s in segments
        ),
    )
    best: tuple[float, list[int]] | None = None
    n = len(adj)
    for i in range(n):
        total = 0
        largest = 0
        for j in range(i, min(i + max_segments, n)):
            size_j = adj[j][0]
            total += size_j
            largest = max(largest, size_j)
            count = j - i + 1
            if total > max_segments_bytes:
                break
            if count < min_segments:
                continue
            balance = 1.0 - largest / total
            utilization = count / max_segments
            score = 0.5 * balance + 0.5 * utilization
            if score > min_score and (best is None or score > best[0]):
                best = (score, [adj[x][1] for x in range(i, j + 1)])
    return best[1] if best else []


def consolidate_count(
    segments: list[dict], sizes: dict[int, int], *, max_segments: int = 8
) -> list[int]:
    """Merge ALL live segments whenever more than max_segments exist
    ([up] index_utils :: consolidate_count)."""
    if len(segments) <= max_segments:
        return []
    return sorted(int(s["seg_id"]) for s in segments)


def consolidate_bytes_accum(
    segments: list[dict],
    sizes: dict[int, int],
    *,
    byte_budget: int = 1 << 28,
) -> list[int]:
    """Accumulate the smallest segments until the byte budget is hit
    ([up] index_utils :: consolidate_bytes_accum)."""
    order = sorted(
        (sizes.get(int(s["seg_id"]), 0), int(s["seg_id"])) for s in segments
    )
    out, total = [], 0
    for size, sid_ in order:
        if total + size > byte_budget and len(out) >= 2:
            break
        total += size
        out.append(sid_)
    return out if len(out) >= 2 else []


def consolidate_bytes(
    segments: list[dict],
    sizes: dict[int, int],
    *,
    threshold: float = 0.5,
) -> list[int]:
    """Merge every segment smaller than threshold × the average segment
    byte size ([up] index_utils :: consolidate_bytes)."""
    if len(segments) < 2:
        return []
    ids = [int(s["seg_id"]) for s in segments]
    avg = sum(sizes.get(i, 0) for i in ids) / len(ids)
    out = sorted(i for i in ids if sizes.get(i, 0) <= threshold * avg)
    return out if len(out) >= 2 else []


def consolidate_docs_live(
    segments: list[dict],
    sizes: dict[int, int],
    *,
    threshold: float = 0.5,
    masked: dict[int, int] | None = None,
) -> list[int]:
    """Merge every segment whose LIVE doc count (total minus tombstoned)
    is below threshold × the average live count
    ([up] index_utils :: consolidate_docs_live)."""
    if len(segments) < 2:
        return []
    masked = masked or {}
    live = {
        int(s["seg_id"]): int(s["n_docs"]) - masked.get(int(s["seg_id"]), 0)
        for s in segments
    }
    avg = sum(live.values()) / len(live)
    out = sorted(i for i, n in live.items() if n <= threshold * avg)
    return out if len(out) >= 2 else []


def consolidate_docs_fill(
    segments: list[dict],
    sizes: dict[int, int],
    *,
    threshold: float = 0.8,
    masked: dict[int, int] | None = None,
) -> list[int]:
    """Merge every segment whose fill ratio live/total fell below
    `threshold` — compacts delete-heavy segments
    ([up] index_utils :: consolidate_docs_fill)."""
    masked = masked or {}
    out = []
    for s in segments:
        sid_ = int(s["seg_id"])
        n = int(s["n_docs"])
        if n and (n - masked.get(sid_, 0)) / n < threshold:
            out.append(sid_)
    return sorted(out)


def masked_counts(spark, store: SnapshotStore, snap: dict) -> dict[int, int]:
    """seg_id -> tombstoned-doc count (for the docs_live / docs_fill
    policies). Computed distributively — only the per-segment COUNT (one
    int per segment) reaches the driver, never the mask arrays."""
    from pyspark.sql import functions as F

    rows = (
        store.read_masks(spark, snap.get("snapshot_id"))
        .groupBy("seg_id")
        .agg((F.sum(F.length("mask_bin")) / 4).cast("long").alias("n"))
        .collect()
    )
    return {int(r["seg_id"]): int(r["n"]) for r in rows}


def consolidate(
    spark,
    store: SnapshotStore,
    policy=consolidate_tier,
    *,
    max_rounds: int = 10,
    **policy_kwargs,
) -> list[int]:
    """Run policy->merge rounds until the policy returns no candidates.
    Returns the snapshot ids committed (one per merge round). The index
    write lock is held across ALL rounds (merge_segments re-enters it), so
    a consolidation is one writer session, as upstream's."""
    with store.write_lock(owner=f"consolidate:{policy.__name__}"):
        return _consolidate_impl(
            spark, store, policy, max_rounds=max_rounds, **policy_kwargs
        )


def _consolidate_impl(
    spark, store, policy, *, max_rounds, **policy_kwargs
) -> list[int]:
    import inspect

    committed: list[int] = []
    wants_masked = "masked" in inspect.signature(policy).parameters
    for _ in range(max_rounds):
        snap = store.snapshot()
        if snap is None or len(snap["segments"]) < 2:
            break
        sizes = {
            int(s["seg_id"]): segment_bytes(store, s) for s in snap["segments"]
        }
        kwargs = dict(policy_kwargs)
        if wants_masked and "masked" not in kwargs:
            kwargs["masked"] = masked_counts(spark, store, snap)
        cand = policy(snap["segments"], sizes, **kwargs)
        if not cand:
            break
        # a single-segment candidate is a compaction rewrite (docs_fill on
        # a delete-heavy segment) — valid, and terminates because the
        # rewritten segment carries no tombstones
        committed.append(merge_segments(spark, store, cand))
    return committed
