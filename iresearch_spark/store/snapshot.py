"""Iceberg-shaped snapshot layer over parquet: atomic two-phase commit,
pinned-snapshot reads, per-partition lineage + build metrics.

Plays the role of the reference's directory + index-generation commit
([up] core/store/fs_directory.cpp, [up] core/index/index_writer.cpp ::
begin()/commit() — stage pending meta, then atomically publish the new
generation) and of the Iceberg catalog required by BASELINE.json:14/15
(no Iceberg runtime jar exists in this sandbox — SURVEY.md §0 — so the
manifest layer is explicit JSON with the same shape: snapshots, manifests
of data files, summary stats; a real Iceberg catalog can replace it on a
cluster without touching the build/query jobs).

Layout:
    <root>/data/<commit-uuid>/<table>/seg_id=<n>/*.parquet
    <root>/snapshots/snap-<id>.json
    <root>/CURRENT                      (text: latest snapshot id)

Atomicity: manifests and CURRENT are written to a temp file then
os.rename()d — POSIX-atomic on one filesystem; on HDFS/S3 this maps to the
usual rename/putIfAbsent commit protocol.

Resumability (BASELINE.json:14 "resumable from checkpoint with
per-partition lineage + metrics"): a snapshot's `lineage` records, per
segment partition, the source corpus fingerprint and build metrics; an
interrupted build leaves data dirs but no snapshot — rerun skips segments
already recorded in a staged checkpoint (see build.indexer.build_index).
"""

from __future__ import annotations

import errno
import json
import os
import socket
import threading
import time
import uuid


class LockHeldError(RuntimeError):
    """Another writer holds the index's write lock."""


# Per-process reentrancy: root path -> {"count": int, "token": str}.
# Mirrors the reference's one-index_writer-per-directory rule ([up]
# core/index/index_writer.cpp :: index_writer::make acquiring
# index_lock via directory::make_lock) — within one process the same
# writer may nest (build -> commit); across processes the lock file is
# the arbiter.
_HELD: dict[str, dict] = {}
_HELD_GUARD = threading.Lock()


class WriteLock:
    """Single-writer lock on an index root ([up] core/store/directory.hpp
    :: index_lock; fs_directory::make_lock("write.lock") — Lucene-style).

    Acquisition is an atomic create-if-absent of `<root>/write.lock`
    (O_CREAT|O_EXCL — POSIX-atomic; on HDFS/S3 this maps to the usual
    create-if-absent / putIfAbsent primitive). The file body records
    {owner, host, pid, ts, token}; release removes the file only if the
    token still matches, so a stolen/broken lock is never double-freed.

    A lock whose recorded pid is provably dead ON THIS HOST is broken
    automatically (a crashed writer must not brick the index — upstream
    surfaces this as the index_lock being forcibly unlocked); a live or
    remote holder raises LockHeldError after `timeout_s`. Reentrant per
    process per root: maintenance entry points hold it for their whole
    stage+commit span while commit() re-enters freely.
    """

    def __init__(self, root: str, owner: str = "", timeout_s: float = 0.0):
        self.root = root
        self.path = os.path.join(root, "write.lock")
        self.owner = owner
        self.timeout_s = timeout_s
        self._token: str | None = None

    # ---------------------------------------------------------- internals

    def _holder(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None  # gone, or mid-write — caller retries

    @staticmethod
    def _pid_alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            return True
        return True

    def _try_break_stale(self) -> bool:
        """Remove the lock if its holder is a dead pid on this host."""
        h = self._holder()
        if not h:
            return True  # already gone
        if h.get("host") == socket.gethostname() and not self._pid_alive(
            int(h.get("pid", -1))
        ):
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass
            return True
        return False

    # ------------------------------------------------------------- public

    def acquire(self) -> "WriteLock":
        with _HELD_GUARD:
            held = _HELD.get(self.root)
            if held:
                held["count"] += 1
                self._token = held["token"]
                return self
        deadline = time.time() + self.timeout_s
        while True:
            token = uuid.uuid4().hex
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except OSError as e:
                if e.errno != errno.EEXIST:
                    raise
                if self._try_break_stale():
                    continue
                if time.time() >= deadline:
                    h = self._holder() or {}
                    raise LockHeldError(
                        f"index at {self.root} is write-locked by "
                        f"{h.get('owner') or '?'} (pid {h.get('pid')} on "
                        f"{h.get('host')}, since {h.get('ts')}); pass a "
                        "timeout to wait, or remove write.lock if the "
                        "holder is known dead"
                    ) from None
                time.sleep(0.05)
                continue
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {
                        "owner": self.owner,
                        "host": socket.gethostname(),
                        "pid": os.getpid(),
                        "ts": int(time.time()),
                        "token": token,
                    },
                    f,
                )
                f.flush()
                os.fsync(f.fileno())
            self._token = token
            with _HELD_GUARD:
                _HELD[self.root] = {"count": 1, "token": token}
            return self

    def release(self) -> None:
        if self._token is None:
            return
        with _HELD_GUARD:
            held = _HELD.get(self.root)
            if held and held["token"] == self._token:
                held["count"] -= 1
                if held["count"] > 0:
                    return
                del _HELD[self.root]
        h = self._holder()
        if h and h.get("token") == self._token:
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass
        self._token = None

    def __enter__(self) -> "WriteLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()


class SnapshotStore:
    def __init__(self, root: str, key: bytes | str | None = None):
        self.root = os.path.abspath(root)
        os.makedirs(os.path.join(self.root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "data"), exist_ok=True)
        # S9 encryption at rest ([up] core/utils/encryption.hpp — the
        # cipher is a property of the directory): when a key is given,
        # every table write encrypts its content-bearing columns and
        # every committed-table read decrypts them (store/crypto.py).
        if key is not None:
            from iresearch_spark.store.crypto import IndexCipher

            self.cipher = IndexCipher(key)
        else:
            self.cipher = None

    # ---------------------------------------------------------- encryption

    def encrypt_table(self, df, kind: str, extra_str: tuple[str, ...] = ()):
        """Writer-side hook: encrypt `df`'s content columns for table
        `kind` when this store holds a key; identity otherwise. Every
        persisted table — committed AND staged (crash-surviving staging
        is at-rest data too) — passes through here. extra_str: dynamic
        string-typed content columns (user stored_cols) encrypted like
        url/lang."""
        if self.cipher is None:
            return df
        return self.cipher.encrypt_df(df, kind, extra_str=extra_str)

    def decrypt_staged(self, df, kind: str, extra_str: tuple[str, ...] = ()):
        """Reader-side hook for THIS writer's own staged tables (the
        assigned checkpoint, merge survivors/remap): these were written
        with self.cipher — the snapshot may not even exist yet."""
        if self.cipher is None:
            return df
        return self.cipher.decrypt_df(df, kind, extra_str=extra_str)

    def stored_str_cols(self, snapshot_id: int | None = None) -> tuple:
        """Names of the snapshot's string-typed stored user columns — the
        dynamic at-rest-encrypted set for docs/survivors tables."""
        snap = self.snapshot(snapshot_id) or {}
        return tuple(
            d["name"]
            for d in snap.get("stored") or []
            if d.get("type") == "string"
        )

    def reader_cipher(self, snapshot_id: int | None = None):
        """The cipher needed to read the given snapshot's data, derived
        from the MANIFEST (not from what the caller happens to hold):
        returns None for plaintext snapshots, the store's verified cipher
        for encrypted ones, and fails fast with a clear error when the
        key is missing or wrong (kcv mismatch) — instead of a cryptic
        executor-side GCM tag failure."""
        snap = self.snapshot(snapshot_id)
        rec = (snap or {}).get("cipher")
        if not rec:
            return None
        if self.cipher is None:
            raise ValueError(
                f"index at {self.root} is encrypted ({rec.get('name')}); "
                "open SnapshotStore with its key"
            )
        if self.cipher.kcv != rec.get("kcv"):
            raise ValueError(
                f"wrong key for encrypted index at {self.root} "
                "(key-check mismatch)"
            )
        return self.cipher

    def decrypt_table(self, df, kind: str, snapshot_id: int | None = None):
        """Reader-side hook for committed tables: decrypt per the
        snapshot's cipher record (identity for plaintext snapshots).
        Stored user columns (string-typed) are derived from the manifest
        so readers need no out-of-band schema knowledge."""
        cipher = self.reader_cipher(snapshot_id)
        if cipher is None:
            return df
        extra = (
            self.stored_str_cols(snapshot_id)
            if kind in ("docs", "survivors")
            else ()
        )
        return cipher.decrypt_df(df, kind, extra_str=extra)

    def read_parquet(self, spark, paths: list[str], kind: str,
                     snapshot_id: int | None = None):
        """Read committed table files by absolute path, decrypted per the
        snapshot cipher — the funnel for maintenance jobs that read
        per-segment paths directly (merge/consolidate)."""
        return self.decrypt_table(
            spark.read.parquet(*paths), kind, snapshot_id
        )

    # ------------------------------------------------------------- paths

    def write_lock(self, owner: str = "", timeout_s: float = 0.0) -> WriteLock:
        """Single-writer lock for this index root (see WriteLock). Entry
        points that stage data before committing hold it for their whole
        span; commit() re-enters it, so bare commit() calls are serialized
        too."""
        return WriteLock(self.root, owner=owner, timeout_s=timeout_s)

    def new_commit_dir(self) -> str:
        """Fresh data directory for a pending (uncommitted) write."""
        d = os.path.join(self.root, "data", uuid.uuid4().hex[:12])
        os.makedirs(d, exist_ok=True)
        return d

    def _snap_path(self, sid: int) -> str:
        return os.path.join(self.root, "snapshots", f"snap-{sid:08d}.json")

    # ---------------------------------------------------------- snapshots

    def current_snapshot_id(self) -> int | None:
        cur = os.path.join(self.root, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return int(f.read().strip())

    def snapshot(self, sid: int | None = None) -> dict | None:
        if sid is None:
            sid = self.current_snapshot_id()
            if sid is None:
                return None
        with open(self._snap_path(sid)) as f:
            return json.load(f)

    def snapshots(self) -> list[int]:
        d = os.path.join(self.root, "snapshots")
        return sorted(
            int(f[5:-5]) for f in os.listdir(d) if f.startswith("snap-") and f.endswith(".json")
        )

    def _atomic_write(self, path: str, payload: str) -> None:
        tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def commit(
        self,
        segments: list[dict],
        stats: dict,
        lineage: list[dict] | None = None,
        metrics: dict | None = None,
        operation: str = "append",
        fields: list[dict] | None = None,
        streams: dict[str, int] | None = None,
        sort: str | None = "__inherit__",
        stored: list[dict] | str = "__inherit__",
    ) -> int:
        """Publish a new snapshot. `segments` is the FULL live segment list:
        [{seg_id, docs_path, postings_path, n_docs, sum_dl, n_terms, ...}];
        paths are relative to root. `fields` is the indexed-field spec list
        (name/source/analyzer dicts) — carried forward from the parent when
        omitted, so maintenance commits keep the analysis contract.
        `streams` records per-stream ingest watermarks {stream_name:
        last_batch_id}; merged over the parent's (other streams keep
        theirs) and carried forward when omitted, so the watermark and the
        data publish are ONE atomic rename — the exactly-once anchor for
        streaming ingest (see streaming.ingest). Returns the new snapshot
        id."""
        with self.write_lock(owner=f"commit:{operation}"):
            return self._commit_locked(
                segments, stats, lineage, metrics, operation, fields,
                streams, sort, stored,
            )

    def _commit_locked(
        self, segments, stats, lineage, metrics, operation, fields,
        streams, sort, stored="__inherit__",
    ) -> int:
        parent = self.current_snapshot_id()
        parent_snap = self.snapshot(parent) if parent is not None else None
        if fields is None and parent_snap is not None:
            fields = parent_snap.get("fields")
        if sort == "__inherit__":
            # the primary-sort spec is part of the index identity (like the
            # field specs): maintenance commits (which don't pass `sort`)
            # carry it forward so merges keep re-sorting by it ([up]
            # core/index/comparer.hpp — the index_writer's comparer is
            # fixed at writer construction). build_index passes its
            # sort_by explicitly (None included), so a replace-mode
            # rebuild can clear or change it.
            sort = (parent_snap or {}).get("sort")
        if stored == "__inherit__":
            # stored-column spec is index identity exactly like `sort`:
            # maintenance commits carry it forward; build_index passes its
            # stored_cols explicitly (empty list included).
            stored = (parent_snap or {}).get("stored")
        parent_streams = (parent_snap or {}).get("streams") or {}
        streams = {**parent_streams, **(streams or {})}
        # Encryption is part of the index identity like the field specs:
        # non-rebuild commits must keep the parent's cipher (same kcv);
        # a replace-mode rebuild may switch (its data dirs are fresh and
        # the old generation's are retired by expire+gc).
        cipher_rec = self.cipher.describe() if self.cipher else None
        parent_cipher = (parent_snap or {}).get("cipher")
        if parent_snap is not None and operation != "rebuild":
            if (parent_cipher or None) != (cipher_rec or None):
                raise ValueError(
                    "commit cipher does not match the live index's "
                    "(encrypted indexes require the same key for every "
                    "append/maintenance commit; rebuild to change it)"
                )
        sid = (parent or 0) + 1
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent,
            "timestamp_ms": int(time.time() * 1000),
            "operation": operation,
            "segments": segments,
            "stats": stats,
            "lineage": lineage or [],
            "metrics": metrics or {},
            "fields": fields or [],
            "streams": streams,
            "sort": sort,
            "stored": stored or [],
            "cipher": cipher_rec,
        }
        snap_path = self._snap_path(sid)
        if os.path.exists(snap_path):
            raise RuntimeError(f"snapshot {sid} already exists (concurrent commit?)")
        self._atomic_write(snap_path, json.dumps(manifest, indent=1))
        self._atomic_write(os.path.join(self.root, "CURRENT"), str(sid))
        return sid

    def rollback_to(self, snapshot_id: int) -> int:
        """Publish a NEW generation that restores an older snapshot's
        state — Iceberg's `rollback_to_snapshot`, and the directory-level
        analogue of the reference recovering by opening an older
        index_meta generation ([up] core/index/index_meta.hpp — every
        commit keeps the prior segments_N files until cleaned, exactly so
        a bad generation can be abandoned). History is preserved: the
        rolled-back-over generations keep their manifests (until
        `expire_snapshots`) and their data dirs stay gc-live, so a
        rollback can itself be rolled back.

        Everything that defines the restored state is copied from the
        TARGET manifest — segments (incl. tombstone masks), stats,
        fields, primary sort, cipher, and the streaming watermarks
        (a rolled-back stream batch's data is gone, so its watermark
        must revert with it or exactly-once replay would skip it).
        Requires the store to be opened with the target generation's key
        (or no key for a plaintext target): the new generation's reads
        decrypt per its manifest, so committing a cipher we cannot
        verify would publish an unreadable index."""
        with self.write_lock(owner=f"rollback:{snapshot_id}"):
            cur = self.current_snapshot_id()
            if cur is None:
                raise FileNotFoundError("no committed snapshot to roll back")
            try:
                target = self.snapshot(int(snapshot_id))
            except FileNotFoundError:
                raise FileNotFoundError(
                    f"snapshot {snapshot_id} does not exist (expired?); "
                    f"available: {self.snapshots()}"
                ) from None
            mine = self.cipher.describe() if self.cipher else None
            theirs = target.get("cipher") or None
            if (theirs or {}).get("kcv") != (mine or {}).get("kcv"):
                raise ValueError(
                    "rollback target's cipher does not match this store's "
                    "key (open SnapshotStore with the target generation's "
                    "key, or with no key for a plaintext target)"
                )
            if int(snapshot_id) == cur:
                return cur
            sid = cur + 1
            manifest = {
                "snapshot_id": sid,
                "parent_id": cur,
                "timestamp_ms": int(time.time() * 1000),
                "operation": "rollback",
                "rolled_back_to": int(snapshot_id),
                "segments": target["segments"],
                "stats": target["stats"],
                "lineage": target.get("lineage") or [],
                "metrics": {"restored_snapshot": int(snapshot_id)},
                "fields": target.get("fields") or [],
                "streams": target.get("streams") or {},
                "sort": target.get("sort"),
                "stored": target.get("stored") or [],
                "cipher": theirs,
            }
            snap_path = self._snap_path(sid)
            if os.path.exists(snap_path):
                raise RuntimeError(
                    f"snapshot {sid} already exists (concurrent commit?)"
                )
            self._atomic_write(snap_path, json.dumps(manifest, indent=1))
            self._atomic_write(os.path.join(self.root, "CURRENT"), str(sid))
            return sid

    def abort_staged(self) -> bool:
        """Discard the staged-but-uncommitted build checkpoint — the
        reference's `index_writer::rollback()` (drop everything buffered
        since the last commit without publishing it). Removes the
        `_staging.json` pointer and its commit dir; committed
        generations are untouched. Returns True if anything was
        discarded. Holds the write lock so a concurrent writer's live
        staging is never swept from under it."""
        import shutil

        with self.write_lock(owner="abort_staged"):
            staging_path = os.path.join(self.root, "_staging.json")
            if not os.path.exists(staging_path):
                return False
            with open(staging_path) as f:
                staged_dir = json.load(f).get("dir", "")
            os.remove(staging_path)
            if staged_dir and os.path.isdir(staged_dir):
                shutil.rmtree(staged_dir, ignore_errors=True)
            return True

    def stream_watermark(self, name: str) -> int | None:
        """Highest micro-batch id committed for stream `name` (None if the
        stream has never committed). Read from the CURRENT manifest only —
        watermarks are carried forward through every commit, including
        maintenance merges, so no snapshot walk is needed and the value
        survives expire_snapshots()."""
        snap = self.snapshot()
        if snap is None:
            return None
        got = (snap.get("streams") or {}).get(name)
        return int(got) if got is not None else None

    # -------------------------------------------------------------- reads

    def abs_path(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def read_docs(self, spark, snapshot_id: int | None = None):
        return self._read(spark, "docs_path", snapshot_id)

    def read_postings(self, spark, snapshot_id: int | None = None):
        return self._read(spark, "postings_path", snapshot_id)

    def read_masks(self, spark, snapshot_id: int | None = None):
        """Per-segment tombstone masks as a DataFrame (seg_id int,
        mask_bin binary) — one row per masked segment, possibly empty
        ([up] formats.hpp document_mask). Always a distributed read: mask
        blobs are joined/cogrouped by seg_id downstream, never collected
        into a driver dict (a delete matching most of a huge corpus must
        not ride the driver or task closures)."""
        snap = self.snapshot(snapshot_id)
        mask_paths = sorted(
            {
                self.abs_path(s["mask_path"])
                for s in snap["segments"]
                if s.get("mask_path")
            }
        )
        if mask_paths:
            return self.decrypt_table(
                spark.read.parquet(*mask_paths), "masks", snapshot_id
            ).select("seg_id", "mask_bin")
        return spark.createDataFrame([], "seg_id int, mask_bin binary")

    def read_norms(self, spark, snapshot_id: int | None = None):
        """Norms rows + per-segment tombstone mask blob (mask_bin, null when
        the segment has no deletes — [up] formats.hpp document_mask).
        Norms live in per-commit shared tables which may contain retired
        segments; the result is filtered to the snapshot's LIVE seg_ids."""
        from pyspark.sql import functions as F

        norms = self._read(spark, "norms_path", snapshot_id)
        snap = self.snapshot(snapshot_id)
        live = [int(s["seg_id"]) for s in snap["segments"]]
        norms = norms.filter(F.col("seg_id").isin(live))
        masks = self.read_masks(spark, snapshot_id)
        return norms.join(masks, "seg_id", "left")

    def _read(self, spark, key: str, snapshot_id: int | None):
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise FileNotFoundError("no committed snapshot")
        if not snap["segments"]:
            # Committed-but-empty index (every doc deleted then
            # consolidated away): readers get empty tables TYPED with the
            # canonical write-side schemas, so searches return zero hits
            # instead of raising and column-presence probes (e.g.
            # payloads) behave exactly as on a non-empty index — the
            # reference's directory_reader likewise opens an index whose
            # last commit holds no segments. Function-local import: the
            # store package must not depend on build at module load.
            from iresearch_spark.build import kernels

            schemas = {
                "docs_path": kernels.with_stored(
                    kernels.DOCS_TABLE_SCHEMA,
                    [
                        (d["name"], d["type"])
                        for d in snap.get("stored") or []
                    ],
                ),
                "postings_path": kernels.POSTING_SCHEMA,
                "norms_path": kernels.NORMS_SCHEMA,
            }
            return spark.createDataFrame([], schemas[key])
        paths = sorted({self.abs_path(s[key]) for s in snap["segments"]})
        kind = {"docs_path": "docs", "postings_path": "postings",
                "norms_path": "norms"}[key]
        return self.decrypt_table(
            spark.read.parquet(*paths), kind, snapshot_id
        )

    # -------------------------------------------------------- maintenance

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Drop snapshot manifests older than the newest `keep_last`
        (Iceberg's expire_snapshots; the reference's retired index
        generations). Returns the expired snapshot ids; data files are
        reclaimed by gc()."""
        with self.write_lock(owner="expire_snapshots"):
            sids = self.snapshots()
            expired = sids[:-keep_last] if keep_last > 0 else sids
            for sid in expired:
                os.remove(self._snap_path(sid))
            return expired

    def gc(self) -> list[str]:
        """Delete commit data directories referenced by NO remaining
        snapshot (safe after expire_snapshots / consolidation retired
        them). Returns removed directories. Holds the write lock — a
        concurrent writer's staged-but-uncommitted data is referenced by
        no snapshot yet and must not be swept from under it — and spares
        the _staging.json checkpoint dir, so an interrupted build's
        resume point survives a gc run."""
        import shutil

        with self.write_lock(owner="gc"):
            live: set[str] = set()
            for sid in self.snapshots():
                snap = self.snapshot(sid)
                for seg in snap["segments"]:
                    for key in (
                        "docs_path", "postings_path", "norms_path", "mask_path",
                    ):
                        rel = seg.get(key)
                        if rel:
                            # data/<commit>/<table>/seg_part=N -> data/<commit>
                            parts = rel.split(os.sep)
                            if len(parts) >= 2:
                                live.add(parts[1])
            staging_path = os.path.join(self.root, "_staging.json")
            if os.path.exists(staging_path):
                with open(staging_path) as f:
                    staged_dir = json.load(f).get("dir", "")
                if staged_dir:
                    live.add(os.path.basename(os.path.normpath(staged_dir)))
            removed = []
            data_root = os.path.join(self.root, "data")
            for d in sorted(os.listdir(data_root)):
                if d not in live:
                    shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                    removed.append(d)
            return removed

    def global_stats(self, snapshot_id: int | None = None) -> dict:
        snap = self.snapshot(snapshot_id)
        if snap is None:
            return {"n_docs": 0, "sum_dl": 0, "avgdl": 0.0, "avgdl_by_field": {}}
        st = dict(snap["stats"])
        n = st.get("n_docs") or 0
        st["avgdl"] = (st["sum_dl"] / n) if n else 0.0
        fsums = st.get("field_sum_dl") or {}
        st["avgdl_by_field"] = {
            name: (v / n if n else 0.0) for name, v in fsums.items()
        }
        return st

    def sort_spec(self, snapshot_id: int | None = None) -> str | None:
        """The index's primary-sort expression (a SQL expression over the
        stored doc columns url/warc_ts/lang), or None for the default url
        order. When set, per-segment docID order is (sort expr ASC, url
        ASC) — the reference's index sort ([up] core/index/comparer.hpp;
        index_writer::init with a comparer), with the sort value living in
        the columnstore exactly as upstream stores its sorted column."""
        snap = self.snapshot(snapshot_id)
        return (snap or {}).get("sort")

    def fields(self, snapshot_id: int | None = None) -> list[dict]:
        """Indexed-field specs frozen at build time (empty = legacy
        single-field snapshot, treated as [{name: 'text', ...}])."""
        snap = self.snapshot(snapshot_id)
        got = (snap or {}).get("fields") or []
        if not got:
            return [{"name": "text", "source": "__text__", "analyzer": "text"}]
        return got
