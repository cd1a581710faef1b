from iresearch_spark.store.snapshot import (
    LockHeldError,
    SnapshotStore,
    WriteLock,
)

__all__ = ["LockHeldError", "SnapshotStore", "WriteLock"]
