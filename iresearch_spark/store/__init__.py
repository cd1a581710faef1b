from iresearch_spark.store.crypto import IndexCipher, derive_key
from iresearch_spark.store.snapshot import (
    LockHeldError,
    SnapshotStore,
    WriteLock,
)

__all__ = [
    "IndexCipher",
    "LockHeldError",
    "SnapshotStore",
    "WriteLock",
    "derive_key",
]
