from iresearch_spark.store.snapshot import SnapshotStore

__all__ = ["SnapshotStore"]
