from .snapshot import read_csv_snapshot, snapshot_to_target
from .target import ParquetMergeTarget

__all__ = ["ParquetMergeTarget", "read_csv_snapshot", "snapshot_to_target"]
