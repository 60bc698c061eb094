"""ParquetMergeTarget — the engine's Target implementation.

Mirrors the reference's 4-method target abstraction
(reference target/interface.go:16-27): InitializeRelation (backfill),
Write (apply a change batch), VerifyRelation (schema diff), Close.

Storage layout is versioned directories with an atomic pointer file —
the scratch-and-swap publish strategy (A12): the reference loads into
``<TABLE>_SCRATCH`` then ``ALTER TABLE … SWAP WITH``
(snowflake_target.go:140-215) because readers must never see partial
state. Here every write lands in a fresh ``v_<n>`` directory and a
``_CURRENT`` pointer file is os.replace()'d — atomic on POSIX, and the
same manifest-pointer pattern object-store table formats use, so the
design carries to S3/HDFS at scale (writers never mutate a live
directory; readers resolve the pointer once per query).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..operators import merge_upsert, merge_upsert_flagged
from ..types import Relation


class ParquetMergeTarget:
    """One relation's merge target on parquet with MERGE semantics."""

    def __init__(self, spark: SparkSession, root: str, key_cols: list[str], value_cols: list[str]):
        self.spark = spark
        self.root = root
        self.key_cols = key_cols
        self.value_cols = value_cols
        os.makedirs(root, exist_ok=True)

    # -- version pointer ------------------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _publish(self, version: int) -> None:
        # write-then-rename: readers see either the old or the new pointer,
        # never a torn one (the swap of A12)
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_CURRENT.")
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer)

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v_{version}")

    # -- Target interface ------------------------------------------------
    def initialize(self, df: DataFrame) -> None:
        """Backfill (A1/A11/A12): full snapshot -> fresh version -> swap.
        The writer parallelizes the load (the reference's chunked PUT,
        snowflake_target.go:146-217, is task parallelism here)."""
        v = (self.current_version() or 0) + 1
        df.write.mode("overwrite").parquet(self._version_dir(v))
        self._publish(v)

    def read(self) -> DataFrame:
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"target {self.root} not initialized")
        return self.spark.read.parquet(self._version_dir(v))

    def write(self, compacted: DataFrame, flagged: bool = False) -> int:
        """Apply one compacted micro-batch as a set-based MERGE (A14/A15)
        and publish atomically. Returns the new version number.

        Precondition (same as the reference's Grouper before Write):
        ``compacted`` has at most one action per key.
        """
        target = self.read()
        if flagged:
            merged = merge_upsert_flagged(target, compacted, self.key_cols, self.value_cols)
        else:
            merged = merge_upsert(target, compacted, self.key_cols, self.value_cols)
        v = (self.current_version() or 0) + 1
        merged.write.mode("overwrite").parquet(self._version_dir(v))
        self._publish(v)
        return v

    # -- maintenance / time travel ---------------------------------------
    def versions(self) -> list[int]:
        """All retained version numbers, ascending."""
        out = []
        for name in os.listdir(self.root):
            if name.startswith("v_"):
                try:
                    out.append(int(name[2:]))
                except ValueError:
                    continue
        return sorted(out)

    def read_version(self, version: int) -> DataFrame:
        """Time travel: read a retained historical version. Immutable
        version directories make this free — the same property that makes
        the publish atomic (readers of v(n-1) are never disturbed by the
        v(n) writer) also gives audit/rollback reads, exactly as in
        manifest-pointer table formats."""
        d = self._version_dir(version)
        if not os.path.isdir(d):
            raise FileNotFoundError(f"version {version} not retained in {self.root}")
        return self.spark.read.parquet(d)

    def compact_files(self, target_files: int = 1) -> int:
        """Small-file maintenance: rewrite the CURRENT version into
        ``target_files`` files as a NEW version and swap the pointer.
        Micro-batch MERGE writers accrete many small files (each epoch
        rewrites with the write parallelism of the merge); at scale the
        read cost is dominated by file-open overhead until a compaction
        pass like this runs. Data is byte-identical — only layout changes
        — and history stays readable."""
        df = self.read().coalesce(target_files)
        v = (self.current_version() or 0) + 1
        df.write.mode("overwrite").parquet(self._version_dir(v))
        self._publish(v)
        return v

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Retention: drop all but the newest ``keep_last`` versions
        (never the current). Returns the versions removed. The pointer
        file is the commit record, so removal order doesn't matter —
        readers resolving the pointer never see a half-deleted current
        version."""
        import shutil

        vs = self.versions()
        cur = self.current_version()
        victims = [v for v in vs[:-keep_last] if v != cur] if keep_last > 0 else []
        for v in victims:
            shutil.rmtree(self._version_dir(v))
        return victims

    def verify(self, relation: Relation) -> bool:
        """A18: schema verification against the expected relation."""
        current = self.read().schema
        expected = relation.spark_schema()
        return [(f.name, f.dataType) for f in current.fields] == [
            (f.name, f.dataType) for f in expected.fields
        ]
