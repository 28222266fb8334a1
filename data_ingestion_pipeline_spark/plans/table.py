"""ManagedTable — a minimal versioned parquet table with atomic swap.

The reference gets transactionality from Postgres (commit/rollback per batch,
``flows/data_ingestion.py:181-185``). Vanilla Spark-on-parquet has no
transactions and no in-place update, so every mutating plan (MERGE, schema
evolution) writes a **new immutable version directory** and then atomically
repoints a tiny ``_LATEST`` pointer file — the same write-new-then-swap idea
Delta Lake's transaction log generalizes (SURVEY.md §4.3). Readers resolve
the pointer once per read, never see partial writes, and concurrent readers
of the old version are undisturbed because old versions are immutable.

Layout::

    <root>/
      _LATEST            # text file: name of the current version dir
      v00000001/...parquet
      v00000002/...parquet

Scale notes: version data is written by executors (a normal distributed
``df.write.parquet``); only the pointer flip is a driver-side metadata
operation (O(1), independent of data size). On HDFS/S3 the pointer write
relies on rename-atomicity; production systems use a log/commit protocol
(Delta/Iceberg) — the interface here is deliberately narrow so a Delta
backend could slot in behind it.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["ManagedTable"]

_POINTER = "_LATEST"


class ManagedTable:
    def __init__(self, spark: SparkSession, root: str, keep_versions: int = 3) -> None:
        self.spark = spark
        self.root = root
        self.keep_versions = keep_versions
        os.makedirs(root, exist_ok=True)

    # -- pointer management -------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.root, _POINTER)

    def current_version(self) -> str | None:
        try:
            with open(self._pointer_path()) as f:
                v = f.read().strip()
            return v or None
        except FileNotFoundError:
            return None

    def exists(self) -> bool:
        return self.current_version() is not None

    def _next_version(self) -> str:
        cur = self.current_version()
        n = int(cur[1:]) + 1 if cur else 1
        return f"v{n:08d}"

    def _swap_pointer(self, version: str) -> None:
        # POSIX rename is atomic within a filesystem: readers see either the
        # old pointer or the new one, never a torn write.
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="._ptr")
        with os.fdopen(fd, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer_path())

    def versions(self) -> list[str]:
        """Retained version directories, oldest first (time-travel targets)."""
        return sorted(d for d in os.listdir(self.root) if d.startswith("v"))

    # -- read / write -------------------------------------------------------

    def read(
        self, version: str | None = None, apply_deletes: bool = True
    ) -> DataFrame:
        """Read the current version, or a retained older one (time travel).

        Versions are immutable once the pointer moves past them, so reading
        ``version="v00000001"`` after later commits is a consistent snapshot
        — the poor man's Delta ``VERSION AS OF``, bounded by keep_versions.

        If the version carries equality-delete sidecars
        (``equality_delete``), they are applied merge-on-read as an
        anti-join unless ``apply_deletes=False`` (the raw-data-file view a
        compaction job reads).
        """
        v = version or self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        path = os.path.join(self.root, v)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"version {v} not retained in {self.root}")
        df = self.spark.read.parquet(path)
        if not apply_deletes:
            return df
        sidecars = self._delete_sidecars(v)
        if not sidecars:
            return df
        from functools import reduce

        from pyspark.sql import functions as F

        keys = reduce(
            DataFrame.unionByName,
            [self.spark.read.parquet(p) for p in sidecars],
        ).distinct()
        # delete sets are small relative to data (bounded by rewrite_deletes
        # cadence) — broadcast the anti-join so the read stays shuffle-free
        return df.join(F.broadcast(keys), list(keys.columns), "left_anti")

    # -- merge-on-read deletes (Iceberg V2 equality-delete style) -----------

    def _deletes_dir(self, version: str) -> str:
        # underscore prefix: Spark's file-source discovery treats _*/.*
        # paths as hidden, so sidecars never pollute the data scan
        return os.path.join(self.root, version, "_deletes")

    def _delete_sidecars(self, version: str) -> list[str]:
        d = self._deletes_dir(version)
        if not os.path.isdir(d):
            return []
        return sorted(
            os.path.join(d, s) for s in os.listdir(d) if s.startswith("d")
        )

    def equality_delete(self, keys: DataFrame, key_cols: Sequence[str]) -> str:
        """Merge-on-read delete: write an equality-delete SIDECAR against
        the current version — the data files are untouched (asserted by
        mtime in pytest). This is the other half of the delete design
        axis: ``delete_where`` is copy-on-write (pay the rewrite at delete
        time, reads stay pure scans); ``equality_delete`` is merge-on-read
        (O(keys) delete commit, every read pays a broadcast anti-join until
        ``rewrite_deletes`` folds the sidecars in). Iceberg V2 equality
        deletes / Delta deletion vectors make exactly this trade.

        All sidecars of a version must share one key-column list (pinned by
        a marker file); delete sets accumulate until rewritten, which is
        the read-amplification knob a table service monitors.
        """
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        d = self._deletes_dir(v)
        os.makedirs(d, exist_ok=True)
        marker = os.path.join(d, "_KEYS")
        spec = ",".join(key_cols)
        if os.path.exists(marker):
            with open(marker) as f:
                prior = f.read().strip()
            if prior != spec:
                raise ValueError(
                    f"equality-delete key mismatch: table uses [{prior}], got [{spec}]"
                )
        else:
            with open(marker, "w") as f:
                f.write(spec)
        seq = len(self._delete_sidecars(v)) + 1
        out = os.path.join(d, f"d{seq:06d}")
        # write-then-rename: _delete_sidecars lists entries starting with
        # "d", so a reader between directory creation and write completion
        # would otherwise see a footerless partial sidecar — the rename
        # makes the sidecar visible atomically, preserving the module's
        # readers-never-see-partial-writes invariant
        tmp = os.path.join(d, f".d{seq:06d}.tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        keys.select(*key_cols).distinct().write.mode("overwrite").parquet(tmp)
        os.rename(tmp, out)
        return v

    def rewrite_deletes(self) -> str:
        """Fold the current version's delete sidecars into the data files
        (the minor-compaction half of a table service): commits a new
        version whose scan needs no anti-join. Merge-on-read == copy-on-
        write parity is oracle-proved by the registered query."""
        return self.overwrite(self.read())

    def overwrite(self, df: DataFrame) -> str:
        """Commit ``df`` as the new table contents (write-new-then-swap)."""
        version = self._next_version()
        df.write.mode("overwrite").parquet(os.path.join(self.root, version))
        self._swap_pointer(version)
        self._vacuum()
        return version

    def delete_where(self, condition) -> str:
        """Delete matching rows (GDPR/right-to-erasure): commit a new
        version holding only the survivors.

        Parquet files are immutable, so deletion is a projecting rewrite —
        the same move as schema-evolution drops — committed atomically via
        the pointer swap. Prior retained versions still contain the rows
        (time travel is the audit trail); `_vacuum` bounds how long they
        survive, which is exactly the `keep_versions`-sized retention window
        a compliance pipeline tunes. At cluster scale, key-partitioned
        layout turns this into a partial rewrite of only the partitions
        whose min/max overlap the predicate.

        SQL DELETE semantics: only rows where the condition is TRUE are
        removed — a NULL-valued condition (e.g. NULL key) KEEPS the row,
        so ``~condition`` alone would be wrong (NULL negates to NULL and
        the filter would drop the row).
        """
        from pyspark.sql import functions as F

        return self.overwrite(
            self.read().filter(~F.coalesce(condition, F.lit(False)))
        )

    def _data_bytes(self, version: str) -> int:
        path = os.path.join(self.root, version)
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )

    def compact(self, target_file_bytes: int = 128 * 1024 * 1024) -> str:
        """Rewrite the current version into ~target-sized files (OPTIMIZE).

        Streaming/incremental ingestion accretes many small files; at 100 TB
        the scan-planning and open() overhead of millions of tiny files
        dominates. Sizing from the actual on-disk bytes of the current
        version, ``coalesce`` (no shuffle) bin-packs partitions down to
        ``ceil(bytes / target)`` files. Data is unchanged — only layout.
        """
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        n_files = max(1, -(-self._data_bytes(cur) // target_file_bytes))
        return self.overwrite(self.read().coalesce(n_files))

    def sorted_overwrite(
        self, df: DataFrame, sort_cols: Sequence[str], num_files: int
    ) -> str:
        """Commit ``df`` range-clustered on ``sort_cols`` (Z-order lite).

        ``repartitionByRange`` gives files with DISJOINT value ranges and
        ``sortWithinPartitions`` orders rows inside each, so every parquet
        footer carries tight non-overlapping min/max stats — a pushed-down
        range predicate then skips whole files/row-groups instead of
        scanning them (asserted from the footers in pytest). At cluster
        scale, size num_files from plan stats or a prior version's bytes.
        """
        return self.overwrite(
            df.repartitionByRange(num_files, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
        )

    def _vacuum(self) -> None:
        cur = self.current_version()
        versions = sorted(
            d for d in os.listdir(self.root) if d.startswith("v") and d != cur
        )
        for stale in versions[: max(0, len(versions) - (self.keep_versions - 1))]:
            shutil.rmtree(os.path.join(self.root, stale), ignore_errors=True)
