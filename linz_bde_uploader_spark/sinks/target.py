"""Staging writer + target-table sink (reference S4/S5).

The reference's sink pipeline is: bulk-``COPY`` the cleaned file stream
into an index-less *working copy* in a per-job scratch schema
(lib/LINZ/BdeDatabase.pm:512-565, working copy built LIKE the target at
sql/02-bde_control_functions.sql.in:1237-1288), then *apply* the working
copy to the target — full replace for level 0 (DELETE + INSERT SELECT,
:1949-1973) or keyed merge for level 5 (:1762-1765) — inside a
transaction, with the row-tolerance gate aborting before commit
(:1770,1944).

Spark-first mapping:

- **Staging (S4)** — ``write_staging``: a parquet write of the cleaned,
  negotiated DataFrame. On a 100-TB cluster this is the natural working
  copy: columnar, splittable, schema-carrying; there is no index to defer
  because Spark joins don't use indexes (the reference's index-less COPY
  trick is free here). For a PostgreSQL target the same DataFrame goes
  through ``df.write.jdbc`` (batched) or per-partition ``COPY`` — the
  shape is documented, not implemented, because this repo's sink of record
  is the lakehouse layout.
- **Target (S5)** — ``ParquetTarget``: a directory-backed table with
  *atomic versioned commits*: every apply writes a new version directory
  and flips a one-line ``_CURRENT`` pointer file via ``os.replace`` — the
  same swap-pointer protocol Delta/Iceberg implement with a transaction
  log. Readers resolve the pointer and only ever see a fully-written
  version; a crashed writer leaves a garbage directory, never a torn
  table. The tolerance gate runs *before* the pointer flip, so an
  error-tier violation aborts with the previous version intact — the
  reference's rollback semantics (t/linz_bde_uploader.t:1309-1359).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from linz_bde_uploader_spark.operators.diff import (
    MergeStats,
    apply_changes,
    classify_incremental_changes,
    full_table_diff,
    keyswap_repair,
    merge_stats,
)
from linz_bde_uploader_spark.operators.tolerance import check_row_tolerance

CURRENT_MARKER = "_CURRENT"


def write_staging(df: DataFrame, path: str, partitions: int | None = None) -> str:
    """S4: materialize the working copy. ``partitions`` pre-sizes the
    layout for the downstream merge shuffle (bucketing analog)."""
    if partitions:
        df = df.repartition(partitions)
    df.write.mode("overwrite").parquet(path)
    return path


class ParquetTarget:
    """A versioned parquet-directory table with atomic pointer commits."""

    def __init__(self, path: str, key: str | None = None):
        self.path = path
        self.key = key
        os.makedirs(path, exist_ok=True)

    # -- version plumbing ---------------------------------------------------

    def _marker(self) -> str:
        return os.path.join(self.path, CURRENT_MARKER)

    def current_version(self) -> str | None:
        try:
            with open(self._marker()) as fh:
                return fh.read().strip() or None
        except FileNotFoundError:
            return None

    def exists(self) -> bool:
        return self.current_version() is not None

    def _data_dir(self) -> str:
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"target table at {self.path} has no data yet")
        return os.path.join(self.path, v)

    def _commit(self, version: str) -> None:
        tmp = self._marker() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, self._marker())

    def _new_version(self) -> tuple[str, str]:
        # Nanosecond timestamp: two applies can land in the same
        # millisecond, and a random suffix would then break the
        # "lexical order == commit order" contract versions() provides
        # (a reversed CDC feed swaps I and D). Nanoseconds are strictly
        # increasing within a writer process; the uuid only disambiguates
        # concurrent writers, whose relative order is undefined anyway.
        v = f"v-{time.time_ns():019d}-{uuid.uuid4().hex[:8]}"
        return v, os.path.join(self.path, v)

    def vacuum(self, keep: int = 2) -> int:
        """C7 analog (Delta VACUUM): drop all but the newest ``keep``
        version directories that are not current."""
        cur = self.current_version()
        versions = self.versions()
        doomed = [d for d in versions[:-keep] if d != cur] if keep else [
            d for d in versions if d != cur
        ]
        for d in doomed:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return len(doomed)

    # -- reads --------------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._data_dir())

    def versions(self) -> list[str]:
        """Committed-order list of version directory names (oldest first —
        names embed a zero-padded nanosecond timestamp, so lexical order
        is commit order within a writer process)."""
        return sorted(
            d
            for d in os.listdir(self.path)
            if d.startswith("v-") and os.path.isdir(os.path.join(self.path, d))
        )

    def read_version(self, spark: SparkSession, version: str) -> DataFrame:
        """Time travel: read a specific committed version (immutable
        directories make every version a consistent snapshot)."""
        return spark.read.parquet(os.path.join(self.path, version))

    def changes_between(
        self,
        spark: SparkSession,
        from_version: str,
        to_version: str | None = None,
    ) -> DataFrame:
        """CDC feed (reference S8, the logical-replication publisher
        bin/linz-bde-uploader-schema-publish.pl:57-94, re-expressed
        lakehouse-style like Delta's Change Data Feed): the net I/U/D row
        changes between two committed versions, computed with the
        full-compare kernel — ``(key, _action)``, unchanged rows excluded.

        Because versions are immutable snapshots, the feed is exact and
        replayable from any retained version; downstream consumers
        (replicas, caches, search indexes) apply it idempotently by key.
        One sort-merge shuffle per side — same 100-TB shape as J6.
        """
        if self.key is None:
            raise ValueError("changes_between requires a key column")
        old = self.read_version(spark, from_version)
        new = (
            self.read(spark)
            if to_version is None
            else self.read_version(spark, to_version)
        )
        return full_table_diff(old, new, self.key)

    # -- applies (S5): two-phase stage -> commit ----------------------------
    #
    # Each apply writes a fully-validated new version directory (phase 1)
    # and flips the pointer (phase 2). The split exists so a
    # DatasetTransaction can stage several tables and flip all their
    # pointers together at dataset end — the reference wraps a whole
    # dataset (many tables) in one DB transaction
    # (lib/LINZ/BdeDatabase.pm:476-510, conf/linz_bde_uploader.conf:85-92).

    def stage_replace(self, incoming: DataFrame) -> tuple[str, MergeStats]:
        """Phase-1 of a level-0 full replace (reference :1949-1973): write
        the snapshot as an uncommitted version; ninsert = written count."""
        v, d = self._new_version()
        incoming.write.mode("overwrite").parquet(d)
        # Count the written files, not the input lineage — one job total.
        n = incoming.sparkSession.read.parquet(d).count()
        return v, MergeStats(ninsert=n)

    def replace(self, incoming: DataFrame) -> MergeStats:
        v, stats = self.stage_replace(incoming)
        self._commit(v)
        return stats

    def _stage_gated(
        self,
        spark: SparkSession,
        current: DataFrame,
        actions: DataFrame,
        incoming: DataFrame,
        row_tol_error: float | None,
        row_tol_warning: float | None,
    ) -> tuple[str, MergeStats]:
        stats = merge_stats(actions)
        merged = apply_changes(current, incoming, actions, self.key)
        v, d = self._new_version()
        merged.write.mode("overwrite").parquet(d)
        old_n = current.count()
        new_n = spark.read.parquet(d).count()
        try:
            check_row_tolerance(old_n, new_n, row_tol_error, row_tol_warning)
        except Exception:
            shutil.rmtree(d, ignore_errors=True)  # abort: previous version stays live
            raise
        return v, stats

    def stage_incremental(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        change_keys: DataFrame,
        unique_cols: list[str] | None = None,
        row_tol_error: float | None = None,
        row_tol_warning: float | None = None,
    ) -> tuple[str, MergeStats]:
        """Phase-1 of the level-5 merge (reference :1576-1814): key-swap
        repair → classify I/U/D/0/X → apply → tolerance gate. The merged
        result is materialized before the gate counts it (single
        materialization); an error-tier violation deletes the staged
        version and raises — the previous version stays live."""
        if self.key is None:
            raise ValueError("incremental apply requires a key column")
        current = self.read(spark)
        if unique_cols:
            extra = keyswap_repair(current, incoming, change_keys, self.key, unique_cols)
            change_keys = change_keys.select(self.key).unionByName(extra).distinct()
        actions = classify_incremental_changes(
            current, incoming, change_keys, self.key, unique_cols=unique_cols
        )
        return self._stage_gated(
            spark, current, actions, incoming, row_tol_error, row_tol_warning
        )

    def apply_incremental(self, spark, incoming, change_keys,
                          unique_cols=None, row_tol_error=None,
                          row_tol_warning=None) -> MergeStats:
        v, stats = self.stage_incremental(
            spark, incoming, change_keys, unique_cols, row_tol_error, row_tol_warning
        )
        self._commit(v)
        return stats

    def stage_full_incremental(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        row_tol_error: float | None = None,
        row_tol_warning: float | None = None,
    ) -> tuple[str, MergeStats]:
        """Phase-1 of ``-full-incremental`` (J6 → J5): full-outer diff
        against the snapshot, then the same gated write (:1914-1944)."""
        if self.key is None:
            raise ValueError("full-incremental apply requires a key column")
        current = self.read(spark)
        actions = full_table_diff(current, incoming, self.key)
        return self._stage_gated(
            spark, current, actions, incoming, row_tol_error, row_tol_warning
        )

    def apply_full_incremental(self, spark, incoming, row_tol_error=None,
                               row_tol_warning=None) -> MergeStats:
        v, stats = self.stage_full_incremental(
            spark, incoming, row_tol_error, row_tol_warning
        )
        self._commit(v)
        return stats


class DatasetTransaction:
    """Per-dataset apply across many tables (§2.8 exactly-once analog).

    Stage every table's new version first (all merges + tolerance gates
    run with no pointer flipped), then commit flips all pointers in one
    quick pass. Any failure during staging aborts with *zero* tables
    changed — the reference's dataset-transaction rollback. The pointer
    flips themselves are not jointly atomic (that needs a shared
    transaction log — Delta/Iceberg on a cluster); the crash window is a
    few pointer renames, and watermark-gated replay makes a re-run
    idempotent, which is the documented recovery path."""

    def __init__(self) -> None:
        self._staged: list[tuple[ParquetTarget, str, MergeStats]] = []
        self._done = False

    def stage(self, target: ParquetTarget, version: str, stats: MergeStats) -> None:
        self._staged.append((target, version, stats))

    def commit(self) -> list[MergeStats]:
        out = []
        for target, version, stats in self._staged:
            target._commit(version)
            out.append(stats)
        self._done = True
        return out

    def abort(self) -> None:
        for target, version, _ in self._staged:
            shutil.rmtree(os.path.join(target.path, version), ignore_errors=True)
        self._staged.clear()
        self._done = True
