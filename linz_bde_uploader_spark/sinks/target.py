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

import json
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
    validate_key_column,
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
        #: ToleranceResult of the most recent gated stage on this instance
        #: (old/new counts + thresholds + tier) — exposed so callers never
        #: re-count what the gate already materialized.
        self.last_gate = None
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
            self.last_gate = check_row_tolerance(
                old_n, new_n, row_tol_error, row_tol_warning
            )
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
        validate_key_column(incoming, self.key)  # schema gate, no job
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
        validate_key_column(incoming, self.key)  # schema gate, no job
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


class DatasetManifest:
    """Jointly-atomic multi-table commit point (SURVEY §7.4 hard part 2).

    One JSON file lists every (table path → version) pair of the dataset;
    committing writes a new ``manifest-<ns>.json`` and flips ONE pointer
    file via ``os.replace`` — the single atomic commit point, the same
    design as a Delta/Iceberg snapshot manifest. Readers that resolve
    table versions *through the manifest* see either the entire old
    dataset or the entire new one, never a mix. The per-table ``_CURRENT``
    pointers remain as a convenience for direct readers and are converged
    best-effort after the manifest flip; ``repair()`` replays that
    convergence idempotently from the current manifest, so a crash between
    the flips heals on the next open and is invisible to manifest
    readers (mirrors the reference's whole-dataset DB transaction,
    lib/LINZ/BdeDatabase.pm:476-510)."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _marker(self) -> str:
        return os.path.join(self.path, CURRENT_MARKER)

    def current(self) -> dict[str, str]:
        """The committed (table path → version) map; {} before any commit."""
        try:
            with open(self._marker()) as fh:
                name = fh.read().strip()
        except FileNotFoundError:
            return {}
        with open(os.path.join(self.path, name)) as fh:
            return json.load(fh)

    def commit(self, entries: dict[str, str]) -> str:
        """Atomically publish ``entries`` merged over the current map.
        The ``os.replace`` of the marker IS the commit: a crash anywhere
        before it leaves the previous manifest fully live."""
        merged = {**self.current(), **entries}
        name = f"manifest-{time.time_ns():019d}.json"
        tmp = os.path.join(self.path, name + f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            json.dump(merged, fh, indent=0, sort_keys=True)
        os.replace(tmp, os.path.join(self.path, name))
        ptmp = self._marker() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(ptmp, "w") as fh:
            fh.write(name)
        os.replace(ptmp, self._marker())
        return name

    def version_of(self, table_path: str) -> str | None:
        return self.current().get(os.path.abspath(table_path))

    def read(self, spark: SparkSession, table_path: str) -> DataFrame:
        """Read a table at the dataset-consistent version: the manifest's
        entry when one exists, else the table's own pointer."""
        v = self.version_of(table_path)
        if v is None:
            return ParquetTarget(table_path).read(spark)
        return spark.read.parquet(os.path.join(table_path, v))

    def repair(self) -> int:
        """Converge per-table pointers to the current manifest (idempotent;
        the recovery path after a crash mid-convergence). Returns how many
        pointers moved."""
        moved = 0
        for table_path, version in self.current().items():
            tgt = ParquetTarget(table_path)
            if tgt.current_version() != version:
                tgt._commit(version)
                moved += 1
        return moved


class DatasetTransaction:
    """Per-dataset apply across many tables (§2.8 exactly-once analog).

    Stage every table's new version first (all merges + tolerance gates
    run with no pointer flipped), then commit. Any failure during staging
    aborts with *zero* tables changed — the reference's dataset-transaction
    rollback (whole dataset in one DB transaction,
    lib/LINZ/BdeDatabase.pm:476-510, conf/linz_bde_uploader.conf:85-92).

    With a ``DatasetManifest`` attached, commit is *jointly atomic*: the
    single manifest pointer flip publishes every staged table at once, and
    the per-table pointers are converged afterwards (``repair()`` heals a
    crash mid-convergence). Without one, commit degrades to the round-2
    behavior — sequential pointer flips with watermark-replay recovery."""

    def __init__(self, manifest: DatasetManifest | None = None) -> None:
        self._staged: list[tuple[ParquetTarget, str, MergeStats]] = []
        self._done = False
        self.manifest = manifest

    def stage(self, target: ParquetTarget, version: str, stats: MergeStats) -> None:
        self._staged.append((target, version, stats))

    def commit(self) -> list[MergeStats]:
        if self.manifest is not None:
            self.manifest.commit(
                {os.path.abspath(t.path): v for t, v, _ in self._staged}
            )
            # the dataset is now durably committed; pointer convergence
            # below is best-effort and replayable via manifest.repair()
            self.manifest.repair()
            out = [stats for _, _, stats in self._staged]
            self._done = True
            return out
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
