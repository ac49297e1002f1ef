"""Upload orchestration: table config (P12), level-5 continuity check,
and the end-to-end run loop (reference §3 entry points).

Ties together every component the way ``lib/LINZ/BdeUpload.pm`` does:
discovery (S3) → per dataset → per table → read ``.crs`` (S1/S2) → clean
(P4–P8) → negotiate (P1/P2) → stage (S4) → apply (A1/J1–J6, S5) →
tolerance (C9) → stats + watermarks (S6), under the job/lock services
(C1–C8). The per-table work is a Spark job; planning and metadata stay on
the driver — the same control/data split as the reference, with the data
plane distributed.
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import SparkSession

from linz_bde_uploader_spark.meta.store import MetaStore
from linz_bde_uploader_spark.operators.clean import CleanConfig, clean_text
from linz_bde_uploader_spark.operators.negotiate import negotiate_columns
from linz_bde_uploader_spark.plans import discovery
from linz_bde_uploader_spark.sinks.target import (
    DatasetManifest,
    DatasetTransaction,
    ParquetTarget,
)
from linz_bde_uploader_spark.sources.crs import read_crs

from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGE_TABLE_NAME = "l5_change_table"


@dataclass
class TableDef:
    """One ``TABLE`` record of tables.conf (reference parse:
    lib/LINZ/BdeUpload.pm:125-200; format doc conf/tables.conf:20-53)."""

    name: str
    files: list[str] = field(default_factory=list)
    key_column: str | None = None
    row_tol_error: float | None = None
    row_tol_warning: float | None = None
    l0_only: bool = False
    l5_only: bool = False
    l5_is_full: bool = False
    column_overrides: list[str] | None = None  # COLUMN records (P2)

    @property
    def is_change_table(self) -> bool:
        return self.name == CHANGE_TABLE_NAME

    def levels(self) -> set[str]:
        if self.l0_only:
            return {"0"}
        if self.l5_only:
            return {"5"}
        return {"0", "5"}


class ConfigError(ValueError):
    """tables.conf parse error (collected with line numbers like the
    reference, lib/LINZ/BdeUpload.pm:119-123)."""


def parse_tables_conf(text: str) -> list[TableDef]:
    """Parse the reference's tables.conf format:
    ``TABLE name [options] files f1 f2 ...`` + following ``COLUMN`` lines."""
    defs: list[TableDef] = []
    errors: list[str] = []
    current: TableDef | None = None
    for lineno, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        toks = line.split()
        kind = toks[0].upper()
        if kind == "TABLE":
            if len(toks) < 2:
                errors.append(f"line {lineno}: TABLE without a name")
                continue
            d = TableDef(name=toks[1].lower())
            rest = toks[2:]
            if "files" in rest:
                i = rest.index("files")
                d.files = rest[i + 1 :]
                rest = rest[:i]
            for opt in rest:
                if opt == "l0_only":
                    d.l0_only = True
                elif opt == "l5_only":
                    d.l5_only = True
                elif opt == "l5_is_full":
                    d.l5_is_full = True
                elif opt.startswith("key="):
                    d.key_column = opt[4:].lower()
                elif opt.startswith("row_tol="):
                    try:
                        e, w = opt[8:].split(",")
                        d.row_tol_error, d.row_tol_warning = float(e), float(w)
                    except ValueError:
                        errors.append(f"line {lineno}: bad row_tol {opt!r}")
                else:
                    errors.append(f"line {lineno}: unknown option {opt!r}")
            defs.append(d)
            current = d
        elif kind == "COLUMN":
            if current is None:
                errors.append(f"line {lineno}: COLUMN before any TABLE")
                continue
            if len(toks) < 2:
                errors.append(f"line {lineno}: COLUMN without a name")
                continue
            if current.column_overrides is None:
                current.column_overrides = []
            current.column_overrides.append(toks[1].lower())
        else:
            errors.append(f"line {lineno}: unrecognized record {toks[0]!r}")
    if errors:
        raise ConfigError("; ".join(errors))
    return defs


def select_tables(
    defs: list[TableDef],
    subset: list[str] | None = None,
    exclude: list[str] | None = None,
    level: str | None = None,
) -> list[TableDef]:
    """P12: subset/exclude/level filtering (lib/LINZ/BdeUpload.pm:225-253).
    The change table always rides along for level 5. Unknown subset names
    are a config error (the reference dies on them)."""
    by_name = {d.name: d for d in defs}
    if subset is not None:
        unknown = [n for n in subset if n.lower() not in by_name]
        if unknown:
            raise ConfigError(f"subset names not in config: {unknown}")
        keep = {n.lower() for n in subset}
        out = [d for d in defs if d.name in keep or d.is_change_table]
    else:
        out = list(defs)
    if exclude:
        drop = {n.lower() for n in exclude}
        out = [d for d in out if d.name not in drop or d.is_change_table]
    if level is not None:
        out = [d for d in out if level in d.levels() or d.is_change_table]
    return out


# -- level-5 continuity check (§2.8) ----------------------------------------

_TS_RE = re.compile(r"^\d{4}-\d\d-\d\d\s+\d\d:\d\d:\d\d$")


class ContinuityError(RuntimeError):
    """START/END gap beyond the fail tolerance — silent data loss guard
    (lib/LINZ/BdeUpload.pm:1088-1092)."""


def check_start_date(
    start_time: str | None,
    prev_end_time: str | None,
    warn_tol_hours: float = 0.5,
    fail_tol_hours: float = 0.0,
) -> str:
    """A level-5 file's START must match the previous file's END
    (CheckStartDate, lib/LINZ/BdeUpload.pm:1070-1100). Returns
    'ok' | 'unchecked' | 'warning'; raises ContinuityError at fail tier
    (tolerances in hours; 0 disables a tier — the reference's defaults are
    warn 0.5h, fail disabled, conf/linz_bde_uploader.conf:133-134)."""
    if start_time == prev_end_time:
        return "ok"
    if (
        start_time is None
        or prev_end_time is None
        or not _TS_RE.match(start_time)
        or not _TS_RE.match(prev_end_time)
    ):
        return "unchecked"  # reference WARNs and continues
    fmt = "%Y-%m-%d %H:%M:%S"
    diff_h = abs(
        (datetime.strptime(start_time, fmt) - datetime.strptime(prev_end_time, fmt)).total_seconds()
    ) / 3600.0
    if fail_tol_hours and diff_h > fail_tol_hours:
        raise ContinuityError(
            f"START {start_time} differs from previous END {prev_end_time} "
            f"by more than {fail_tol_hours} hours"
        )
    if warn_tol_hours and diff_h > warn_tol_hours:
        return "warning"
    return "ok"


def parse_upload_details(details: str | None) -> dict[str, str]:
    """Parse the ``BdeUpload <file> <end-time> ...`` details string into a
    file→END-time map (lib/LINZ/BdeUpload.pm:952-958)."""
    out: dict[str, str] = {}
    if not details or not details.startswith("BdeUpload"):
        return out
    for m in re.finditer(r"(\S+)\s+(\d{4}-\d\d-\d\d\s+\d\d:\d\d:\d\d)", details):
        out[m.group(1).lower()] = m.group(2)
    return out


# -- the run loop ------------------------------------------------------------


@dataclass
class LoadReport:
    table: str
    dataset: str
    level: str
    ninsert: int
    nupdate: int
    nnullupdate: int
    ndelete: int
    continuity: str = "ok"


class BdeUploader:
    """The `-full` / `-incremental` entry points (reference
    bin/linz_bde_uploader.pl:78-248 + lib/LINZ/BdeUpload.pm:559-840)."""

    def __init__(
        self,
        spark: SparkSession,
        repo: str,
        target_root: str,
        meta: MetaStore,
        tables: list[TableDef],
        clean_cfg: CleanConfig | None = None,
        warn_tol_hours: float = 0.5,
        fail_tol_hours: float = 0.0,
        max_errors: int = 0,
        registry=None,
        events=None,
        finish_sql: str = "",
        sql_runner=None,
    ):
        self.spark = spark
        self.repo = repo
        self.target_root = target_root
        self.meta = meta
        self.tables = tables
        self.clean_cfg = clean_cfg or CleanConfig()
        self.warn_tol_hours = warn_tol_hours
        self.fail_tol_hours = fail_tol_hours
        self.max_errors = max_errors
        self.registry = registry  # hooks.HookRegistry | None
        self.events = events  # hooks.EventHooks | None
        self.finish_sql = finish_sql
        self.sql_runner = sql_runner or (lambda sql: spark.sql(sql))
        # Dataset-level commit point: every completed dataset publishes all
        # its table versions through ONE atomic manifest flip; repair() at
        # startup converges per-table pointers after a mid-flip crash.
        self.manifest = DatasetManifest(os.path.join(target_root, "_manifest"))
        self.manifest.repair()

    def _fire(self, event: str, upl_id: int | None, dataset: str = "", level: str = ""):
        if self.events is not None:
            self.events.fire(event, upl_id, dataset, level)

    def _post_hooks(self, upl_id: int, level: str) -> None:
        """Post-level0 / post-upload function registry + conditional finish
        SQL (reference lib/LINZ/BdeUpload.pm:811-821,842-872)."""
        from linz_bde_uploader_spark.plans import hooks as H

        if self.registry is not None:
            ctx = H.HookContext(upl_id, self.meta, self.spark, level=level)
            if level == "0":
                self.registry.run_post_level0(ctx)
            self.registry.run_post_upload(ctx)
        if self.finish_sql:
            H.run_finish_sql(self.finish_sql, self.sql_runner, self.meta, upl_id)

    def _target(self, d: TableDef) -> ParquetTarget:
        return ParquetTarget(f"{self.target_root}/{d.name}", key=d.key_column)

    def _load_files(self, ds: discovery.DatasetRef, d: TableDef, prev_details: dict[str, str]):
        """Read+clean+negotiate one table's files in a dataset. Returns
        (DataFrame, details-string, continuity-status)."""
        frames = []
        details = "BdeUpload"
        continuity = "ok"
        header0 = None
        for fname in d.files:
            p = ds.file_path(fname)
            if p is None:
                raise FileNotFoundError(f"{ds.name}: missing file {fname} for {d.name}")
            df, hdr = read_crs(
                self.spark, p, cast=False, max_errors=self.max_errors, validate=True
            )
            if ds.level == "5":
                status = check_start_date(
                    hdr.start, prev_details.get(fname.lower()),
                    self.warn_tol_hours, self.fail_tol_hours,
                ) if prev_details else "ok"
                if status == "warning":
                    continuity = "warning"
            details += f" {fname} {hdr.end or ''}"
            if d.column_overrides:
                df = df.toDF(*d.column_overrides)
            frames.append(df)
            header0 = header0 or hdr
        out = frames[0]
        for f2 in frames[1:]:
            out = out.unionByName(f2)
        # String columns go through the character cleaning pass (P4/P5)
        # before negotiation casts them to the target types.
        for c, dt in out.dtypes:
            if dt == "string":
                out = out.withColumn(c, clean_text(F.col(c), self.clean_cfg))
        return out, details, continuity, header0

    def _target_schema(self, d: TableDef, header) -> T.StructType:
        t = self._target(d)
        if t.exists():
            return t.read(self.spark).schema
        return header.schema  # first load: file header defines the table

    def run_level0(
        self,
        before: str | None = None,
        rebuild: bool = False,
        full_incremental: bool = False,
    ) -> list[LoadReport]:
        """Level-0 snapshot apply. With ``full_incremental`` (the
        ``-full-incremental`` flag) an existing keyed target is updated by
        full-outer diff + keyed merge instead of replaced — same final
        state, but I/U/D counters and tolerance gates apply (reference
        ver_apply_table_differences, :1914-1944)."""
        datasets = discovery.list_datasets(self.repo, "0", before)
        reports: list[LoadReport] = []
        upl_id = self.meta.create_upload()
        self._fire("start", upl_id, level="0")
        ok = True
        try:
            for d in select_tables(self.tables, level="0"):
                if d.is_change_table:
                    continue
                st = self.meta.table_status(d.name)
                tbl_id = st.tbl_id if st else self.meta.register_table(
                    d.name, key_column=d.key_column,
                    row_tol_error=d.row_tol_error, row_tol_warning=d.row_tol_warning,
                )
                last_l0 = st.last_level0_dataset if st else None
                pend = discovery.pending_level0(datasets, last_l0, rebuild, d.files)
                for ds in pend:
                    self.meta.acquire_table_lock(tbl_id, upl_id)
                    t0 = time.monotonic()
                    df, details, cont, hdr = self._load_files(ds, d, {})
                    target = self._target(d)
                    negotiated = negotiate_columns(df, self._target_schema(d, hdr))
                    diffed = (
                        full_incremental and target.exists() and d.key_column is not None
                    )
                    if diffed:
                        stats = target.apply_full_incremental(
                            self.spark, negotiated,
                            row_tol_error=d.row_tol_error,
                            row_tol_warning=d.row_tol_warning,
                        )
                    else:
                        stats = target.replace(negotiated)
                    # keep the dataset manifest in sync so manifest-resolved
                    # readers never see a level-0 table at a stale version
                    self.manifest.commit(
                        {os.path.abspath(target.path): target.current_version()}
                    )
                    self.meta.record_load(
                        tbl_id, upl_id, ds.name, "0", incremental=diffed,
                        ninsert=stats.ninsert, nupdate=stats.nupdate,
                        nnullupdate=stats.nnullupdate, ndelete=stats.ndelete,
                        duration_secs=time.monotonic() - t0, details=details,
                    )
                    reports.append(LoadReport(
                        d.name, ds.name, "0", stats.ninsert, stats.nupdate,
                        stats.nnullupdate, stats.ndelete, cont,
                    ))
            if reports:
                self._post_hooks(upl_id, "0")
        except Exception:
            ok = False
            self._fire("error", upl_id, level="0")
            raise
        finally:
            self.meta.finish_upload(upl_id, ok=ok)
            self._fire("finish", upl_id, level="0")
        return reports

    def run_level5(self, before: str | None = None) -> list[LoadReport]:
        datasets = discovery.list_datasets(self.repo, "5", before)
        chg_def = next((d for d in self.tables if d.is_change_table), None)
        if chg_def is None:
            raise ConfigError("level-5 run requires an l5_change_table record")
        reports: list[LoadReport] = []
        upl_id = self.meta.create_upload()
        self._fire("start", upl_id, level="5")
        ok = True
        try:
            level5_tables = [
                d for d in select_tables(self.tables, level="5")
                if not d.is_change_table
            ]
            for ds in datasets:
                # The change table for this dataset (reference
                # CreateLevel5ChangeTable, lib/LINZ/BdeUpload.pm:874-906).
                chg_path = ds.file_path(chg_def.files[0]) if chg_def.files else None
                if chg_path is None:
                    raise FileNotFoundError(
                        f"{ds.name}: missing change table file "
                        f"{chg_def.files} (t/linz_bde_uploader.t:1077-1099)"
                    )
                chg_df, _ = read_crs(self.spark, chg_path, cast=True)
                # Whole-dataset transaction: every table stages its new
                # version first; dataset end publishes every staged
                # version through ONE atomic manifest flip, so a
                # mid-dataset failure (including a tolerance abort)
                # leaves ALL tables at their previous state — the
                # reference's per-dataset txn (BdeDatabase.pm:476-510).
                txn = DatasetTransaction(manifest=self.manifest)
                staged_meta: list[tuple] = []
                try:
                    for d in level5_tables:
                        st = self.meta.table_status(d.name)
                        tbl_id = st.tbl_id if st else self.meta.register_table(
                            d.name, key_column=d.key_column,
                            row_tol_error=d.row_tol_error,
                            row_tol_warning=d.row_tol_warning,
                        )
                        last = st.last_upload_dataset if st else None
                        if not discovery.pending_level5([ds], last, d.l5_is_full, d.files):
                            continue
                        if d.key_column is None and not d.l5_is_full:
                            raise ConfigError(f"{d.name}: level-5 requires key=")
                        prev = parse_upload_details(
                            st.last_upload_details
                            if st and st.last_upload_type == "5"
                            else None
                        )
                        self.meta.acquire_table_lock(tbl_id, upl_id)
                        t0 = time.monotonic()
                        df, details, cont, hdr = self._load_files(ds, d, prev)
                        target = self._target(d)
                        negotiated = negotiate_columns(df, self._target_schema(d, hdr))
                        if d.l5_is_full:
                            # "the level 5 files are actually a full level 0
                            # update" (conf/tables.conf:40) — full replace,
                            # no change table involved
                            version, stats = target.stage_replace(negotiated)
                        else:
                            # P9/P10: lowercase tablename, project this
                            # table's keys
                            keys = (
                                chg_df.filter(F.lower(F.col("tablename")) == d.name)
                                .select(
                                    F.col("tablekeyvalue").cast("long").alias(d.key_column)
                                )
                                .distinct()
                            )
                            version, stats = target.stage_incremental(
                                self.spark, negotiated, keys,
                                row_tol_error=d.row_tol_error,
                                row_tol_warning=d.row_tol_warning,
                            )
                        txn.stage(target, version, stats)
                        staged_meta.append(
                            (d, tbl_id, stats, details, cont, time.monotonic() - t0)
                        )
                except Exception:
                    txn.abort()
                    raise
                txn.commit()
                for d, tbl_id, stats, details, cont, dur in staged_meta:
                    self.meta.record_load(
                        tbl_id, upl_id, ds.name, "5", incremental=True,
                        ninsert=stats.ninsert, nupdate=stats.nupdate,
                        nnullupdate=stats.nnullupdate, ndelete=stats.ndelete,
                        duration_secs=dur, details=details,
                    )
                    reports.append(LoadReport(
                        d.name, ds.name, "5", stats.ninsert, stats.nupdate,
                        stats.nnullupdate, stats.ndelete, cont,
                    ))
            if reports:
                self._post_hooks(upl_id, "5")
        except Exception:
            ok = False
            self._fire("error", upl_id, level="5")
            raise
        finally:
            self.meta.finish_upload(upl_id, ok=ok)
            self._fire("finish", upl_id, level="5")
        return reports
