"""Schema bootstrap + patch mechanism (reference S7).

The reference's ``linz-bde-uploader-schema-load`` pipes the control-table
DDL, functions, a version function, and idempotent dbpatch migrations
through psql in one transaction (bin/linz-bde-uploader-schema-load.pl:
139-185; patches sql/99-patches.sql:18-78). The Spark-native equivalents:

- ``schema_load`` — materialize the three empty control tables (the DDL
  analog) plus the patch ledger; idempotent, never clobbers data.
- ``bde_version`` — the version function (03-bde_version.sql analog).
- ``apply_patches`` — run registered named migrations exactly once each,
  recording them in a ``_patches`` ledger (dbpatch semantics: a patch that
  has run is never re-run; order is registration order).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from linz_bde_uploader_spark.meta.store import MetaStore

VERSION = "1.0.0-spark"


def bde_version() -> str:
    return VERSION


def schema_load(meta_root: str) -> MetaStore:
    """Create the control store with all tables present-but-empty (safe on
    an existing store — only missing tables are created)."""
    store = MetaStore(meta_root)
    for t in ("upload", "upload_table", "upload_stats"):
        if not os.path.exists(store._path(t)):
            store._write(t, [])
    ledger = _ledger_path(store)
    if not os.path.exists(ledger):
        _write_ledger(store, [])
    return store


def _ledger_path(store: MetaStore) -> str:
    return os.path.join(store.root, "_patches.json")


def _read_ledger(store: MetaStore) -> list[dict]:
    try:
        with open(_ledger_path(store)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return []


def _write_ledger(store: MetaStore, rows: list[dict]) -> None:
    tmp = _ledger_path(store) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rows, fh, indent=1)
    os.replace(tmp, _ledger_path(store))


def apply_patches(
    store: MetaStore, patches: list[tuple[str, Callable[[MetaStore], None]]]
) -> list[str]:
    """Run each (name, fn) not yet in the ledger, in order; record it.
    Re-running with the same list is a no-op (dbpatch idempotency,
    sql/99-patches.sql:18-78 / t/test-upgrades.sh)."""
    ledger = _read_ledger(store)
    done = {r["name"] for r in ledger}
    ran = []
    for name, fn in patches:
        if name in done:
            continue
        fn(store)
        ledger.append({"name": name, "applied_time": time.time()})
        _write_ledger(store, ledger)
        ran.append(name)
    return ran
