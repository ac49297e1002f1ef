"""Schema negotiation: header ∩ target projection (reference P1/P2).

The reference intersects the file-declared field names with the target
table's actual columns, case-insensitively, preserving file field order, and
loads only the intersection (``bde_SelectValidColumns``,
/root/reference/sql/02-bde_control_functions.sql.in:1336-1375). Zero matching
columns is a hard error (lib/LINZ/BdeUpload.pm:1031-1033). Config may
override the header-declared columns per table (``COLUMN`` records,
conf/tables.conf:50-53). Missing target columns take the target's column
defaults (working copy created INCLUDING DEFAULTS, :1276-1279).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class NoMatchingColumnsError(ValueError):
    """No file field matches any target column (reference hard error,
    tested at t/linz_bde_uploader.t:1456-1492)."""


def negotiate_columns(
    df: DataFrame,
    target_schema: T.StructType,
    column_overrides: list[str] | None = None,
    defaults: dict[str, Column] | None = None,
) -> DataFrame:
    """Project ``df`` (file-shaped) onto ``target_schema``.

    - ``column_overrides``: replaces the file's field names entirely
      (positional), mirroring config ``COLUMN`` records.
    - keeps only file fields that exist in the target (case-insensitive);
    - casts each kept field to the target column's type (the reference lets
      PostgreSQL COPY do this parse);
    - fills absent target columns with ``defaults`` (or NULL).

    Output column order is the *target* order, ready for a positional sink.
    """
    file_cols = list(df.columns)
    if column_overrides is not None:
        if len(column_overrides) != len(file_cols):
            raise ValueError(
                f"column override count {len(column_overrides)} != file field count {len(file_cols)}"
            )
        df = df.toDF(*[c.lower() for c in column_overrides])
        file_cols = list(df.columns)

    target_by_lower = {f.name.lower(): f for f in target_schema.fields}
    matched = {c.lower() for c in file_cols if c.lower() in target_by_lower}
    if not matched:
        raise NoMatchingColumnsError(
            f"no field matches column names of target table: file fields {file_cols}, "
            f"target columns {[f.name for f in target_schema.fields]}"
        )

    defaults = defaults or {}
    out: list[Column] = []
    for f in target_schema.fields:
        lname = f.name.lower()
        if lname in matched:
            src = next(c for c in file_cols if c.lower() == lname)
            out.append(F.col(src).cast(f.dataType).alias(f.name))
        elif lname in defaults:
            out.append(defaults[lname].cast(f.dataType).alias(f.name))
        else:
            out.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(out)
