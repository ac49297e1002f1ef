"""Slowly-changing-dimension (Type 2) history builder.

The reference keeps every table version addressable (``bde_control.upload_table``
tracks last_upload_dataset per table; lib/LINZ/BdeDatabase.pm maintains the
per-dataset version ledger) but exposes only the *latest* state. A warehouse
consuming the same change stream usually wants the full validity history:
one row per (key, change) with ``valid_from`` / ``valid_to`` / ``is_current``.

This is a single window pass — one shuffle on the key, ``lead()`` for the
closing timestamp — which is exactly the plan you want at 100 TB: the change
stream is already roughly time-ordered, the shuffle is by key (high
cardinality, no skew hot-spot), and no self-join is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key: str,
    ts: str,
    *,
    tiebreak: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current: str = "is_current",
) -> DataFrame:
    """Turn a change stream (one row per key-state change, stamped ``ts``)
    into a Type-2 history: each row gains

    - ``valid_from`` = its own ``ts``
    - ``valid_to``   = the next change's ``ts`` for the same key (NULL while open)
    - ``is_current`` = valid_to IS NULL

    ``tiebreak`` orders simultaneous changes deterministically (pass the
    unique change id); without it, equal timestamps make valid_to
    nondeterministic under Spark's unstable sort.
    """
    order: list[Column] = [F.col(ts)]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(key).orderBy(*order)
    nxt = F.lead(F.col(ts)).over(w)
    return (
        changes.withColumn(valid_from, F.col(ts))
        .withColumn(valid_to, nxt)
        .withColumn(current, nxt.isNull())
    )


def scd2_as_of(history: DataFrame, ts_value, *, valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Point-in-time slice of an SCD2 history: rows valid at ``ts_value``.
    With the history stored partitioned/sorted by key this is a pure
    filter — no shuffle — and parquet min/max stats prune whole files."""
    t = F.lit(ts_value)
    return history.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    )
