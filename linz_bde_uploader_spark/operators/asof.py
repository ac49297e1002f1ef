"""As-of join: for each left row, the latest right row at-or-before it.

The reference has only single-key equi-joins (SURVEY §2.3); an as-of
join is the classic temporal operator Spark lacks as a builtin, needed
the moment events must be enriched with "the most recent state change"
(price-as-of-trade, config-as-of-event, last-purchase-before-click).

Spark-first composition — the tagged-union / running-last trick:

1. tag right rows side=0 and left rows side=1, union them by name;
2. one window over ``partitionBy(key).orderBy(time, side)`` carries the
   right values forward with ``last(ignorenulls=True)``;
3. keep the left rows.

That is ONE hash shuffle on the key plus a per-partition sort — the same
cost as a plain sort-merge join — and never a per-row range probe, a
cross join, or a driver loop. Skewed keys hit the usual window caveat
(a hot key serializes one partition; pre-split with ``operators.skew``).

``side`` orders right rows before left rows at equal timestamps, so a
right row exactly at the left row's time matches (the ``<=`` contract,
matching DuckDB's ``ASOF JOIN ON l.t >= r.t`` exactly — which is the
correctness oracle for this operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join.

    Returns ``left`` plus, for each name in ``value_cols``, a
    ``<name><suffix>`` column holding the value from the latest right
    row with ``right.time <= left.time`` for the same key (NULL when no
    such row exists). With ``tolerance``, matches older than
    ``left.time - tolerance`` (same unit as ``time_col``) are nulled.
    """
    out_names = [f"{c}{suffix}" for c in value_cols]
    reserved = {"_side", "_rrow"}
    clashes = (set(left.columns) & set(out_names)) | (
        set(left.columns) & reserved
    )
    if clashes:
        raise ValueError(
            f"asof_join output/internal names collide with left columns: "
            f"{sorted(clashes)} — rename or pick a different suffix"
        )

    # Carry the latest right ROW as one struct, not last-non-null per
    # column: a matched right row whose value is NULL must yield NULL
    # (not an older value), multi-column outputs must all come from the
    # same row, and the tolerance age must be that same row's time.
    # NULL-time right rows can never satisfy `right.t <= left.t` in SQL
    # semantics, so they're dropped up front (they'd otherwise sort
    # first and leak into every row of their key).
    rstruct = F.struct(
        F.col(time_col).alias("_t"),
        *[F.col(c).alias(n) for c, n in zip(value_cols, out_names)],
    )
    rt = (
        right.filter(F.col(time_col).isNotNull())
        .select(F.col(key), F.col(time_col), rstruct.alias("_rrow"))
        .withColumn("_side", F.lit(0))
    )
    lt = left.withColumn("_side", F.lit(1))
    u = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        u.select("*", F.last("_rrow", ignorenulls=True).over(w).alias("_m"))
        .filter(F.col("_side") == 1)
    )

    match: Column = F.col("_m")
    if tolerance is not None:
        match = F.when(
            F.col(time_col) - F.col("_m._t") <= tolerance, match
        )
    cols = [F.col(c) for c in left.columns]
    cols.extend(match.getField(n).alias(n) for n in out_names)
    return filled.select(*cols)
