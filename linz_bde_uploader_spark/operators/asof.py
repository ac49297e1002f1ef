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
    rt = right.select(
        F.col(key),
        F.col(time_col),
        *[F.col(c).alias(n) for c, n in zip(value_cols, out_names)],
    ).withColumn("_side", F.lit(0))
    lt = left.withColumn("_side", F.lit(1))
    u = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: list[Column] = [
        F.last(n, ignorenulls=True).over(w).alias(f"_carry_{n}")
        for n in out_names
    ]
    if tolerance is not None:
        carried.append(
            F.last(F.when(F.col("_side") == 0, F.col(time_col)), ignorenulls=True)
            .over(w)
            .alias("_carry_t")
        )
    filled = u.select("*", *carried).filter(F.col("_side") == 1)

    cols = [F.col(c) for c in left.columns]
    for n in out_names:
        v = F.col(f"_carry_{n}")
        if tolerance is not None:
            v = F.when(
                F.col(time_col) - F.col("_carry_t") <= tolerance, v
            )
        cols.append(v.alias(n))
    return filled.select(*cols)
