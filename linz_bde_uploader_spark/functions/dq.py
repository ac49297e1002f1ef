"""Data-quality audit primitives — the pre-load checks an ETL engine
runs before trusting a snapshot.

The reference engine's quality machinery is row-count tolerance and the
key-validity gate (`sql/02-bde_control_functions.sql.in:2006-2083`,
mirrored in `operators/tolerance.py` and the sink key gates); this
module is the general form a warehouse pipeline needs on top:
declarative per-table checks — null rates, value-range violations,
cross-table referential integrity, internal consistency — rolled into
ONE auditable datasheet of ``(check, n_rows, n_bad, bad_rate)`` rows.

Design: every check is a (name, DataFrame, boolean "bad" Column)
triple; the audit compiles each into one conditional aggregate and
unions the one-row results. Referential integrity is expressed as a
LEFT JOIN against the parent's DISTINCT key set with "parent missing"
as the bad predicate — the same plan Spark would run for an anti-join
count, but it composes with the uniform check interface (AQE
broadcasts the key set when small).

Scale: each check is one scan + one partial-agg (checks over the same
table share nothing by design — at 100 TB you run the audit per
ingested partition, not per full table, and the union is |checks|
one-row frames). Nothing collects; the datasheet is the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_row(
    name: str, df: DataFrame, bad: Column, null_is_bad: bool = True
) -> DataFrame:
    """One audit row: ``(check, n_rows, n_bad, bad_rate)`` with
    ``bad_rate`` at 6 dp (0.0 on an empty table — an empty input is a
    row-count problem, not a rate problem).

    NULL semantics are explicit: a three-valued-NULL predicate (e.g.
    ``length(text) != n_chars`` where either side is NULL) counts as
    **bad** by default (``null_is_bad=True``) — a row the check cannot
    vouch for is a finding, not a pass. Pass ``null_is_bad=False``
    only when NULLs are a different check's finding (the
    :func:`fk_check` convention, whose predicate is never NULL by
    construction).
    """
    bad = F.coalesce(bad, F.lit(bool(null_is_bad)))
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_bad"),
    ).select(
        F.lit(name).alias("check"),
        "n_rows",
        F.coalesce(F.col("n_bad"), F.lit(0)).alias("n_bad"),
        F.when(
            F.col("n_rows") > 0,
            F.round(
                F.coalesce(F.col("n_bad"), F.lit(0)).cast("double")
                / F.col("n_rows"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("bad_rate"),
    )


def null_check(name: str, df: DataFrame, col: str) -> DataFrame:
    """Null-rate audit row for one column."""
    return check_row(name, df, F.col(col).isNull())


def range_check(
    name: str, df: DataFrame, col: str, lo: float, hi: float
) -> DataFrame:
    """Closed-range audit row: bad = NULL or outside ``[lo, hi]``."""
    c = F.col(col)
    return check_row(
        name, df, c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    )


def fk_check(
    name: str,
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """Referential-integrity audit row: bad = child key (non-NULL) with
    no parent row. NULL child keys are NOT orphans here — they are the
    null_check's finding; counting them twice double-reports one
    defect."""
    pk = (
        parent.select(F.col(parent_col).alias("_pk"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = child.select(F.col(child_col).alias("_ck")).join(
        pk, F.col("_ck") == F.col("_pk"), "left"
    )
    return check_row(
        name,
        joined,
        F.col("_ck").isNotNull() & F.col("_hit").isNull(),
    )


def dq_audit(checks: "list[DataFrame]") -> DataFrame:
    """Union the one-row check frames into the audit datasheet —
    ``(check, n_rows, n_bad, bad_rate)``, one row per check."""
    if not checks:
        raise ValueError("at least one check is required")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
