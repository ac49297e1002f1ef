"""Data-layout zonemaps and the skipping-effectiveness audit — the
quantified case for clustering a 100-TB table.

Every columnar engine prunes scan work with per-file/per-row-group
min-max statistics (Parquet column statistics, ORC stripe stats,
Iceberg/Delta file-level zonemaps): a range predicate skips any unit
whose ``[min, max]`` envelope misses the range. How much actually gets
skipped is ENTIRELY a property of the physical layout — a table
range-clustered on the predicate column has tight disjoint envelopes
(most units prune), while a hash/arrival layout smears every unit's
envelope across the full domain (nothing prunes). This module makes
that decision measurable BEFORE rewriting 100 TB:

- :func:`equiwidth_zonemaps` builds the zonemap table a given layout
  WOULD produce, by assigning rows to ``n_buckets`` synthetic storage
  units (``range`` = equi-width on the clustering column, the shape a
  sorted/range-partitioned rewrite yields; ``hash`` = modulo on an
  integer key, the shape of hash bucketing or arrival order) and
  aggregating per-unit min/max/count.
- :func:`skipping_audit` replays a predicate workload against both
  zonemap tables and reports, per predicate, the prunable-unit
  fraction and the rows actually scanned under each layout.

Two-pass boundary computation (the ``RangePartitioner`` shape): pass 1
is one tiny ``min/max`` aggregate collected to the driver (2 doubles),
pass 2 assigns buckets map-side with the boundaries as literals. The
zonemap tables are ``n_buckets`` rows — the audit arithmetic runs on
them, never on the fact table; the predicate fan-out is a generator
``explode`` over a literal array (no join, no BNLJ).

Reference parity: the reference engine relies on PostgreSQL's
BRIN-style planner statistics implicitly (`sql/*` index DDL); this is
the explicit, layout-comparing form a lakehouse pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _range_bucket(v: Column, lo: float, width: float, n: int) -> Column:
    """Equi-width bucket id of ``v`` over ``[lo, lo + n*width)``; the
    top boundary value clamps into the last bucket. Plain IEEE double
    arithmetic — the oracle mirrors the exact expression so floor
    boundaries agree bit-for-bit."""
    if width <= 0:
        return F.lit(0)
    return F.least(
        F.lit(n - 1), F.floor((v - F.lit(lo)) / F.lit(width))
    ).cast("int")


def equiwidth_zonemaps(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_buckets: int = 32,
    layout: str = "range",
) -> DataFrame:
    """Zonemap table ``(bucket, zmin, zmax, n_rows)`` for the layout a
    rewrite would produce: ``range`` buckets equi-width on
    ``value_col`` (two-pass; boundaries from one driver-collected
    min/max agg), ``hash`` buckets by ``key_col % n_buckets`` (the
    arrival/hash-bucketed baseline; the key must be a nonnegative
    integer column)."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if layout == "range":
        row = df.agg(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).collect()[0]
        if row.lo is None or row.hi is None:
            raise ValueError(
                "equiwidth_zonemaps('range'): empty input or all-NULL "
                f"value column {value_col!r} — no min/max to bucket on"
            )
        lo, hi = float(row.lo), float(row.hi)
        width = (hi - lo) / n_buckets
        b = _range_bucket(F.col(value_col), lo, width, n_buckets)
    elif layout == "hash":
        b = F.pmod(F.col(key_col), F.lit(n_buckets)).cast("int")
    else:
        raise ValueError(f"unknown layout {layout!r}")
    return (
        df.select(b.alias("bucket"), F.col(value_col).alias("_v"))
        .groupBy("bucket")
        .agg(
            F.min("_v").alias("zmin"),
            F.max("_v").alias("zmax"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


def skipping_audit(
    df: DataFrame,
    value_col: str,
    key_col: str,
    predicates: list[tuple[float, float]],
    n_buckets: int = 32,
) -> DataFrame:
    """Replay closed-range predicates ``[lo, hi]`` on ``value_col``
    against the zonemaps of a range-clustered and a hash layout.
    Returns one row per predicate:

    ``(pred_id, lo, hi, pruned_range, pruned_hash, scanned_rows_range,
    scanned_rows_hash)``

    where ``pruned_*`` is the prunable-unit fraction (4 dp; a unit
    prunes when ``zmax < lo`` or ``zmin > hi``) and ``scanned_rows_*``
    the rows a min-max-pruning scan still reads. The gap between the
    two columns is the quantified value of clustering the table on
    ``value_col`` — the number a 100-TB rewrite decision needs.

    The audit runs entirely on the two ``n_buckets``-row zonemap
    tables: the predicate workload fans out via a generator explode of
    a literal array (rows = n_buckets × |predicates|, still tiny) into
    one bounded agg per layout and a pred-keyed join of the two."""
    if not predicates:
        raise ValueError("predicates must be non-empty")
    preds = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("pred_id"),
                F.lit(float(lo)).alias("lo"),
                F.lit(float(hi)).alias("hi"),
            )
            for i, (lo, hi) in enumerate(predicates)
        ]
    )

    def _replay(zm: DataFrame, tag: str) -> DataFrame:
        x = zm.select(F.explode(preds).alias("p"), "zmin", "zmax", "n_rows")
        pruned = (F.col("zmax") < F.col("p.lo")) | (
            F.col("zmin") > F.col("p.hi")
        )
        return x.groupBy(
            F.col("p.pred_id").alias("pred_id"),
            F.col("p.lo").alias("lo"),
            F.col("p.hi").alias("hi"),
        ).agg(
            F.round(
                F.sum(F.when(pruned, 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias(f"pruned_{tag}"),
            F.sum(F.when(pruned, 0).otherwise(F.col("n_rows")))
            .cast("long")
            .alias(f"scanned_rows_{tag}"),
        )

    r = _replay(
        equiwidth_zonemaps(df, value_col, key_col, n_buckets, "range"),
        "range",
    )
    h = _replay(
        equiwidth_zonemaps(df, value_col, key_col, n_buckets, "hash"),
        "hash",
    ).drop("lo", "hi")
    return r.join(h, "pred_id").select(
        "pred_id", "lo", "hi", "pruned_range", "pruned_hash",
        "scanned_rows_range", "scanned_rows_hash",
    )
