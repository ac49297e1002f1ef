"""Range (interval) join: points against intervals, bin-bucketed.

Spark's builtin answer to ``l.t BETWEEN r.s AND r.e`` is a broadcast
nested-loop join — O(|L|·|R|) compares, a non-starter at 100 TB. The
standard scale rewrite buckets time into fixed-width bins:

1. every interval explodes to the bins it covers (``sequence`` — for
   intervals no longer than ``bin_width`` that is at most 2 rows);
2. every point maps to exactly ONE bin;
3. equi-join on (key, bin) — a plain hash shuffle Catalyst/AQE handle
   like any other join — then the exact containment predicate filters
   within the bucket.

Because a point lives in exactly one bin and an interval emits each
covered bin once, every qualifying (point, interval) pair joins exactly
once — no distinct pass needed. Shuffle volume is O(|L| + Σ bins) rows,
and bin width tunes the bucket fan-out / selectivity trade-off (set it
near the typical interval length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner join of every point row to every interval row with the same
    ``key`` and ``start <= point <= end``. Column names (other than
    ``key``) must not collide between the two inputs."""
    ibins = F.sequence(
        F.floor(F.col(start_col) / bin_width).cast("long"),
        F.floor(F.col(end_col) / bin_width).cast("long"),
    )
    r = intervals.withColumn("_bin", F.explode(ibins))
    l = points.withColumn(
        "_bin", F.floor(F.col(point_col) / bin_width).cast("long")
    )
    return (
        l.join(r, [key, "_bin"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bin")
    )
