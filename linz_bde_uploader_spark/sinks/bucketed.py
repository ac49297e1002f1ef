"""Bucketed table layout: the co-located join strategy for the merge kernel.

The level-5 path joins *current* against *staging* on the single integer
key every day (SURVEY §2.3) — at 100 TB that is the dominant shuffle. A
bucketed layout pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same number of key buckets (and sorted within
each), so every subsequent key join reads bucket i against bucket i with
no exchange and no re-sort — `.explain` shows a SortMergeJoin with no
Exchange on either side.

This is the Spark-native equivalent of the reference keeping current and
working tables in the same PostgreSQL database with key indexes
(lib/LINZ/BdeDatabase.pm:512-565): the engine-level trick that makes the
daily merge IO-bound instead of shuffle-bound.

Write side amortization: a daily increment is small relative to the
current table, so the expensive bucketing of *current* happens only when
it is replaced (level 0); the staging write buckets just the increment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed, key-sorted table registered in the
    session catalog (bucket metadata lives in the catalog — reading the
    bare parquet path would lose the no-shuffle property)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read that preserves the bucket distribution for joins."""
    return spark.table(table_name)
