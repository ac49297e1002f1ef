"""Skew mitigation utilities: salting for hot keys.

AQE's skew-join handles sort-merge skew automatically (enabled in
``session.py``), but two shapes still need explicit salting at 100 TB:

- **Hot-key equi-join** where the small side fits memory but one key
  dominates the large side: replicate the small side across N salt values
  and spread the large side's hot key over N tasks (``salted_join``).
- **Skewed aggregation** where one group holds a large fraction of rows:
  aggregate by (key, salt) first (map-side combine spreads the hot group
  over N partial groups), then re-aggregate by key (``salted_agg``).
  Works for any algebraic aggregate (count/sum/min/max).

Salts are deterministic — derived by hashing the row's own columns — so
results are reproducible and oracle-checkable (no ``rand()``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n: int, from_cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic salt in [0, n) hashed from ``from_cols``
    (default: all columns). Rows identical in ``from_cols`` share a salt —
    choose columns with per-row entropy (an id, a timestamp) so a hot
    join key actually spreads."""
    cols = from_cols or df.columns
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)).cast("int")
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n: int = 8,
    how: str = "inner",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the large side's hot keys spread over ``n`` tasks.

    The small side is replicated ×n (explode over the salt range — fine
    when it is genuinely small), the large side gets a deterministic salt,
    and the join key becomes (key, salt). Result equals
    ``large.join(small, key, how)`` with the salt column dropped."""
    salted_large = with_salt(large, n, salt_from)
    replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    out = salted_large.join(replicated, [key, SALT_COL], how)
    return out.drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n: int = 8,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation: groupBy (keys + salt) computes
    partials, a second groupBy (keys) merges them. ``aggs`` maps output
    column -> 'count' | 'sum:col' | 'min:col' | 'max:col'."""
    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        if spec == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        else:
            op, col = spec.split(":", 1)
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            partial_exprs.append(fn(col).alias(out))
            merge = F.sum if op == "sum" else {"min": F.min, "max": F.max}[op]
            final_exprs.append(merge(out).alias(out))
    salted = with_salt(df, n, salt_from)
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
