"""Count-min sketch — the bounded-memory frequency estimator a 100-TB
token/URL/entity pipeline uses where an exact groupBy's key space is
unbounded: the sketch's state is depth x width cells regardless of
cardinality, every update is a partial-agg increment (one shuffle whose
key space IS the sketch), and point estimates read ``depth`` cells.

All hashing is the engine's deterministic integer-mixing family
(``text.token_value`` composed with fixed affine permutations — the
MinHash parameter style), so the sketch table is exactly reproducible
in ANSI SQL and across engines: the correctness harness hash-matches
the full estimator output against DuckDB.

Estimates are upper bounds: est >= true count always (only hash
collisions inflate, never deflate) — the property the verified
heavy-hitters query pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.text import token_value, tokens

#: affine permutation parameters for the depth hash rows (prime
#: multipliers, fixed — deterministic, engine-independent).
CMS_PARAMS = [
    (1000003, 17),
    (1000033, 257),
    (1000037, 5),
    (1000039, 65537),
]

HASH_MOD = 2147483647


def _bucket(val, a: int, b: int, width: int):
    return ((val * a + b) % HASH_MOD) % width


def countmin_table(
    df: DataFrame,
    text_col: str = "text",
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` — depth·width cells at
    most, regardless of token cardinality. One explode + one partial-agg
    shuffle whose key space is the sketch itself (map-side combine does
    almost all the work; reducers see ≤ depth·width keys)."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("tok")).select(
        token_value(F.col("tok")).alias("_tv")
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _bucket(F.col("_tv"), a, b, width).alias("bucket"),
            )
            for i, (a, b) in enumerate(CMS_PARAMS[:depth])
        ]
    )
    return (
        toks.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str = "tok",
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point estimates for every row of ``keys``: min over the depth
    cells each key hashes to. The sketch is broadcast (≤ depth·width
    rows by construction), so estimation is map-only over the keys."""
    kv = keys.withColumn("_tv", token_value(F.col(key_col)))
    out = kv
    for i, (a, b) in enumerate(CMS_PARAMS[:depth]):
        cell = cms.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"_b{i}"), F.col("cnt").alias(f"_c{i}")
        )
        out = out.join(
            F.broadcast(cell),
            _bucket(F.col("_tv"), a, b, width) == F.col(f"_b{i}"),
            "left",
        ).drop(f"_b{i}")
    est = F.least(*[F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(depth)])
    return out.withColumn("cms_est", est).drop(
        "_tv", *[f"_c{i}" for i in range(depth)]
    )


def heavy_hitters_verified(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Top-k tokens by EXACT count, annotated with their count-min
    estimate — the sketch-accuracy audit a pipeline runs before trusting
    the sketch on keys too numerous to count exactly. Output
    ``(tok, exact_cnt, cms_est)``; the est >= exact invariant holds by
    construction."""
    exact = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.col("tok"))
        .limit(k)
    )
    cms = countmin_table(df, text_col, width, depth)
    return countmin_estimate(cms, exact, "tok", width, depth).select(
        "tok", "exact_cnt", "cms_est"
    )
