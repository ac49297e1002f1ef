"""Similarity search over embedding columns (array<float>).

Two tiers, per the standard ANN architecture:

- **Brute-force cosine top-k** — the exactness baseline. Dot products are
  JVM array arithmetic (``zip_with`` + ``aggregate`` fold — codegen'd,
  Arrow-free); a 64-dim × 100M-row scan is embarrassingly parallel and
  shuffle-free until the final top-k, which Spark computes with per-
  partition heaps (``orderBy().limit(k)`` → TakeOrderedAndProject).
- **LSH-bucketed (random hyperplane) search** — the scale path. Each vector
  gets a B-bit signature from sign(v · h_b) over B deterministic
  hyperplanes; candidates share a signature bucket, so the search touches
  one bucket instead of the full table. Hyperplane components are derived
  arithmetically from (plane, dim) — no stored model, reproducible
  everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.text import HASH_MIX, HASH_MOD


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (left fold, deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector.

    The query vector is a literal array (constant-folded into codegen; no
    broadcast needed). Returns (id, score) with score rounded to 6 dp for
    stable cross-engine comparison.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def cosine_above(
    embeddings: DataFrame,
    query_vec: list[float],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All vectors with cosine ≥ threshold to the query — set-valued, so
    order-insensitive comparison against an oracle is exact."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return embeddings.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    ).filter(F.col("score") >= threshold)


def _hyperplane(plane: int, dims: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d ∈ [-0.5, 0.5)
    from integer mixing of (plane, d). Pure arithmetic → same plane on any
    engine, no stored state."""
    comps = [
        F.lit((((plane * 131 + d) * HASH_MIX) % HASH_MOD) / HASH_MOD - 0.5)
        for d in range(dims)
    ]
    return F.array(*comps)


def lsh_signature(vec: Column, dims: int, planes: int = 8) -> Column:
    """B-bit random-hyperplane signature of a vector (long)."""
    sig = F.lit(0).cast("long")
    for p in range(planes):
        h = _hyperplane(p, dims)
        bit = (dot(vec, h) > 0).cast("long")
        sig = sig + bit * (1 << p)
    return sig


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
) -> DataFrame:
    """ANN top-k: restrict the exact scan to the query's LSH bucket.

    At scale the table is written bucketed/partitioned by signature, so the
    bucket predicate becomes partition pruning and the scan touches
    ~n/2^planes of the data. Falls back to fewer planes if the bucket is
    empty (caller's choice — here we just return what the bucket holds).
    """
    dims = len(query_vec)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # query signature, computed driver-side with the same arithmetic
    import math

    qsig = 0
    for p in range(planes):
        d = sum(
            ((((p * 131 + i) * HASH_MIX) % HASH_MOD) / HASH_MOD - 0.5) * query_vec[i]
            for i in range(dims)
        )
        qsig += (1 << p) if d > 0 else 0
    bucketed = embeddings.withColumn(
        "_sig", lsh_signature(F.col(vec_col), dims, planes)
    ).filter(F.col("_sig") == qsig)
    return (
        bucketed.select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score")
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
