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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from linz_bde_uploader_spark.functions.litexpr import (
    lit_double_array,
    lit_double_matrix,
)

from linz_bde_uploader_spark.caching import track
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
    q = lit_double_array(query_vec)
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
    q = lit_double_array(query_vec)
    return embeddings.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    ).filter(F.col("score") >= threshold)


def batch_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    salt_buckets: int = 32,
) -> DataFrame:
    """k-NN join: exact top-k candidates (by cosine) for EVERY row of a
    small query set — the batch form of :func:`cosine_topk`.

    Plan, designed for |queries| ≪ |embeddings| at 100 TB:

    1. ``broadcast(queries)`` cross join — map-only pair scoring, no
       shuffle of the big side; N×Q narrow (q_id, id, score) rows.
    2. Salted local top-k: window over (q_id, pmod(id, salt_buckets)).
       A plain window over q_id alone would hash N×Q rows into only Q
       partitions — a guaranteed skew hot-spot when Q is small. The salt
       spreads each query's candidates over ``salt_buckets`` reducers,
       and a per-(query, salt) top-k is a superset of the global top-k.
    3. Global top-k over the reduced (Q × salt_buckets × k) rows — tiny.

    Deterministic tiebreak (score DESC, id ASC) end-to-end, so results
    are exact and oracle-comparable.
    """
    from pyspark.sql import Window  # noqa: PLC0415
    from pyspark.sql.functions import broadcast  # noqa: PLC0415

    q = queries.select(F.col(q_id_col), F.col(q_vec_col))
    pairs = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .join(broadcast(q), F.col(id_col) != F.col(q_id_col))
        .select(
            F.col(q_id_col),
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col(q_vec_col)), 6).alias("score"),
        )
    )
    order = [F.desc("score"), F.col(id_col)]
    local = Window.partitionBy(
        F.col(q_id_col), F.pmod(F.col(id_col), F.lit(salt_buckets))
    ).orderBy(*order)
    reduced = (
        pairs.withColumn("_rn", F.row_number().over(local))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    final = Window.partitionBy(q_id_col).orderBy(*order)
    return (
        reduced.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "score")
    )


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


def query_signature(query_vec: list[float], planes: int = 8) -> int:
    """The query vector's signature, computed driver-side with the exact
    arithmetic of ``lsh_signature`` (Python floats == Spark literals)."""
    dims = len(query_vec)
    qsig = 0
    for p in range(planes):
        d = sum(
            ((((p * 131 + i) * HASH_MIX) % HASH_MOD) / HASH_MOD - 0.5)
            * float(query_vec[i])
            for i in range(dims)
        )
        qsig += (1 << p) if d > 0 else 0
    return qsig


def lsh_topk_full_scan(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
) -> DataFrame:
    """ANN top-k computing signatures ON THE FLY: every query hashes the
    whole table. NOT a scale path — one query over 100 TB re-reads and
    re-hashes 100 TB. Correct for ad-hoc exploration of an un-bucketed
    table; anything repeated belongs on the physical layout
    (``write_bucketed_embeddings`` once, then :func:`lsh_topk` probes
    with partition pruning)."""
    dims = len(query_vec)
    q = lit_double_array(query_vec)
    qsig = query_signature(query_vec, planes)
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


def _probe_set(qsig: int, planes: int, probe_radius: int) -> list[int]:
    """Multi-probe bucket set: the query's signature plus every signature
    within Hamming distance ``probe_radius``."""
    probes = {qsig}
    if probe_radius >= 1:
        probes.update(qsig ^ (1 << p) for p in range(planes))
    if probe_radius >= 2:
        for p1 in range(planes):
            for p2 in range(p1 + 1, planes):
                probes.add(qsig ^ (1 << p1) ^ (1 << p2))
    return sorted(probes)


def lsh_topk(
    source: DataFrame | str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    probe_radius: int = 1,
    bucket_col: str = "bucket",
    spark=None,
) -> DataFrame:
    """ANN top-k — the DEFAULT entry point, routed to the pruned scan
    whenever a bucketed layout exists:

    - ``source`` is a PATH (str): probe the signature-partitioned table
      written by ``write_bucketed_embeddings`` — the bucket predicate is
      partition pruning at the parquet scan (reads ~probes/2^planes of
      the data). This is the 100-TB path.
    - ``source`` is a DataFrame WITH a ``bucket`` column (a bucketed
      layout read back): filter on the precomputed bucket — no
      re-hashing; still partition pruning if the DataFrame came from the
      partitioned layout.
    - ``source`` is a DataFrame WITHOUT a bucket column: fall back to
      :func:`lsh_topk_full_scan` (hashes the whole table — fine for
      ad-hoc exploration, wrong for repeated queries; the docstring
      there says why).
    """
    if isinstance(source, str):
        if spark is None:
            from pyspark.sql import SparkSession  # noqa: PLC0415

            spark = SparkSession.getActiveSession()
        return lsh_topk_bucketed(
            spark, source, query_vec, k=k, planes=planes,
            probe_radius=probe_radius, id_col=id_col, vec_col=vec_col,
        )
    if bucket_col in source.columns:
        probes = _probe_set(query_signature(query_vec, planes), planes,
                            probe_radius)
        q = lit_double_array(query_vec)
        return (
            source.filter(F.col(bucket_col).isin(probes))
            .select(
                F.col(id_col),
                F.round(cosine(F.col(vec_col), q), 6).alias("score"),
            )
            .orderBy(F.desc("score"), F.col(id_col))
            .limit(k)
        )
    return lsh_topk_full_scan(
        source, query_vec, k=k, id_col=id_col, vec_col=vec_col, planes=planes
    )


def ivf_centroids(
    df: DataFrame, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF coarse quantizer: the vectors of the ``k``
    smallest ids serve as centroids (a fixed, reproducible seeding — a
    k-means refinement would plug in here without changing consumers;
    determinism is what makes the assignment oracle-checkable)."""
    rows = (
        df.filter(F.col(id_col) < k)
        .orderBy(id_col)
        .select(id_col, vec_col)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def ivf_assign(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Inner-product list assignment: index of the max-dot centroid,
    first-max (lowest centroid id) on ties — pure array arithmetic."""
    dots = F.array(
        *[
            dot(vec, lit_double_array(cvec))
            for _, cvec in centroids
        ]
    )
    # array_position is 1-based and returns the FIRST occurrence: the
    # deterministic tie-break by centroid index.
    idx = F.array_position(dots, F.array_max(dots)) - 1
    return F.element_at(
        F.array(*[F.lit(cid) for cid, _ in centroids]), (idx + 1).cast("int")
    )


def write_ivf_embeddings(
    df: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """IVF write side: physically partition the table by inverted-list id
    so a probe reads only the nprobe nearest lists (partition pruning —
    the same scan contract as the LSH writer, different quantizer)."""
    out = df.withColumn("list_id", ivf_assign(F.col(vec_col), centroids))
    out.write.mode("overwrite").partitionBy("list_id").parquet(path)
    return path


def ivf_topk(
    spark,
    path: str,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: rank centroids by dot with the query (driver-side — K
    is tiny), scan the ``nprobe`` nearest inverted lists, exact cosine
    top-k within them. Recall knob = nprobe; scan cost ≈ nprobe/K of the
    table via partition pruning."""
    scored = sorted(
        (
            (sum(float(c) * float(q) for c, q in zip(cvec, query_vec)), cid)
            for cid, cvec in centroids
        ),
        key=lambda t: (-t[0], t[1]),
    )
    probes = [cid for _, cid in scored[:nprobe]]
    q = lit_double_array(query_vec)
    df = spark.read.parquet(path).filter(F.col("list_id").isin(probes))
    return (
        df.select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score")
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def write_bucketed_embeddings(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 6,
    dims: int | None = None,
) -> str:
    """The ANN scale path's write side: compute each vector's signature
    once and physically partition the table by it
    (``partitionBy("bucket")``). A probe query's bucket predicate then
    becomes *partition pruning* at the parquet scan — it reads
    ~(probes/2^planes) of the data instead of scanning and hashing the
    whole table per query."""
    if dims is None:
        dims = len(df.select(vec_col).first()[0])
    out = df.withColumn("bucket", lsh_signature(F.col(vec_col), dims, planes))
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)
    return path


def lsh_topk_bucketed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    planes: int = 6,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over a signature-partitioned table with multi-probe.

    Probes the query's bucket plus every bucket within Hamming distance
    ``probe_radius`` (the standard multi-probe LSH recall fix — a vector
    one sign-flip away lands one bit away). The ``bucket IN (...)``
    predicate prunes partitions at the scan: ``.explain`` shows
    PartitionFilters, and only probed directories are read."""
    probes = _probe_set(query_signature(query_vec, planes), planes,
                        probe_radius)
    q = lit_double_array(query_vec)
    df = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    return (
        df.select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score")
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def banded_lsh_keys(
    vec: Column, dims: int, bands: int = 4, planes_per_band: int = 4
) -> Column:
    """One sub-signature per band from *disjoint* hyperplane sets
    (array<long>, length ``bands``).

    A single B-plane bucket only finds a near-dup pair when every one of B
    sign bits agrees — recall p^B.  Banding flips that: the pair is a
    candidate when ANY band's ``planes_per_band`` bits all agree, recall
    1-(1-p^w)^bands (the classic LSH OR-of-ANDs construction).

    Reference implementation in pure Column expressions (Spark evaluates
    higher-order-function lambdas interpreted — fine for probes/tests;
    the bulk path is ``lsh_band_keys_udf``, which computes identical
    keys vectorized).
    """
    keys = []
    for b in range(bands):
        sig = F.lit(0).cast("long")
        for p in range(planes_per_band):
            h = _hyperplane(b * planes_per_band + p, dims)
            sig = sig + (dot(vec, h) > 0).cast("long") * (1 << p)
        keys.append(sig)
    return F.array(*keys)


def _hyperplane_matrix(planes: int, dims: int):
    """The (planes × dims) hyperplane constants as float64 — the same
    doubles ``_hyperplane`` builds as literals (and the same values the
    oracle's BIGINT-arithmetic-then-divide SQL produces)."""
    return np.array(
        [
            [
                (((p * 131 + d) * HASH_MIX) % HASH_MOD) / HASH_MOD - 0.5
                for d in range(dims)
            ]
            for p in range(planes)
        ]
    )


def lsh_band_keys_udf(
    dims: int, bands: int, planes_per_band: int, center: bool
):
    """Arrow-batched band-key computation (returns a pandas UDF yielding
    array<long> of length ``bands``).

    Engine-exactness: every float operation replays the sequential
    left-fold order of the Column/SQL formulation — the d-loop adds one
    product per dimension across the whole batch, so each row sees
    ((0 + x₀h₀) + x₁h₁) + … exactly as ``F.aggregate``/``list_sum`` do.
    Bit-identical doubles ⇒ identical sign bits ⇒ identical buckets on
    any engine.

    ``center`` subtracts the per-row mean before signing: raw count
    vectors (bag-of-shingles) are all-positive and cluster around the
    all-ones direction (observed background cosine ≈ 0.4), which floods
    every bucket; centering projects that component out (background → ≈ 0)
    while near-dup pairs stay ≈ 1. The mean is Σ/dims with an integer-
    exact Σ and a power-of-two divide, so centering is itself exact.
    """
    H = _hyperplane_matrix(bands * planes_per_band, dims)

    @F.pandas_udf("array<long>")
    def _keys(vs: pd.Series) -> pd.Series:
        # NULL vectors propagate to NULL keys (no bucket) instead of
        # crashing the Arrow worker.
        out = [None] * len(vs)
        idx = [i for i, a in enumerate(vs) if a is not None]
        if not idx:
            return pd.Series(out, dtype=object)
        V = np.stack(
            [np.asarray(vs.iloc[i], dtype=np.float64) for i in idx]
        )
        if center:
            s = np.zeros(len(V))
            for d in range(dims):  # sequential fold, matches list_sum
                s = s + V[:, d]
            V = V - (s / dims)[:, None]
        keys = np.zeros((len(V), bands), dtype=np.int64)
        for b in range(bands):
            sig = np.zeros(len(V), dtype=np.int64)
            for p in range(planes_per_band):
                h = H[b * planes_per_band + p]
                acc = np.zeros(len(V))
                for d in range(dims):  # sequential fold, matches dot()
                    acc = acc + V[:, d] * h[d]
                sig |= (acc > 0).astype(np.int64) << p
            keys[:, b] = sig
        for row, i in enumerate(idx):
            out[i] = keys[row]
        return pd.Series(out, dtype=object)

    return _keys


def pair_cosine_udf(dims: int):
    """Arrow-batched exact cosine between two vector columns, with the
    same sequential-fold float semantics as ``cosine`` / the oracle's
    ``list_sum`` (see ``lsh_band_keys_udf``)."""
    @F.pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        # NULL on either side propagates to NULL score (Column semantics).
        out = [None] * len(va)
        idx = [
            i
            for i in range(len(va))
            if va.iloc[i] is not None and vb.iloc[i] is not None
        ]
        if not idx:
            return pd.Series(out, dtype=object)
        A = np.stack([np.asarray(va.iloc[i], dtype=np.float64) for i in idx])
        B = np.stack([np.asarray(vb.iloc[i], dtype=np.float64) for i in idx])
        dot_ = np.zeros(len(A))
        na = np.zeros(len(A))
        nb = np.zeros(len(A))
        for d in range(dims):  # sequential folds, match dot()/norm()
            dot_ = dot_ + A[:, d] * B[:, d]
            na = na + A[:, d] * A[:, d]
            nb = nb + B[:, d] * B[:, d]
        scores = dot_ / (np.sqrt(na) * np.sqrt(nb))
        for row, i in enumerate(idx):
            out[i] = float(scores[row])
        # object dtype so None -> SQL NULL (a float series would carry NaN)
        return pd.Series(out, dtype=object)

    return _cos


def sign_collision_prob(threshold: float) -> float:
    """P(a random hyperplane gives two vectors at cosine ``threshold``
    the same sign bit) = 1 − θ/π (Goemans–Williamson / SimHash)."""
    import math  # noqa: PLC0415

    return 1.0 - math.acos(threshold) / math.pi


def scaled_band_params(
    n: int,
    threshold: float,
    bands: int,
    planes_per_band: int,
    reference_n: int = 4096,
    background_sign_prob: float = 0.5,
) -> tuple[int, int]:
    """Grow the LSH banding with corpus size so background candidates
    stay ~linear in n instead of quadratic.

    With FIXED (bands b, planes w), a background pair collides a band
    with probability q^w (q = ``background_sign_prob``, the chance one
    hyperplane gives an UNRELATED pair the same sign — 0.5 for
    orthogonal vectors, higher when the corpus has residual background
    similarity), so background candidate volume is b·q^w·n²/2 — a
    constant FRACTION of all pairs. Harmless at 5k docs; at 10× the
    round-5 scale study measured 10.8× wall for 10× data, all of it
    candidate verification. The cure is textbook LSH parameter scaling:
    add Δw planes with Δw·log(p/q) = log(n/reference_n) — i.e. enough
    that the background rate falls as fast as n² grows — and multiply
    bands by (1/p)^Δw (p = :func:`sign_collision_prob` at the
    threshold), which holds the OR-of-ANDs recall 1−(1−p^w)^b constant
    by construction. Both grow O(log n) — at 100 TB that is tens of
    extra planes, still a tiny signature next to the vector itself.
    Requires q < p, i.e. the background must be separable from the
    threshold — when it is not, no banding scheme can help.
    """
    import math  # noqa: PLC0415

    if n <= reference_n:
        return bands, planes_per_band
    p = sign_collision_prob(threshold)
    if not background_sign_prob < p:
        raise ValueError(
            f"background_sign_prob {background_sign_prob} must be below "
            f"the threshold's sign-collision prob {p:.4f}"
        )
    extra = math.ceil(
        math.log(n / reference_n) / math.log(p / background_sign_prob)
    )
    return math.ceil(bands * (1.0 / p) ** extra), planes_per_band + extra


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    threshold: float = 0.9,
    bands: int = 8,
    planes_per_band: int = 12,
    center: bool = True,
    auto_scale: bool = False,
    background_sign_prob: float = 0.5,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score ≥ threshold).

    The standard candidate→verify shape at 100-TB scale:

    1. banded random-hyperplane signatures over (optionally mean-centered)
       vectors — Arrow-vectorized, deterministic (``lsh_band_keys_udf``);
    2. self-equi-join on (band, key) over a *narrow* (id, band, key)
       projection — shuffle volume is O(n·bands) ids, never vectors,
       never O(n²);
    3. exact *raw*-cosine verification via two id-equi-joins that fetch
       vectors for candidate pairs only (keys may be centered; the
       reported metric never is).

    Banding bounds recall (defaults measured at 100% on the synthetic
    corpus with a ~2% background candidate rate; the generic OR-of-ANDs
    estimate is 1-(1-p^w)^bands); precision is exact because every
    emitted pair is cosine-verified. All arithmetic is deterministic and
    fold-order-exact, so the same pairs appear on any engine and the
    operator is oracle-checkable in ANSI SQL.
    """
    # Persisted (tracked — release with caching.release_intermediates()):
    # three consumers (band projection + both verify sides) would otherwise
    # recompute the upstream embedding per use. At cluster scale
    # write/checkpoint the (id, vector) projection instead.
    base = track(df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ))
    if auto_scale:
        # One scalar count over the persisted projection (the same
        # driver-coordination budget as duplicate_components'
        # convergence check) buys ~linear instead of quadratic
        # background candidate volume — see scaled_band_params.
        bands, planes_per_band = scaled_band_params(
            base.count(), threshold, bands, planes_per_band,
            background_sign_prob=background_sign_prob,
        )
    keys_udf = lsh_band_keys_udf(dims, bands, planes_per_band, center)
    # Pinned hash partitioning on the join key (r15 optimization pass,
    # guide §2.4-2.6): the banded projection is a few bytes/row, so AQE
    # coalesced the self-join's shuffle read to ONE partition and the
    # whole candidate+verify chain ran single-task. An explicit
    # repartition on (_band, _key) keeps the cached frame partitioned
    # exactly as the self-join needs (both aliases co-partitioned →
    # no further exchange) at cluster-adaptive width.
    par = df.sparkSession.sparkContext.defaultParallelism
    banded = track(base.select(
        "_id",
        F.posexplode(keys_udf(F.col("_v"))).alias("_band", "_key"),
    ).repartition(par, F.col("_band"), F.col("_key")))
    left, right = banded.alias("l"), banded.alias("r")
    # The explicit hash repartition after the distinct restores
    # parallelism for the verify stage (same rationale): the
    # candidate-id pairs are a few bytes/row, so AQE's size-based
    # coalescing collapses the post-distinct stage to ONE partition —
    # and the pair-cosine UDF then runs single-task even though its
    # per-row cost (a 2·dims vector fold) is the dominant term. Keyed
    # by the pair ids (high cardinality), sized by defaultParallelism —
    # cluster-adaptive, not a local constant.
    pairs = (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._key") == F.col("r._key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
        .repartition(par, F.col("id_a"), F.col("id_b"))
    )
    verified = pairs.join(
        base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va")), "id_a"
    ).join(base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb")), "id_b")
    cos_udf = pair_cosine_udf(dims)
    return (
        verified.select(
            "id_a",
            "id_b",
            F.round(cos_udf(F.col("_va"), F.col("_vb")), 6).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


# ---------------------------------------------------------------------------
# Int8 scalar quantization — the standard memory/shuffle-width reduction
# for ANN at scale: 4 bytes/dim (float32) become 1, so a 100-TB embedding
# shuffle moves ~4x less data, and integer dot products are EXACT (no
# fold-order ulps), which makes quantized scores bit-identical across
# engines and runs — a determinism bonus on top of the bandwidth win.
# Per-vector symmetric scaling (max|x|/127); the scale factor cancels in
# cosine, so quantized cosine needs no dequantization at all.


def with_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Add ``q_col`` (array<long> in [-127, 127] — int8-valued; the
    storage sink narrows to tinyint) and ``scale_col`` (the per-vector
    dequantization factor, max|x|/127). All-zero vectors quantize to
    zeros with scale 0. Pure map-side Column arithmetic."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.withColumn("_qz_v", v).withColumn(
        scale_col,
        F.array_max(F.transform(F.col("_qz_v"), lambda x: F.abs(x))) / 127.0,
    )
    q = F.when(
        F.col(scale_col) == 0.0,
        F.transform(F.col("_qz_v"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            F.col("_qz_v"),
            lambda x: F.round(x / F.col(scale_col)).cast("long"),
        )
    )
    return staged.withColumn(q_col, q).drop("_qz_v")


def quantize_vector(vec: list[float]) -> list[int]:
    """Driver-side twin of :func:`with_quantized` for literal query
    vectors (same arithmetic: double division, round-half-away)."""
    import math

    s = max(abs(float(x)) for x in vec) / 127.0 if vec else 0.0
    if s == 0.0:
        return [0] * len(vec)
    out = []
    for x in vec:
        r = float(x) / s
        # Python round() is half-to-even; Spark/DuckDB round half away
        # from zero — do it explicitly.
        out.append(int(math.floor(abs(r) + 0.5)) * (1 if r >= 0 else -1))
    return out


def quantized_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine over int8-quantized vectors: the query is
    quantized driver-side, every corpus vector map-side; scores are
    integer dot products (exact, fold-order-free). Returns
    ``(id, qscore)`` with qscore rounded to 6 dp."""
    qq = quantize_vector(query_vec)
    qlit = F.array(*[F.lit(int(x)) for x in qq])
    scored = with_quantized(embeddings, vec_col).select(
        F.col(id_col),
        F.round(cosine(F.col("qvec"), qlit), 6).alias("qscore"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("qscore"), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection — the dimensionality-reduction
# step before ANN at scale: project 64-dim embeddings to a handful of
# dims with the SAME deterministic hyperplane family the LSH signatures
# use (pure integer-mixing arithmetic, no stored projection matrix, no
# randomness to version) — distances are approximately preserved while
# every downstream shuffle moves out_dims/in_dims of the bytes.


def project_embedding(
    vec: Column, in_dims: int, out_dims: int
) -> Column:
    """JL projection: out[j] = round(dot(vec, hyperplane_j), 6). The
    6-dp rounding pins the stored projection across engines (cosine is
    scale-invariant, so no 1/sqrt(k) normalization is needed)."""
    return F.array(
        *[
            F.round(dot(vec, _hyperplane(j, in_dims)), 6)
            for j in range(out_dims)
        ]
    )


def project_embeddings(
    df: DataFrame,
    in_dims: int,
    out_dims: int = 16,
    vec_col: str = "embedding",
    out_col: str = "pvec",
) -> DataFrame:
    """Add the projected vector column — map-only, codegen arithmetic."""
    return df.withColumn(
        out_col, project_embedding(F.col(vec_col), in_dims, out_dims)
    )


def project_vector(query_vec: list[float], out_dims: int) -> list[float]:
    """Driver-side twin of :func:`project_embedding` for literal query
    vectors (identical arithmetic and rounding)."""
    in_dims = len(query_vec)
    out = []
    for j in range(out_dims):
        s = sum(
            ((((j * 131 + i) * HASH_MIX) % HASH_MOD) / HASH_MOD - 0.5)
            * float(query_vec[i])
            for i in range(in_dims)
        )
        out.append(round(s, 6))
    return out


def projected_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    out_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: cosine in the JL-projected space. Same
    map-only TakeOrderedAndProject plan as the exact scorer, on
    out_dims/in_dims of the arithmetic and shuffle bytes; recall
    follows the JL distortion bound. Returns (id, pscore) at 6 dp."""
    in_dims = len(query_vec)
    pq = project_vector(query_vec, out_dims)
    qlit = lit_double_array(pq)
    scored = project_embeddings(
        embeddings, in_dims, out_dims, vec_col
    ).select(
        F.col(id_col),
        F.round(cosine(F.col("pvec"), qlit), 6).alias("pscore"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("pscore"), F.col(id_col)).limit(k)


# --------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric distance computation (ADC) —
# the FAISS-style memory-bound ANN path: split the vector into M
# subspaces, quantize each sub-vector to a small per-subspace codebook,
# and score queries against CODES (M small ints per vector) instead of
# floats. At 64 dims × float32 → 8 int8 codes, the scan-side footprint
# shrinks 32×, which is what makes billion-vector search feasible.

#: number of subspaces (codes per vector)
PQ_SUBSPACES = 8
#: codebook entries per subspace
PQ_CODES = 16


def _sqd(a: Column, b: Column) -> Column:
    """Squared L2 distance as a sequential left fold (deterministic
    order — bit-identical to DuckDB ``list_sum``)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _round_half_away(x: float, dp: int) -> float:
    """Half-AWAY-from-zero (SQL round semantics) — Python ``round()`` is
    half-to-even and can diverge from both engines at a boundary."""
    import math

    s = 10.0 ** dp
    return math.floor(abs(x) * s + 0.5) / s * (1.0 if x >= 0 else -1.0)


def pq_codebooks(
    df: DataFrame,
    n_subspaces: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: the sub-vectors of the ``n_codes``
    smallest ids, code = position in ascending id order — the
    :func:`ivf_centroids` seeding contract (a per-subspace k-means
    refinement plugs in here without changing consumers; determinism is
    what makes the encoding oracle-checkable). Returns
    ``books[mi][code] = sub-vector`` (model state: M·K·d floats)."""
    rows = (
        df.filter(F.col(id_col) < n_codes)
        .orderBy(id_col)
        .select(id_col, vec_col)
        .collect()
    )
    if len(rows) != n_codes:
        raise ValueError(
            f"pq_codebooks needs exactly {n_codes} seed rows with "
            f"{id_col} in [0, {n_codes}); found {len(rows)} — a smaller "
            "codebook would silently change every code assignment"
        )
    vecs = [[float(x) for x in r[1]] for r in rows]
    if len(vecs[0]) % n_subspaces:
        raise ValueError(
            f"embedding dim {len(vecs[0])} not divisible by "
            f"n_subspaces={n_subspaces}"
        )
    d = len(vecs[0]) // n_subspaces
    return [
        [v[mi * d:(mi + 1) * d] for v in vecs] for mi in range(n_subspaces)
    ]


def pq_encode(
    df: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``pq_c0..pq_c{M-1}`` code columns: per subspace, the argmin
    of the 9-dp-rounded squared distance to each codebook entry
    (first-min = lowest code on ties). Pure Column arithmetic against
    literal codebooks — map-only, whole-stage codegen, no shuffle, no
    Python; the 100-TB encode is a single scan.

    The sub-vector is STAGED in a column before the per-code folds
    (multi-reference on an expression stops CollapseProject from
    keeping it single-eval otherwise)."""
    d = len(books[0][0])
    # Two batched selects instead of a 2M-call withColumn chain (r16,
    # guide §5: ~10 ms of py4j/plan-wrap per withColumn measured —
    # same plan after CollapseProject, just built in 2 calls).
    staged = df.select(
        "*",
        *[
            F.slice(F.col(vec_col), mi * d + 1, d).alias(f"_sub{mi}")
            for mi in range(len(books))
        ],
    )

    def _code(mi: int, book) -> "Column":
        # ONE transform lambda over the literal codebook (array of
        # arrays), not K unrolled fold expressions: identical arithmetic
        # and fold order per code, but a K× smaller codegen tree — the
        # unrolled form measurably pays whole-stage-codegen compile cost
        # (the k-means COLUMN_PATH_MAX_K lesson, here fixed by looping
        # the data instead of the plan).
        cb_lit = lit_double_matrix(book)
        dists = F.transform(
            cb_lit, lambda cv: F.round(_sqd(F.col(f"_sub{mi}"), cv), 9)
        )
        return (
            F.array_position(dists, F.array_min(dists)) - 1
        ).cast("int").alias(f"pq_c{mi}")

    return staged.select(
        *[c for c in df.columns],
        *[_code(mi, book) for mi, book in enumerate(books)],
    )


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    books: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """ADC top-k: the query's distance to every codebook entry is a
    driver-side M×K lookup table (model state, like the IVF centroid
    ranking); each vector's approximate distance is the LEFT-TO-RIGHT
    chained sum of its M looked-up cells, rounded to 6 dp. Smallest
    distance first, ties by id.

    Scale: after :func:`pq_encode` the score is M ``element_at`` calls
    on literal arrays — the scan never touches the float vectors, so a
    stored-codes table is 32× narrower than the float baseline; the
    plan is map-only + TakeOrderedAndProject like every other scorer.
    Recall follows the PQ distortion; re-rank the top-k' with exact
    cosine for the standard two-stage recipe."""
    d = len(books[0][0])
    enc = pq_encode(df, books, id_col, vec_col)
    approx = None
    for mi, book in enumerate(books):
        q = query_vec[mi * d:(mi + 1) * d]
        lut = [
            _round_half_away(
                sum((qx - cx) * (qx - cx) for qx, cx in zip(q, cv)), 9
            )
            for cv in book
        ]
        term = F.element_at(
            F.array(*[F.lit(v) for v in lut]), F.col(f"pq_c{mi}") + 1
        )
        approx = term if approx is None else approx + term
    scored = enc.select(
        F.col(id_col), F.round(approx, 6).alias("approx_dist")
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.asc("approx_dist"), F.col(id_col)).limit(k)


def ann_recall(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    out_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Recall@k self-evaluation for the compressed ANN scorers — measure,
    don't guess: for one query, compute the EXACT float cosine top-k and
    the top-k under each lossy representation (int8 scalar quantization;
    Johnson-Lindenstrauss projection to ``out_dims``), and report the
    overlap fraction. This is the audit a pipeline runs before trusting
    a cheaper index at 100 TB — the same role the count-min and
    approx-percentile guard queries play for their sketches.

    Returns one row per method: ``(method, k, hits, recall)`` with
    ``recall = hits / k`` at 6 dp, ordered by method name.

    Scale: each branch is the already-scale-audited map-only scorer plus
    a TakeOrderedAndProject; the overlap join is k-row against k-row
    (broadcast hash semi-join, never a data-plane shuffle). Work is a
    constant number of corpus scans; a production harness would persist
    the scored candidates and sweep k without re-scanning."""
    # The exact top-k feeds one semi-join PER variant; untracked, each
    # consumer re-ran the full exact cosine scan + TakeOrdered (r15
    # optimization, guide §2.4/§5). A k-row frame — model-artifact
    # sized, exactly the "persist the scored candidates" posture the
    # docstring prescribes for a production harness.
    exact = track(cosine_topk(
        embeddings, query_vec, k=k, id_col=id_col, vec_col=vec_col,
        exclude_id=exclude_id,
    ).select(id_col))
    variants = [
        (
            "int8",
            quantized_cosine_topk(
                embeddings, query_vec, k=k, id_col=id_col,
                vec_col=vec_col, exclude_id=exclude_id,
            ).select(id_col),
        ),
        (
            f"jl{out_dims}",
            projected_cosine_topk(
                embeddings, query_vec, k=k, out_dims=out_dims,
                id_col=id_col, vec_col=vec_col, exclude_id=exclude_id,
            ).select(id_col),
        ),
    ]
    out = None
    for name, approx in variants:
        row = (
            approx.join(exact, id_col, "left_semi")
            .agg(F.count(F.lit(1)).alias("hits"))
            .select(
                F.lit(name).alias("method"),
                F.lit(k).cast("long").alias("k"),
                F.col("hits").cast("long").alias("hits"),
                F.round(F.col("hits") / F.lit(float(k)), 6).alias("recall"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("method")


def mips_augment(
    embeddings: DataFrame,
    max_norm: float,
    vec_col: str = "embedding",
    out_col: str = "_aug",
) -> DataFrame:
    """Maximum-inner-product search via the norm-augmentation reduction
    (Bachrach et al. 2014 / Shrivastava-Li): append one component
    ``sqrt(M² − |x|²)`` to every vector, where ``M`` is (at least) the
    corpus max norm. Every augmented vector then has norm exactly M, so
    COSINE order against an augmented query ``(q, 0)`` equals
    INNER-PRODUCT order against the original vectors — which lets the
    existing cosine ANN layouts (LSH buckets, IVF lists, int8/PQ codes)
    serve MIPS queries unchanged. ``M`` is model state (one scalar from
    a corpus pass — the _query_vec/centroid collect pattern), not a
    per-query cost.

    Map-only Column arithmetic; norms clipped at M so float dust can't
    produce sqrt of a negative."""
    if max_norm <= 0:
        raise ValueError("max_norm must be positive")
    v = F.col(vec_col)
    n2 = dot(v, v)
    extra = F.sqrt(F.greatest(F.lit(max_norm * max_norm) - n2, F.lit(0.0)))
    return embeddings.withColumn(
        out_col,
        F.concat(
            F.transform(v, lambda x: x.cast("double")), F.array(extra)
        ),
    )


def corpus_max_norm(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> float:
    """The scalar M for :func:`mips_augment` — one aggregate over the
    corpus, collected as model state (O(1), like IVF seeds)."""
    v = F.col(vec_col)
    row = embeddings.agg(F.max(F.sqrt(dot(v, v))).alias("m")).first()
    return float(row.m)


def mips_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by INNER PRODUCT (the recommendation/retrieval
    scoring where vector length carries signal — popularity-scaled item
    embeddings — and cosine is the wrong order). Same shape as
    :func:`cosine_topk`: constant-folded query literal, map-only score,
    TakeOrderedAndProject; score at 6 dp, ties by id."""
    q = lit_double_array(query_vec)
    scored = embeddings.select(
        F.col(id_col),
        F.round(dot(F.col(vec_col), q), 6).alias("ip"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("ip"), F.col(id_col)).limit(k)


def lsh_radius_ablation(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    planes: int = 6,
    radii: tuple[int, ...] = (0, 1, 2, 3),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Multi-probe radius ablation — the ANN family's tuning datasheet
    (the threshold-ablation pattern applied to the recall knob): what
    recall does each probe radius buy, and what fraction of the corpus
    does it pay to scan? Probe sets are NESTED by construction (radius
    r's buckets ⊆ radius r+1's), so EVERY radius is an exact projection
    of ONE scored pass: per vector, the Hamming distance of its bucket
    to the query's (``bit_count(sig XOR qsig)``) plus its exact 6-dp
    cosine; the exact top-k flags ground truth, and one 1-row
    conditional agg exploded to |radii| rows prices every radius — no
    per-radius probe re-run.

    Per radius: ``(radius, k, n_candidates, candidate_frac, hits,
    recall)`` — candidates = vectors within Hamming ``radius`` (what a
    multi-probe query at that radius would scan), recall = fraction of
    the exact top-k inside that candidate set, both at 6 dp.

    Scale: one corpus scan computing (sig, cosine), one
    TakeOrderedAndProject for the truth set, a k-row broadcast flag
    join, one 1-row agg. Catalyst pays the scan per consumer here (the
    ann_recall "constant number of corpus scans" contract); a
    production harness persists the scored frame and sweeps radii and
    k for free."""
    dims = len(query_vec)
    qv = lit_double_array(query_vec)
    qsig = query_signature(query_vec, planes)
    scored = embeddings.select(
        F.col(id_col),
        F.bit_count(
            lsh_signature(F.col(vec_col), dims, planes).bitwiseXOR(
                F.lit(int(qsig))
            )
        ).cast("int").alias("_hd"),
        F.round(cosine(F.col(vec_col), qv), 6).alias("_score"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    topk = (
        scored.orderBy(F.desc("_score"), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.lit(True).alias("_t"))
    )
    flagged = scored.join(F.broadcast(topk), [id_col], "left").select(
        "_hd", F.coalesce(F.col("_t"), F.lit(False)).alias("_t")
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for r in radii:
        aggs += [
            F.sum((F.col("_hd") <= r).cast("long")).cast("long").alias(
                f"_c{r}"
            ),
            F.sum(((F.col("_hd") <= r) & F.col("_t")).cast("long"))
            .cast("long")
            .alias(f"_h{r}"),
        ]
    one = flagged.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(r)).alias("radius"),
                    F.col(f"_c{r}").alias("n_candidates"),
                    F.col(f"_h{r}").alias("hits"),
                )
                for r in radii
            ]
        )
    )
    return (
        one.select("_n", rows.alias("r"))
        .select(
            F.col("r.radius").alias("radius"),
            F.lit(int(k)).cast("long").alias("k"),
            F.col("r.n_candidates").alias("n_candidates"),
            F.round(
                F.col("r.n_candidates")
                / F.greatest(F.col("_n"), F.lit(1)).cast("double"),
                6,
            ).alias("candidate_frac"),
            F.col("r.hits").alias("hits"),
            F.round(F.col("r.hits") / F.lit(float(k)), 6).alias("recall"),
        )
        .orderBy("radius")
    )


def batch_ann_recall(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    salt_buckets: int = 32,
) -> DataFrame:
    """:func:`ann_recall` at evaluation scale: recall@k of the
    int8-quantized scorer against the exact float ranking for a whole
    QUERY SET — the audit you actually run before switching an index
    over (one query's recall is an anecdote; a query set is a
    measurement). Returns one row per query:
    ``(q_id, k, hits, recall)`` — aggregate/percentile the column for
    the report; queries with zero overlap report 0, not a missing row.

    Scale: both rankings come from :func:`batch_cosine_topk` (broadcast
    query set, salted local top-k — map-only over the corpus, the
    audited plan); the overlap is a (q_id, id)-keyed semi-join of two
    |Q|·k-row lists. Two corpus scans total. Pass a BOUNDED query
    sample: scored pair volume is N·|Q|, so a query set that is a fixed
    FRACTION of the corpus makes the audit quadratic in corpus size
    (measured 4.7× wall at 10× data before the harness query capped its
    sample at 64) — recall is a statistic, a fixed-size sample measures
    it at any corpus size."""
    exact = batch_cosine_topk(
        embeddings, queries, k, id_col, vec_col, q_id_col, q_vec_col,
        salt_buckets,
    ).select(q_id_col, id_col)
    eq = with_quantized(embeddings, vec_col, q_col="_bq").select(
        F.col(id_col), F.col("_bq").alias(vec_col)
    )
    qq = with_quantized(queries, q_vec_col, q_col="_bqq").select(
        F.col(q_id_col), F.col("_bqq").alias(q_vec_col)
    )
    approx = batch_cosine_topk(
        eq, qq, k, id_col, vec_col, q_id_col, q_vec_col, salt_buckets
    ).select(q_id_col, id_col)
    hits = (
        approx.join(exact, [q_id_col, id_col], "left_semi")
        .groupBy(q_id_col)
        .agg(F.count(F.lit(1)).alias("_h"))
    )
    return (
        queries.select(q_id_col)
        .join(hits, q_id_col, "left")
        .select(
            F.col(q_id_col),
            F.lit(k).cast("long").alias("k"),
            F.coalesce(F.col("_h"), F.lit(0)).cast("long").alias("hits"),
            F.round(
                F.coalesce(F.col("_h"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall"),
        )
    )


def ann_ndcg(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    out_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Position-sensitive complement of :func:`ann_recall`: nDCG@k of
    each lossy ranking (int8 scalar quantization, JL projection)
    against the exact cosine ranking as graded ground truth. Recall@k
    treats a hit at rank 1 and rank k the same; nDCG is the standard
    IR correction — an index that finds the right set but scrambles
    the order loses score in proportion to how far each item moved:

        rel(item at exact rank r) = k - r + 1   (0 outside the top-k)
        DCG  = Σ_i rel(item_i) / log2(i + 1)
        nDCG = DCG / IDCG                       (IDCG = exact order)

    Returns one row per method: ``(method, k, ndcg)``, ndcg at 6 dp.

    Determinism: every DCG term is rounded to 1e-9 fixed point and
    summed as LONGS (fold order cannot drift the total); IDCG uses the
    identical term arithmetic, computed driver-side with the same
    half-away rounding SQL ``round`` uses. Both rankings tie-break on
    the id, so ranks are total.

    Scale: each ranking is the already-audited map-only scorer + a
    TakeOrderedAndProject; the ranking windows and joins run over
    k-row frames only (the partition-less window is over k rows, not
    data)."""
    from pyspark.sql import Window

    exact = cosine_topk(
        embeddings, query_vec, k=k, id_col=id_col, vec_col=vec_col,
        exclude_id=exclude_id,
    )
    import math

    we = Window.orderBy(F.desc("score"), F.col(id_col))
    # Graded-truth table joined once per variant; tracked so the exact
    # cosine scan runs once, not per consumer (k rows — see ann_recall).
    rel_tbl = track(exact.select(
        F.col(id_col),
        (F.lit(k) - F.row_number().over(we) + 1).alias("_rel"),
    ))
    idcg_fp = sum(
        int(_round_half_away((k - r + 1) / math.log2(r + 1) * 1e9, 0))
        for r in range(1, k + 1)
    )
    variants = [
        (
            "int8",
            quantized_cosine_topk(
                embeddings, query_vec, k=k, id_col=id_col,
                vec_col=vec_col, exclude_id=exclude_id,
            ).withColumnRenamed("qscore", "score"),
        ),
        (
            f"jl{out_dims}",
            projected_cosine_topk(
                embeddings, query_vec, k=k, out_dims=out_dims,
                id_col=id_col, vec_col=vec_col, exclude_id=exclude_id,
            ).withColumnRenamed("pscore", "score"),
        ),
    ]
    out = None
    for name, approx in variants:
        wa = Window.orderBy(F.desc("score"), F.col(id_col))
        ranked = approx.select(
            F.col(id_col), F.row_number().over(wa).alias("_pos")
        )
        row = (
            ranked.join(rel_tbl, id_col, "left")
            .select(
                F.round(
                    F.coalesce(F.col("_rel"), F.lit(0)).cast("double")
                    / F.log2(F.col("_pos") + 1)
                    * F.lit(1e9)
                )
                .cast("long")
                .alias("_fp")
            )
            .agg(F.sum("_fp").alias("_dcg_fp"))
            .select(
                F.lit(name).alias("method"),
                F.lit(k).cast("long").alias("k"),
                F.round(
                    F.col("_dcg_fp") * F.lit(1.0) / F.lit(idcg_fp), 6
                ).alias("ndcg"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("method")


def bitext_margin_mine(
    src_queries: DataFrame,
    tgt: DataFrame,
    src: DataFrame,
    k: int = 4,
    threshold: float = 1.06,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bitext mining via the RATIO margin criterion (Artetxe & Schwenk
    2019; the CCMatrix/LASER recipe): for every source-language
    sentence in a bounded mining shard, find its best target-language
    candidate by the margin score

        margin(x, y) = cos(x, y) /
                       (mean_k cos(x, NN_k(x, TGT)) / 2
                        + mean_k cos(y, NN_k(y, SRC)) / 2)

    — raw cosine normalized by both sides' local neighborhood density,
    the published fix for cosine's hubness failure (a "hub" sentence
    close to everything scores a high cosine with many wrong mates but
    a margin near 1). Pairs above ``threshold`` (the paper's tuned
    1.06 cut) are MINED as parallel text — the multilingual-pipeline
    operator that feeds the mixture family.

    Semantics, built on :func:`batch_cosine_topk`'s audited shape:
    forward k-NN of each query x over the target corpus; the candidate
    set (≤ |Q|·k target ids) turns around as the query side of the
    BACKWARD k-NN over the source corpus. Each (x, y) forward pair
    scores one margin; the emitted row per query is the top margin
    (ties: lowest target id).

    Determinism (fixed-point margins): cosines are 6-dp rounds; each
    neighborhood sum aggregates 1e-6 fixed-point LONGS (``Σ round(
    cos·10⁶)`` — fold-order-free); the margin is ONE double division
    of exact integers, ``round(s·2·n_x·n_y / (D_x·n_y + D_y·n_x),
    4)`` — no engine's float fold can move it. A non-positive
    denominator (every neighbor anti-correlated) emits the 0.0
    sentinel, never NULL.

    Returns ``(src_id, tgt_id, cos_score, margin, mined)`` — one row
    per mining-shard query, ``mined = 1`` iff margin > threshold.

    Scale: two broadcast-query k-NN passes (the documented
    |Q|-bounded BNLJ whitelist shape of q_sim_batch_topk — the big
    sides never shuffle); the margin math is arithmetic over the
    bounded |Q|·k pair table. Production mines shard-by-shard exactly
    like this — the full-corpus-×-full-corpus form is what the
    IVF/LSH tiers above replace.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    # DELIBERATELY untracked: the forward k-NN feeds three consumers
    # and Catalyst does duplicate its broadcast-scan subtree — but a
    # back-to-back lap measured the track() variant 70% SLOWER (5.96
    # vs 3.50 s at sf0.1, 8.55 vs 6.24 s at 10×): the persist is a
    # materialization BARRIER that serializes work the duplicated
    # map-only scans otherwise run concurrently on idle cores, the
    # opposite trade from the dedup ablations' tracked pair frames
    # (whose shared subtree is an expensive SHUFFLING chain, not a
    # map-only scan).
    fwd = batch_cosine_topk(
        tgt, src_queries, k=k, id_col=id_col, vec_col=vec_col
    )
    fx = fwd.groupBy("q_id").agg(
        F.sum(F.round(F.col("score") * 1e6).cast("long")).alias("_dx"),
        F.count(F.lit(1)).cast("long").alias("_nx"),
    )
    ycand = (
        fwd.select(F.col(id_col)).distinct()
        .join(tgt.select(F.col(id_col), F.col(vec_col)), [id_col])
        .select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
    )
    bwd = batch_cosine_topk(
        src, ycand, k=k, id_col=id_col, vec_col=vec_col
    )
    by = bwd.groupBy("q_id").agg(
        F.sum(F.round(F.col("score") * 1e6).cast("long")).alias("_dy"),
        F.count(F.lit(1)).cast("long").alias("_ny"),
    )
    pairs = (
        fwd.select(
            F.col("q_id").alias("src_id"),
            F.col(id_col).alias("tgt_id"),
            F.col("score"),
            F.round(F.col("score") * 1e6).cast("long").alias("_sx"),
        )
        .join(fx.withColumnRenamed("q_id", "src_id"), ["src_id"])
        .join(by.withColumnRenamed("q_id", "tgt_id"), ["tgt_id"])
    )
    den = F.col("_dx") * F.col("_ny") + F.col("_dy") * F.col("_nx")
    margin = F.when(
        den > 0,
        F.round(
            F.col("_sx")
            * F.lit(2.0)
            * F.col("_nx")
            * F.col("_ny")
            / den.cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    w = Window.partitionBy("src_id").orderBy(
        F.desc("margin"), F.col("tgt_id").asc()
    )
    return (
        pairs.withColumn("margin", margin)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "src_id",
            "tgt_id",
            F.col("score").alias("cos_score"),
            "margin",
            (F.col("margin") > F.lit(float(threshold)))
            .cast("int")
            .alias("mined"),
        )
    )
