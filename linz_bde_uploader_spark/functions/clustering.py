"""Embedding clustering for training-data curation — deterministic
Lloyd's k-means over an embedding column, and the SemDeDup pattern built
on it: partition the corpus into k clusters, then remove near-duplicate
vectors *within* each cluster, so the quadratic pair search is bounded
by cluster size instead of corpus size.

Determinism is the design constraint that makes the operators
oracle-checkable (and reproducible run-to-run on a cluster, which real
curation pipelines need for auditability):

- seeding is fixed (the vectors of the k smallest ids — the same rule
  as ``similarity.ivf_centroids``);
- assignment is argmin of squared Euclidean distance ROUNDED to 6 dp,
  ties broken by centroid id, so engines differing in ulps agree;
- each new centroid coordinate is the per-cluster mean rounded to 6 dp;
- clusters that lose every member are dropped (both engines agree
  structurally instead of needing a re-seeding heuristic).

Scale notes (100 TB): every iteration is one map-only assignment pass
(centroids are literal arrays constant-folded into codegen — k·dims
doubles, far under any broadcast limit) plus one partial-agg shuffle
keyed by (cluster, dim) whose state is k·dims cells. The k·dims
centroid table collected per iteration is model state, not data (the
same driver-side scalar pattern as ``text.bpe_train``'s argmax). The
SemDeDup pair join shuffles on the cluster id, and its quadratic term
is per-cluster — the entire point of clustering first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from linz_bde_uploader_spark.functions.litexpr import lit_double_array

from linz_bde_uploader_spark.functions.similarity import cosine, dot

#: rounding applied to centroid coordinates and squared distances so
#: fold-order ulp differences between engines can't flip an argmin.
ROUND_DP = 6

#: above this k the assignment switches from constant-folded Column
#: expressions to an Arrow-batched numpy per-dim fold. Measured (10x
#: scale study): at k=32 the Column path's codegen size already
#: dominates wall (8 s of a 10 s run was plan/compile), while the
#: Arrow path handled k=313 on 10x the data in under 2 s — so the
#: cutoff sits just above the oracle scales' auto-k of 8. Since round
#: 15 the Arrow path folds dimensions in the SAME order as the Column
#: expression (bitwise-equal distances), so the two strategies — and
#: the DuckDB oracle — agree at EVERY k, not just below the cutoff.
COLUMN_PATH_MAX_K = 16

#: auto-scaled k targets clusters of ~this many vectors, which is what
#: keeps SemDeDup's per-cluster quadratic term CONSTANT as the corpus
#: grows (fixed k would make pair volume grow as the square of corpus
#: size — the same failure mode round 4's LSH banding fix addressed).
TARGET_CLUSTER_SIZE = 64


def auto_k(n: int, target_cluster_size: int = TARGET_CLUSTER_SIZE,
           min_k: int = 8) -> int:
    """k that holds the expected cluster size at ``target_cluster_size``.
    At the correctness-gate scales this resolves to exactly ``min_k`` = 8
    (50 and 500 vectors), which is what the pinned DuckDB oracles use."""
    import math

    return max(min_k, math.ceil(n / target_cluster_size))


def _sq_dist(vec, centroid_lit) -> F.Column:
    d = F.zip_with(
        vec, centroid_lit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
    )
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)


def assign_clusters(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only nearest-centroid assignment: adds ``cluster`` (the
    winning centroid id; ties at 6 dp go to the smallest id) and
    ``sq_dist`` (the rounded squared distance to it).

    Two physical strategies, same ARITHMETIC: small k constant-folds
    the centroid matrix into codegen; large k runs an Arrow-batched
    numpy fold with the identical operation order (codegen size and
    per-row lambda dispatch both grow with k·dims, so the expression
    path stops making sense — the Arrow batch is the strategy a 100-TB
    run with thousands of centroids needs anyway). Bitwise-equal
    distances mean the choice of strategy can never flip an argmin —
    the answer is a function of the data, not of k's side of the
    cutoff."""
    if len(centroids) > COLUMN_PATH_MAX_K:
        return _assign_clusters_arrow(df, centroids, id_col, vec_col)
    vec = F.col(vec_col)
    dists = F.array(
        *[
            F.round(
                _sq_dist(vec, lit_double_array(cvec)), ROUND_DP
            )
            for _, cvec in centroids
        ]
    )
    cids = F.array(*[F.lit(cid) for cid, _ in centroids])
    # Stage the distance array as an attribute so the k fold expressions
    # evaluate once; array_position returns the FIRST index of the min —
    # the tie-break by centroid order (= ascending id, the seeding order).
    staged = df.withColumn("_dists", dists)
    idx = F.array_position(
        F.col("_dists"), F.array_min(F.col("_dists"))
    ).cast("int")
    return staged.select(
        "*",
        F.element_at(cids, idx).cast("long").alias("cluster"),
        F.element_at(F.col("_dists"), idx).alias("sq_dist"),
    ).drop("_dists")


def _round_shortest_half_up(d2, dp):
    """Vectorized mirror of Spark ``F.round``/DuckDB ``round`` on
    non-negative doubles: HALF_UP on the SHORTEST-decimal form
    (``BigDecimal.valueOf(double)`` = ``repr(float)``), not on the
    scaled binary value. The fast path ``floor(x·10^dp + 0.5)/10^dp``
    agrees everywhere except where ``x·10^dp`` sits within an
    ulp-scale window of a half-tick — there the binary product can
    fall on the other side of ``.5`` than the shortest-decimal digits
    (the exact half-tick class the engine-rounding convention
    documents) — so those rare elements are recomputed through
    ``Decimal(repr(x))``, which is bit-for-bit the engine rule."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal  # noqa: PLC0415

    scale = 10.0 ** dp
    xs = d2 * scale
    out = np.floor(xs + 0.5) / scale
    frac = xs - np.floor(xs)
    sus = np.abs(frac - 0.5) <= np.maximum(1e-9, xs * 1e-12)
    if sus.any():
        quantum = Decimal(1).scaleb(-dp)
        flat_in = d2.reshape(-1)
        flat_out = out.reshape(-1)
        for i in np.flatnonzero(sus.reshape(-1)):
            flat_out[i] = float(
                Decimal(repr(float(flat_in[i]))).quantize(
                    quantum, rounding=ROUND_HALF_UP
                )
            )
    return out


def _assign_clusters_arrow(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Large-k assignment, STRATEGY-INVARIANT with the Column path: the
    squared distance is accumulated as the same left-to-right fold over
    dimensions — ``acc += (x_j − c_j)²`` — that ``F.aggregate`` over the
    ``zip_with`` array performs, so every IEEE-754 operation (and hence
    every bit of the result) matches the constant-folded expression the
    DuckDB oracle replays. An earlier draft used the one-matmul GEMM
    identity ``‖x‖² − 2x·c + ‖c‖²``; its cancellation error survived
    the 6-dp round and flipped near-tie argmins at sf0.1 (1821 vs 1714
    SemDeDup survivors — SCALE.md's round-14 note), which made the
    engine's answer float-strategy-dependent. The per-dim fold is still
    one vectorized (batch × k) op per dimension inside an Arrow batch —
    dims·k·batch flops, the same asymptotics as the GEMM without BLAS
    dispatch — and np.argmin takes the first minimum, the same
    smallest-centroid-id tie-break as ``array_position``. The centroid
    matrix rides inside the UDF closure (k·dims doubles — model-sized,
    serialized once per task)."""
    import numpy as np
    import pandas as pd

    cids = np.asarray([c for c, _ in centroids], dtype=np.int64)
    cmat = np.asarray([v for _, v in centroids], dtype=np.float64)

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's inference can't resolve — pass the
    # return type explicitly instead.
    def _assign(vs):
        out = pd.DataFrame(
            {"cluster": pd.array([None] * len(vs), dtype="Int64"),
             "sq_dist": np.full(len(vs), np.nan)}
        )
        valid = vs.notna()
        if valid.any():
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in vs[valid]]
            )
            # Left fold over dims, exactly F.aggregate's order: each
            # term is (x−c) rounded, squared rounded, then added — the
            # same three IEEE-754 roundings per element as the JVM.
            # out= buffers reuse one (batch × k) temp instead of two
            # fresh allocations per dim — measured 1.6× on the 10×
            # shape (20k × 313 × 64), identical ops, bitwise-equal.
            d2 = np.zeros((x.shape[0], cmat.shape[0]))
            tmp = np.empty_like(d2)
            for j in range(cmat.shape[1]):
                np.subtract(x[:, j, None], cmat[None, :, j], out=tmp)
                np.multiply(tmp, tmp, out=tmp)
                np.add(d2, tmp, out=d2)
            d2 = _round_shortest_half_up(d2, ROUND_DP)
            idx = np.argmin(d2, axis=1)
            out.loc[valid, "cluster"] = cids[idx]
            out.loc[valid, "sq_dist"] = d2[np.arange(len(idx)), idx]
        out.loc[~valid, "sq_dist"] = None
        return out

    _assign = F.pandas_udf(_assign, "struct<cluster: long, sq_dist: double>")
    return df.withColumn("_a", _assign(F.col(vec_col))).select(
        "*", F.col("_a.cluster").alias("cluster"),
        F.col("_a.sq_dist").alias("sq_dist")
    ).drop("_a")


def kmeans(
    df: DataFrame,
    k: int | None = 8,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Deterministic Lloyd's k-means. Returns ``(assignment, centroids)``
    where assignment is ``df`` plus ``cluster`` / ``sq_dist`` columns for
    the FINAL centroids, and centroids is the refined driver-side list.

    ``k=None`` auto-scales with corpus size (:func:`auto_k` — one count
    action), holding expected cluster size constant so downstream
    per-cluster work (SemDeDup pairs) stays linear in the corpus.

    Iteration ``i`` = one map-only assignment under the current
    centroids + one (cluster, dim) partial-agg shuffle for the means;
    the k·dims centroid matrix is collected per round (model state).
    """
    from linz_bde_uploader_spark import caching
    from linz_bde_uploader_spark.functions.similarity import ivf_centroids

    # The loop re-reads ``df`` once per phase (count, seeding, one
    # assignment+means pass per iteration, final assignment): persist it
    # so the scan+decode runs once (r15 optimization pass, guide §5 —
    # the standard iterative-k-means input cache; Spark recomputes from
    # lineage if memory pressure evicts it).
    df = caching.track(df)
    if k is None:
        k = auto_k(df.count())
    cents = ivf_centroids(df, k=k, id_col=id_col, vec_col=vec_col)
    for _ in range(n_iters):
        assigned = assign_clusters(df, cents, id_col, vec_col)
        means = (
            assigned.select(
                F.col("cluster"), F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg(F.col("x").cast("double")), ROUND_DP).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .collect()
        )
        cents = sorted(
            (int(r["cluster"]), [float(p["m"]) for p in r["pm"]]) for r in means
        )
    return assign_clusters(df, cents, id_col, vec_col), cents


def semdedup_prune(
    df: DataFrame,
    threshold: float,
    k: int | None = None,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup: cluster, then drop every vector that has a more-canonical
    (smaller-id) near-duplicate in the SAME cluster — cosine rounded to
    4 dp at or above ``threshold``. Returns survivors with their cluster.

    The pair search is an equi-join on the cluster id, so the quadratic
    cost is per-cluster (SemDeDup's reason to exist); the duplicate set
    is a left-anti probe against the original. The default ``k=None``
    auto-scales cluster count with corpus size (:func:`auto_k`), holding
    cluster size — and therefore per-cluster pair volume — constant as
    the corpus grows; a FIXED k would make total pair volume quadratic
    in corpus size.
    """
    if centroids is None:
        assigned, centroids = kmeans(
            df, k=k, n_iters=n_iters, id_col=id_col, vec_col=vec_col
        )
    else:
        assigned = assign_clusters(df, centroids, id_col, vec_col)
    # The final assignment feeds THREE consumers (both sides of the pair
    # join and the survivor anti-join probe) — untracked, Catalyst
    # re-evaluated the whole assignment subtree (a pandas UDF above the
    # COLUMN_PATH_MAX_K cutoff) per consumer (r15 optimization pass,
    # guide §2.4/§5). The cached frame is id + cluster + sq_dist + the
    # vector — the same columns a single assignment pass emits.
    from linz_bde_uploader_spark import caching

    assigned = caching.track(assigned)
    a = assigned.select(
        F.col(id_col).alias("_a_id"), F.col("cluster"), F.col(vec_col).alias("_a_v")
    )
    b = assigned.select(
        F.col(id_col).alias("_b_id"), F.col("cluster"), F.col(vec_col).alias("_b_v")
    )
    # Arrow-batched pair cosine (same sequential-fold float semantics as
    # the Column `cosine`, proven oracle-parity by the near-dup verify
    # path): the pair stage is the dominant cost and Spark evaluates
    # higher-order-function lambdas interpreted — measured ~2x on the
    # sf0.1 pair volume.
    from linz_bde_uploader_spark.functions.similarity import pair_cosine_udf

    # dims from the (driver-side) centroid list — the previous
    # `assigned.select(vec_col).first()` was one extra Spark job per
    # call just to read a length the model state already carries.
    dims = len(centroids[0][1])
    cos_udf = pair_cosine_udf(dims)
    dups = (
        a.join(b, ["cluster"])
        .filter(F.col("_a_id") < F.col("_b_id"))
        .filter(F.round(cos_udf(F.col("_a_v"), F.col("_b_v")), 4) >= threshold)
        .select(F.col("_b_id").alias(id_col))
        .distinct()
    )
    return assigned.join(dups, [id_col], "left_anti").select(
        id_col, "cluster", "sq_dist"
    )


def d4_prototype_filter(
    df: DataFrame,
    threshold: float = 0.4,
    keep_frac: float = 0.75,
    k: int | None = None,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """D4 selection (Tirumala et al. 2023, "D4: Improving LLM
    Pretraining via Document De-Duplication and Diversification"):
    SemDeDup first (drop near-duplicates within each embedding
    cluster), then DIVERSIFY by dropping the most PROTOTYPICAL
    remaining points — the ones closest to their cluster centroid,
    which the paper shows are templated/low-value web text — keeping
    the ``ceil(keep_frac * m)`` FARTHEST points per cluster (ties on
    distance broken by ascending id: a total order, so selection is
    unique). Ranking uses the distance at the SAME 4-dp rounding the
    row displays, so the emitted audit row is self-consistent — the
    rank always follows from the visible fields.

    Emits every SemDeDup survivor with its audit row: ``(id, cluster,
    sq_dist 4dp, proto_rank, cluster_size, keep)`` — rank 1 = most
    diverse (farthest); an audit needs the margin on both sides of the
    cut, and the dropped-but-deduped band is exactly what a re-run
    with a different ``keep_frac`` would admit.

    Scale: everything rides the already-bounded SemDeDup chain
    (map-only assignment + per-cluster pair join, cluster size held
    constant by ``auto_k``); the prototype stage adds ONE window
    shuffle keyed by cluster id — same key, same cardinality as the
    dedup join, no new scale terms."""
    from pyspark.sql import Window  # noqa: PLC0415

    surv = semdedup_prune(
        df, threshold, k=k, n_iters=n_iters,
        id_col=id_col, vec_col=vec_col,
    )
    w = Window.partitionBy("cluster").orderBy(
        F.round("sq_dist", 4).desc(), F.col(id_col)
    )
    grp = Window.partitionBy("cluster")
    ranked = (
        surv.withColumn("_rn", F.row_number().over(w))
        .withColumn("_m", F.count(F.lit(1)).over(grp))
    )
    # Exact cut: ceil(keep_frac·m) via 6-dp scaled-INTEGER arithmetic
    # — a bare double product overshoots the documented ceil at exact
    # multiples of non-dyadic fractions (0.2·5 = 1.0000000000000002 →
    # ceil 2, not 1). m·num stays integral; an exact multiple of 1e6
    # divides exactly in double, and a non-multiple sits ≥ 1e-6 from
    # any integer, far beyond double epsilon — so the ceil is the
    # mathematical one for every 6-dp keep_frac.
    frac_num = round(float(keep_frac) * 1_000_000)
    cut = F.ceil(
        (F.col("_m") * F.lit(frac_num)) / F.lit(1_000_000.0)
    )
    return ranked.select(
        F.col(id_col),
        F.col("cluster").cast("long").alias("cluster"),
        F.round("sq_dist", 4).alias("sq_dist"),
        F.col("_rn").cast("long").alias("proto_rank"),
        F.col("_m").cast("long").alias("cluster_size"),
        (F.col("_rn") <= cut).cast("int").alias("keep"),
    )
