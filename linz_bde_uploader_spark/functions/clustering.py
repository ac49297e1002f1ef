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

from linz_bde_uploader_spark.functions.similarity import cosine, dot

#: rounding applied to centroid coordinates and squared distances so
#: fold-order ulp differences between engines can't flip an argmin.
ROUND_DP = 6


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
    ``sq_dist`` (the rounded squared distance to it)."""
    vec = F.col(vec_col)
    dists = F.array(
        *[
            F.round(
                _sq_dist(vec, F.array(*[F.lit(float(x)) for x in cvec])), ROUND_DP
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
        F.element_at(cids, idx).alias("cluster"),
        F.element_at(F.col("_dists"), idx).alias("sq_dist"),
    ).drop("_dists")


def kmeans(
    df: DataFrame,
    k: int = 8,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Deterministic Lloyd's k-means. Returns ``(assignment, centroids)``
    where assignment is ``df`` plus ``cluster`` / ``sq_dist`` columns for
    the FINAL centroids, and centroids is the refined driver-side list.

    Iteration ``i`` = one map-only assignment under the current
    centroids + one (cluster, dim) partial-agg shuffle for the means;
    the k·dims centroid matrix is collected per round (model state).
    """
    from linz_bde_uploader_spark.functions.similarity import ivf_centroids

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
    k: int = 8,
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
    is a left-anti probe against the original.
    """
    if centroids is None:
        assigned, _ = kmeans(df, k=k, n_iters=n_iters, id_col=id_col, vec_col=vec_col)
    else:
        assigned = assign_clusters(df, centroids, id_col, vec_col)
    a = assigned.select(
        F.col(id_col).alias("_a_id"), F.col("cluster"), F.col(vec_col).alias("_a_v")
    )
    b = assigned.select(
        F.col(id_col).alias("_b_id"), F.col("cluster"), F.col(vec_col).alias("_b_v")
    )
    dups = (
        a.join(b, ["cluster"])
        .filter(F.col("_a_id") < F.col("_b_id"))
        .filter(F.round(cosine(F.col("_a_v"), F.col("_b_v")), 4) >= threshold)
        .select(F.col("_b_id").alias(id_col))
        .distinct()
    )
    return assigned.join(dups, [id_col], "left_anti").select(
        id_col, "cluster", "sq_dist"
    )
