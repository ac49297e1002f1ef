"""Deterministic k-means + SemDeDup (functions/clustering.py) —
hand-checkable geometry, determinism across partition layouts, and the
cluster-locality property that bounds SemDeDup's quadratic term."""

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.clustering import (
    assign_clusters,
    kmeans,
    semdedup_prune,
)


@pytest.fixture(scope="module")
def vecs(spark):
    # two tight groups on the x-axis, ids 0/1 seed the two centroids
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [11.0, 0.0]),
        (4, [0.0, 1.0]),
        (5, [10.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_assign_clusters_nearest_and_tiebreak(spark, vecs):
    cents = [(0, [0.0, 0.0]), (1, [10.0, 0.0])]
    got = {r.vec_id: r.cluster for r in
           assign_clusters(vecs, cents).collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}
    # exact tie (point at x=5) goes to the smaller centroid id
    mid = spark.createDataFrame([(9, [5.0, 0.0])],
                                "vec_id long, embedding array<double>")
    assert assign_clusters(mid, cents).collect()[0].cluster == 0


def test_kmeans_converges_to_group_means(vecs):
    assigned, cents = kmeans(vecs, k=2, n_iters=2)
    cmap = dict(cents)
    # group means: (1/3, 1/3) and (31/3, 1/3), rounded to 6 dp
    assert cmap[0] == [round(1 / 3, 6), round(1 / 3, 6)]
    assert cmap[1] == [round(31 / 3, 6), round(1 / 3, 6)]
    by_cluster = {r.vec_id: r.cluster for r in assigned.collect()}
    assert {by_cluster[i] for i in (0, 2, 4)} == {0}
    assert {by_cluster[i] for i in (1, 3, 5)} == {1}


def test_kmeans_partition_invariant(spark, vecs):
    _, c_a = kmeans(vecs.repartition(1), k=2, n_iters=3)
    _, c_b = kmeans(vecs.repartition(7), k=2, n_iters=3)
    assert c_a == c_b


def test_kmeans_drops_empty_cluster(spark):
    # seed 1 starts ON seed 0's point-mass: every point is strictly
    # closer to (or tied with) centroid 0, so cluster 1 empties out
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.1, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = kmeans(df, k=2, n_iters=2)
    assert [cid for cid, _ in cents] == [0]
    assert {r.cluster for r in assigned.collect()} == {0}


def test_semdedup_prunes_within_cluster_only(spark):
    # 0 and 2 are near-identical (same direction); 1/3 far group; the
    # cross-group cosine is 0 so nothing is pruned across clusters
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [2.0, 0.0]),    # cosine 1.0 with vec 0 -> pruned (larger id)
        (3, [0.0, 3.0]),    # cosine 1.0 with vec 1 -> pruned
        (4, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    surv = {r.vec_id for r in
            semdedup_prune(df, 0.99, k=2, n_iters=1).collect()}
    assert 0 in surv and 1 in surv
    assert 2 not in surv and 3 not in surv


def test_arrow_path_matches_column_path(spark, vecs):
    # the large-k Arrow strategy must agree with the constant-folded
    # Column strategy on cluster AND rounded distance — bit-for-bit,
    # since round 15 made its fold order identical (the GEMM identity
    # it replaced flipped near-tie argmins at sf0.1)
    from linz_bde_uploader_spark.functions.clustering import (
        _assign_clusters_arrow,
    )

    cents = [(0, [0.0, 0.0]), (1, [10.0, 0.0])]
    a = {r.vec_id: (r.cluster, r.sq_dist)
         for r in assign_clusters(vecs, cents).collect()}
    g = {r.vec_id: (r.cluster, r.sq_dist)
         for r in _assign_clusters_arrow(vecs, cents, "vec_id", "embedding").collect()}
    assert a == g


def test_auto_k_targets_cluster_size():
    from linz_bde_uploader_spark.functions.clustering import auto_k

    assert auto_k(50) == 8        # oracle scales pin to min_k
    assert auto_k(500) == 8
    assert auto_k(2000) == 32     # sf0.1: k=32 > COLUMN_PATH_MAX_K=16 -> Arrow path
    assert auto_k(20000) == 313   # 10x study: Arrow path, ~64/cluster


def test_round_shortest_half_up_matches_spark_round(spark):
    # the Arrow path's rounding must be F.round's rule — HALF_UP on the
    # SHORTEST-decimal form — not floor(x*scale+0.5)/scale, which
    # disagrees exactly where the scaled binary value falls on the
    # other side of .5 than the decimal digits. The five values below
    # are found disagreements (seed-0 search over decimal half-ticks);
    # the fast path gets every one wrong, the correction pass must not.
    import numpy as np

    from linz_bde_uploader_spark.functions.clustering import (
        _round_shortest_half_up,
    )

    ticks = [521.7608895, 528.9846895, 133.0314225, 65.5894015,
             523.1974495]
    smooth = [0.0, 1e-12, 0.1234565, 2.5000005, 42.123456789, 0.9999995]
    vals = ticks + smooth
    ours = _round_shortest_half_up(np.asarray(vals), 6).tolist()
    theirs = [
        r[0]
        for r in spark.createDataFrame(
            [(v,) for v in vals], "x double"
        ).select(F.round("x", 6)).collect()
    ]
    assert ours == theirs
    # and the fast path alone really is wrong on the tick values —
    # the correction pass is load-bearing, not decorative
    fast = np.floor(np.asarray(ticks) * 1e6 + 0.5) / 1e6
    assert all(f != t for f, t in zip(fast.tolist(), theirs[:5]))
