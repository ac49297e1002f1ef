"""PageRank (functions/graph.py) — hand-checkable geometry, determinism
across partition layouts, rank-mass conservation."""

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.graph import pagerank, symmetrize


@pytest.fixture(scope="module")
def star(spark):
    # hub node 0 connected to leaves 1..4 (undirected star)
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    return symmetrize(edges)


def test_star_hub_outranks_leaves(star):
    ranks = {r.node: r.rank for r in pagerank(star, n_iters=6).collect()}
    assert set(ranks) == {0, 1, 2, 3, 4}
    hub, leaves = ranks[0], [ranks[i] for i in range(1, 5)]
    assert all(hub > l for l in leaves)
    assert len(set(leaves)) == 1  # symmetry: all leaves equal
    # rank mass ~1 (rounding drift bounded by iterations x nodes x 5e-10)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_partition_invariant(spark, star):
    a = sorted((r.node, r.rank) for r in pagerank(star, n_iters=4).collect())
    b = sorted(
        (r.node, r.rank)
        for r in pagerank(star.repartition(7), n_iters=4).collect()
    )
    assert a == b


def test_path_middle_outranks_ends(spark):
    # path 0-1-2: the middle node (degree 2) collects full mass from
    # both ends while ends each get half of the middle's -> 1 outranks
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    ranks = {r.node: r.rank for r in pagerank(symmetrize(e), n_iters=8).collect()}
    assert ranks[1] > ranks[0]
    assert ranks[0] == ranks[2]  # symmetry
