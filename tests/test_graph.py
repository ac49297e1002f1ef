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


@pytest.fixture(scope="module")
def dag(spark):
    # directed: 0->1, 0->2, 3->1 ; nodes 1 and 2 are DANGLING (no
    # out-edges) — the shape symmetrize-only PageRank cannot rank.
    return spark.createDataFrame(
        [(0, 1), (0, 2), (3, 1)], "src long, dst long"
    )


def test_dangling_conserves_rank_mass(dag):
    ranks = {
        r.node: r.rank for r in pagerank(dag, n_iters=6, dangling=True).collect()
    }
    assert set(ranks) == {0, 1, 2, 3}
    # the dangling-mass correction redistributes what would leak:
    # total mass stays ~1 (bounded rounding drift)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)
    # node 1 has two in-links, node 2 one -> 1 outranks 2
    assert ranks[1] > ranks[2]


def test_without_correction_directed_graph_leaks_mass(dag):
    # baseline sanity for the docstring's claim: dangling=False on the
    # same graph drops the supplier-parked mass each iteration (node set
    # also collapses to sources only)
    leaky = pagerank(
        dag.select("src", "dst").unionByName(
            dag.selectExpr("dst as src", "src as dst")
        ).distinct().join(  # restrict to a PURE directed view: src only
            dag.select("src").distinct(), "src", "left_semi"
        ),
        n_iters=4,
    )
    assert leaky.count() > 0  # runs; mass conservation NOT asserted


def test_dangling_matches_reference_recurrence(dag):
    # replay the exact recurrence driver-side (math only, no round()
    # boundary risk at these values — compare at 1e-9)
    edges = [(0, 1), (0, 2), (3, 1)]
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    d = 0.85
    rank = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(5):
        dm = round(sum(rank[v] for v in nodes if v not in out), 9)
        contrib = {}
        for s, t in edges:
            contrib[t] = contrib.get(t, 0.0) + rank[s] / out[s]
        contrib = {t: round(c, 9) for t, c in contrib.items()}
        base = (1 - d) / n
        rank = {
            v: round(base + d * (contrib.get(v, 0.0) + dm / n), 9)
            for v in nodes
        }
    got = {
        r.node: r.rank
        for r in pagerank(dag, n_iters=5, dangling=True).collect()
    }
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1e-6)


def test_dangling_partition_invariant(spark, dag):
    a = sorted(
        (r.node, r.rank)
        for r in pagerank(dag, n_iters=4, dangling=True).collect()
    )
    b = sorted(
        (r.node, r.rank)
        for r in pagerank(dag.repartition(7), n_iters=4, dangling=True).collect()
    )
    assert a == b
