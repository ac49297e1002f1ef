"""Graph centrality for corpus curation — deterministic PageRank power
iteration. Web-scale pipelines rank domains/hosts by link centrality
(Common Crawl publishes harmonic/PageRank host rankings) and use the
score as a quality prior when sampling training data; the engine's
second iterative graph operator after connected-components dedup
(``dedup.duplicate_components``).

Determinism contract (what makes the trainer oracle-checkable and runs
reproducible): every per-node contribution sum and every new rank is
ROUNDED to 9 dp each iteration, so fold-order ulp differences between
engines re-synchronize instead of compounding; final output rounds to
6 dp. Assumes every node has outdegree >= 1 (true for symmetrized edge
sets — pass both directions; a dangling-mass correction would add one
scalar broadcast if ever needed).

Scale: each iteration is one join of the edge list with the (node,
rank) table — shuffle on the join key, partial-agg contribution sums —
plus an eager local checkpoint to keep the plan flat (the bpe_train /
components pattern). State is O(nodes); work is O(edges)/iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-iteration rounding (re-synchronizes engines); final output dp.
ITER_DP = 9
OUT_DP = 6


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Both directions of every edge, deduplicated — gives every
    endpoint an outdegree, so no dangling-node mass correction is
    needed."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def pagerank(
    edges: DataFrame,
    n_iters: int = 4,
    damping: float = 0.85,
    checkpoint_every: int = 2,
    dangling: bool = False,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list ``(src, dst)``.
    Returns ``(node, rank)`` with rank at 6 dp.

    rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) [+ DM/N]),
    all sums and ranks rounded to 9 dp per iteration (see module
    docstring).

    ``dangling=False`` (default) assumes every node has outdegree >= 1
    — true for symmetrized edge sets (:func:`symmetrize`). For a REAL
    directed graph (web/host link graphs, purchase graphs), pass
    ``dangling=True``: the node set becomes src ∪ dst, and each
    iteration redistributes the rank mass parked on dangling nodes
    (outdegree 0) uniformly — DM = Σ_{u: outdeg(u)=0} rank(u), one
    1-row scalar aggregate broadcast per iteration (the TF-IDF
    corpus-size pattern; compiles to the whitelisted one-row-BNLJ
    scalar-subquery shape). Without the correction a directed graph
    leaks the dangling mass and every rank is biased low.
    """
    from linz_bde_uploader_spark.caching import track

    # The edge list, node set and outdegrees are loop INVARIANTS read by
    # every iteration — persist them once (the components/LSH staging
    # pattern) or the upstream derivation (often a join) re-executes
    # n_iters+2 times.
    e = track(edges.select("src", "dst"))
    # Size the loop's partitioning to the measured edge count, like
    # duplicate_components: iterating a few-thousand-edge graph as 32
    # tasks x n_iters rounds is pure scheduler overhead, and at real
    # scale the computed target equals the existing partition count.
    n_edges = e.count()
    # coalesce() to a target >= the current partition count is a no-op,
    # so the RDD-plan-compiling getNumPartitions() probe (~0.15 s per
    # call, paid twice here before r15) is unnecessary: ask for the
    # edge-count-derived target unconditionally.
    e = e.coalesce(max(1, n_edges // 100_000 + 1))
    if dangling:
        nodes = track(
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        nodes = track(e.select(F.col("src").alias("node")).distinct())
    n = nodes.count()
    outdeg = track(e.groupBy("src").agg(F.count(F.lit(1)).alias("od")))
    base = (1.0 - damping) / n
    # F.round (half-away-from-zero, like SQL round) — NOT Python round()
    # (half-to-even), which would diverge from the oracle at boundaries
    # No initial checkpoint: rank 0 is one literal column over the
    # PERSISTED node set (lineage depth 1) — an eager localCheckpoint
    # here measured ~0.5 s of pure fixed write cost per call for a plan
    # the persisted parent already keeps flat.
    ranks = nodes.withColumn("rank", F.round(F.lit(1.0 / n), ITER_DP))
    checkpointed = []
    for it in range(n_iters):
        # Measured and kept as-is (round-15 optimization pass): a
        # per-node rank/od pre-join (one edge probe instead of two) was
        # tried and was ~0.5-1 s SLOWER per query at sf0.1 — both probe
        # sides broadcast here, so the fused double-probe is one codegen
        # stage while the pre-join added an extra join stage + broadcast
        # per iteration. Revisit only when the node table outgrows the
        # broadcast threshold.
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.round(F.sum(F.col("rank") / F.col("od")), ITER_DP).alias("s"))
        )
        new = nodes.join(contrib, "node", "left")
        extra = F.lit(0.0)
        if dangling:
            # DM = rank mass parked on outdegree-0 nodes this iteration:
            # a 1-row aggregate (anti-join against the outdegree table)
            # broadcast-cross-joined in — O(1) state, no driver action.
            dm = ranks.join(
                outdeg, ranks["node"] == outdeg["src"], "left_anti"
            ).agg(
                F.round(
                    F.coalesce(F.sum("rank"), F.lit(0.0)), ITER_DP
                ).alias("_dm")
            )
            new = new.crossJoin(F.broadcast(dm))
            extra = F.col("_dm") / F.lit(float(n))
        ranks = new.select(
            "node",
            F.round(
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("s"), F.lit(0.0)) + extra),
                ITER_DP,
            ).alias("rank"),
        )
        # Materialize every `checkpoint_every` rounds to keep the plan
        # from doubling per iteration. Default 2 since the round-16
        # reconciliation: the r15 default of 1 was chosen from an
        # isolated lap, but the r15 DRIVER lap regressed q_graph_pagerank
        # 5.99->6.79 s, and two interleaved same-session A/Bs at 32
        # cores (4+6 reps, min/median) confirm the driver:
        #   q_graph_pagerank           ckpt=1 6.60/7.97  ckpt=2 5.36/5.88
        #   q_graph_pagerank_directed  ckpt=1 4.94/5.77  ckpt=2 5.10/6.13
        # — every=2 clearly faster for the symmetrized graph, a wash for
        # the directed one (one default serves both). HITS keeps its own
        # every=1: its iteration is TWO half-steps, so an un-checkpointed
        # 2-iteration plan is 4 half-steps deep and its A/B went the
        # other way (ckpt=1 5.38/7.09 vs ckpt=2 7.58/8.68).
        # The LAST iteration is deliberately NOT
        # checkpointed: the caller's action materializes it anyway, and
        # the redundant eager write measured another ~1.4 s of pure
        # overhead per call. (A caller running MANY actions over the
        # result should persist it — recomputation is bounded by
        # `checkpoint_every` iterations from the last kept checkpoint,
        # which stays pinned for exactly this reason.)
        if (it + 1) % checkpoint_every == 0 and it != n_iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
            while checkpointed:
                checkpointed.pop().unpersist()
            checkpointed.append(ranks)
    return ranks.select("node", F.round("rank", OUT_DP).alias("rank"))


def hits(
    edges: DataFrame,
    n_iters: int = 4,
    checkpoint_every: int = 1,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed edge
    list ``(src, dst)`` — the graph family's second centrality face
    beside PageRank, and the natural one for BIPARTITE interaction
    graphs (visitor→host, buyer→seller, query→document clickthrough):
    a node is a good *authority* if good *hubs* point at it, and a
    good hub if it points at good authorities. PageRank on the same
    bipartite graph conflates the two roles into one score; HITS keeps
    them separate, which is what a crawl-seeding or source-procurement
    ranking actually wants (rank SELLERS by authority, not by the
    rank mass their buyers happen to hold).

    Power iteration with L1 (sum) normalization, the deterministic
    analog of the classical L2 step (the principal eigenvector is the
    same; only the scale of the reported score differs):

    - ``auth_raw(v) = Σ_{u→v} hub(u)``; ``auth = auth_raw / Σ auth_raw``
    - ``hub_raw(u) = Σ_{u→v} auth(v)``; ``hub = hub_raw / Σ hub_raw``

    Determinism contract (the module's PageRank discipline): every
    contribution sum, every normalization total, and every normalized
    score is rounded to ``ITER_DP`` = 9 dp per half-step, so
    fold-order ulps re-synchronize instead of compounding; final
    output rounds both scores to 6 dp. A node with no in-edges keeps
    ``auth = 0``; no out-edges keeps ``hub = 0`` (coalesced, never a
    dropped row).

    Scale: each iteration is two edge-list equi-joins (shuffle on the
    join key, partial-agg contribution sums) plus two ONE-ROW
    normalization-total aggregates broadcast-cross-joined in — the
    TF-IDF corpus-size scalar-subquery shape, O(1) state, no driver
    action. State is O(nodes); work is O(edges)/iteration; the same
    ``checkpoint_every`` plan-flattening as :func:`pagerank`.

    Returns ``(node, hub, auth)`` at 6 dp, one row per node in
    src ∪ dst.
    """
    from linz_bde_uploader_spark.caching import track

    if n_iters < 1:
        # The contribution-only half-step shape leaves `auth` unset
        # until the first iteration; fail loudly instead of with a
        # TypeError inside the final join.
        raise ValueError("hits() needs n_iters >= 1")
    # Loop invariants — persist once (the pagerank pattern).
    e = track(edges.select("src", "dst"))
    n_edges = e.count()
    # coalesce() to a target >= the current partition count is a no-op,
    # so the RDD-plan-compiling getNumPartitions() probe (~0.15 s per
    # call, paid twice here before r15) is unnecessary: ask for the
    # edge-count-derived target unconditionally.
    e = e.coalesce(max(1, n_edges // 100_000 + 1))
    nodes = track(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    hub = nodes.select(
        "node", F.round(F.lit(1.0 / n), ITER_DP).alias("hub")
    )
    auth = None
    checkpointed = []

    def _half_step(cur: DataFrame, from_col: str, on: str, out: str,
                   grp: str) -> DataFrame:
        # One HITS half-step: fold `from_col` across the edges grouped
        # by `grp` and L1-normalize via a ONE-ROW total broadcast. The
        # contribution table is track()-persisted because BOTH the
        # normalization total and the result read it — untracked, the
        # broadcast subtree re-evaluated the whole join+agg per
        # half-step and the duplication COMPOUNDED down the iteration
        # chain (measured 55 s → 18 s at sf0.1 for the 4-iteration
        # purchase graph).
        #
        # The result keeps ONLY nodes that received a contribution —
        # the round-15 optimization (guide §2.4, remove work from the
        # loop): the previous shape re-attached the untouched other
        # score with a nodes-left-join per half-step, carrying
        # zero-score rows through every iteration. A node absent here
        # has score exactly +0.0 (round(0/tot)), and absent rows
        # contribute nothing to the next half-step's edge join — the
        # same nothing a +0.0 term adds to an IEEE sum of non-negative
        # terms — and every edge endpoint on the joined side is by
        # construction present in its table, so every sum, total, and
        # rounded score is bit-for-bit unchanged; the zeros are
        # re-attached ONCE at the end. Halves the joins per half-step
        # and keeps the iterated plan flat.
        #
        # The mid-loop eager checkpoint stays load-bearing even with
        # the raws cached: an attempted checkpoint_every=4 run (no
        # mid-loop cut) did not finish a single sf0.1 lap in 6+ min —
        # the 16-join logical plan's OPTIMIZATION cost explodes even
        # when execution would reuse every cache.
        raw = track(
            e.join(cur.select(F.col("node").alias(on), from_col), on)
            .groupBy(F.col(grp).alias("node"))
            .agg(F.round(F.sum(from_col), ITER_DP).alias("_raw"))
        )
        tot = raw.agg(F.round(F.sum("_raw"), ITER_DP).alias("_tot"))
        return raw.crossJoin(F.broadcast(tot)).select(
            "node",
            F.round(F.col("_raw") / F.col("_tot"), ITER_DP).alias(out),
        )

    for it in range(n_iters):
        auth = _half_step(hub, "hub", "src", "auth", "dst")
        hub = _half_step(auth, "auth", "dst", "hub", "src")
        if (it + 1) % checkpoint_every == 0 and it != n_iters - 1:
            hub = hub.localCheckpoint(eager=True)
            while checkpointed:
                checkpointed.pop().unpersist()
            checkpointed.append(hub)
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.round(F.coalesce(F.col("hub"), F.lit(0.0)), OUT_DP).alias(
                "hub"
            ),
            F.round(F.coalesce(F.col("auth"), F.lit(0.0)), OUT_DP).alias(
                "auth"
            ),
        )
    )
