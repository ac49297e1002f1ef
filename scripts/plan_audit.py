"""Physical-plan scale audit over every harness query.

Compiles each ``queries()`` entry at the given sf_dir and scans the
executed plan for the operators that do not survive a 100× scale-up:

- ``CartesianProduct``            — all-pairs; O(n·m) shuffle-less blowup
- ``BroadcastNestedLoopJoin``     — per-row loop over a broadcast side;
                                    acceptable ONLY for deliberately tiny
                                    broadcast sides (whitelist below)
- ``BatchEvalPython``             — row-at-a-time Python UDF in the plan
                                    (Arrow/pandas UDFs show as
                                    ArrowEvalPython / FlatMapGroupsInPandas
                                    / MapInPandas and are fine)

Usage:
    python scripts/plan_audit.py [--sf-dir /root/testdata/sf0.001] [query ...]

Exit code 1 if any non-whitelisted smell is found.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMELLS = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

#: query → smells that are deliberate there (documented reasons)
WHITELIST: dict[str, tuple[str, ...]] = {
    # exact batch kNN scores every (vector, query) pair against a
    # BROADCAST query set (|Q| ≪ |N|): the non-equi join condition
    # (id != q_id) physically compiles to BroadcastNestedLoopJoin, but
    # the loop side is the tiny broadcast table — map-only over the big
    # side, which is the designed plan (similarity.py::batch_cosine_topk).
    "q_sim_batch_topk": ("BroadcastNestedLoopJoin",),
    # Query-set ANN recall runs batch_cosine_topk twice (exact + int8),
    # inheriting the same tiny-broadcast kNN shape: the non-equi
    # (id != q_id) join loops over the BROADCAST query set only —
    # map-only over the corpus side (similarity.py::batch_ann_recall).
    "q_batch_ann_recall": ("BroadcastNestedLoopJoin",),
    # Bitext margin mining runs batch_cosine_topk twice (forward k-NN
    # over the target corpus for the broadcast mining shard; backward
    # k-NN over the source corpus for the bounded |Q|·k candidate
    # set) — both loops are over the tiny broadcast query side,
    # map-only over the corpus sides (similarity.py::
    # bitext_margin_mine; the q_sim_batch_topk shape, twice).
    "q_bitext_margin": ("BroadcastNestedLoopJoin",),
    # TF-IDF folds the corpus size N into the plan as a broadcast of a
    # ONE-ROW global aggregate (tfidf.py::tfidf_topk) so the whole query
    # is a single job with no driver-side count() action. Catalyst
    # constant-folds the synthetic equi-key into a trivially-true
    # condition, so the join prints as BroadcastNestedLoopJoin — but the
    # "loop" side is one row: this is exactly the scalar-subquery
    # execution shape, map-only over the big side at any scale.
    "q_tfidf_topk": ("BroadcastNestedLoopJoin",),
    # The bigram LM folds the vocabulary size V into the plan the same
    # way TF-IDF folds N: a broadcast ONE-ROW aggregate cross-joined
    # into the counted-bigram table (lm.py::train_bigram_lm /
    # score_documents). One row on the loop side — map-only over the
    # big side, the scalar-subquery execution shape.
    "q_lm_perplexity": ("BroadcastNestedLoopJoin",),
    # Kneser-Ney inherits the same shape twice over: the T (bigram
    # types) and V (vocab) ONE-ROW aggregates broadcast into the pair
    # table, and the scorer's (T, V) row broadcast into the doc-bigram
    # stream (lm.py::train_kn_bigram_lm / kn_score_documents). Every
    # loop side is one row — map-only over the big side.
    "q_lm_kneser_ney": ("BroadcastNestedLoopJoin",),
    # The KN-difficulty curriculum composes kn_score_documents, so it
    # inherits the same one-row T/V broadcasts — nothing else in its
    # plan loops.
    "q_curriculum": ("BroadcastNestedLoopJoin",),
    # PMI collocations: the corpus bigram TOTAL is a broadcast ONE-ROW
    # aggregate cross-joined into the counted pair table (lm.py::
    # collocations) — the same scalar-subquery shape as TF-IDF's N and
    # the LM's V; map-only over the big side.
    "q_lm_collocations": ("BroadcastNestedLoopJoin",),
    # The trigram LM folds (total_tokens, vocab_size) into the scoring
    # join as a broadcast ONE-ROW aggregate (lm.py::
    # trigram_score_documents) — the identical scalar-subquery shape.
    "q_lm_trigram_perplexity": ("BroadcastNestedLoopJoin",),
    # The quality funnel composes the bigram LM's scorer, inheriting its
    # one-row V broadcast (the q_lm_perplexity shape, same plan node).
    "q_pipeline_quality_funnel": ("BroadcastNestedLoopJoin",),
    # BM25 folds (N, avgdl, per-term dfs) into the scoring pass as a
    # broadcast ONE-ROW aggregate (tfidf.py::bm25_topk) — the same
    # scalar-subquery shape as TF-IDF's N.
    "q_bm25_topk": ("BroadcastNestedLoopJoin",),
    # Passage retrieval composes chunking with bm25_topk, inheriting the
    # same one-row corpus-stats broadcast.
    "q_passage_retrieval": ("BroadcastNestedLoopJoin",),
    # RRF hybrid retrieval fuses the bm25_topk lexical ranking, again
    # inheriting its one-row corpus-stats broadcast (the fusion itself
    # is an equi full-outer join of two bounded top-k lists).
    "q_hybrid_rrf": ("BroadcastNestedLoopJoin",),
    # The CCNet perplexity-bucketed mixture composes the bigram LM's
    # scorer, inheriting its one-row V broadcast (the q_lm_perplexity
    # shape, same plan node).
    "q_mixture_perplexity": ("BroadcastNestedLoopJoin",),
    # DoReMi's uniform-reference loss composes the SAME global bigram
    # LM scorer, inheriting its one-row V broadcast (the
    # q_lm_perplexity shape; the stratified in-domain scorer uses a
    # keyed |domains|-row broadcast join, which compiles as a normal
    # BroadcastHashJoin).
    "q_mixture_doremi": ("BroadcastNestedLoopJoin",),
    # The perplexity-pruning ablation composes the same global bigram
    # LM scorer, inheriting its one-row V broadcast (the
    # q_lm_perplexity shape, same plan node).
    "q_ppl_prune_ablation": ("BroadcastNestedLoopJoin",),
    # RHO-select's uniform-reference loss composes the SAME global
    # bigram LM scorer, inheriting its one-row V broadcast (the
    # q_mixture_doremi shape — the stratified in-domain pass is a
    # keyed |domains|-row BroadcastHashJoin, which doesn't loop).
    "q_rho_select": ("BroadcastNestedLoopJoin",),
    # The LM-order ablation composes all three scorers, inheriting the
    # bigram's one-row V broadcast, the trigram's one-row (T, V)
    # totals broadcast, and the order-1 scorer's identical totals row
    # (lm.py::unigram_score_documents) — every loop side is one row.
    "q_lm_order_ablation": ("BroadcastNestedLoopJoin",),
    # The Chinchilla planner broadcasts the ONE-ROW measured-supply
    # aggregate into the |budgets| literal table (sampling.py::
    # chinchilla_plan) — the TF-IDF corpus-size scalar-subquery
    # shape; one row on the loop side, six on the other.
    "q_chinchilla_plan": ("BroadcastNestedLoopJoin",),
    # Directed PageRank's dangling-mass correction is a ONE-ROW rank
    # aggregate broadcast-cross-joined per iteration (graph.py::
    # pagerank(dangling=True)); it appears in the final plan now that
    # the last iteration is no longer eagerly checkpointed.
    "q_graph_pagerank_directed": ("BroadcastNestedLoopJoin",),
    # HITS' L1 normalization divides each half-step by a ONE-ROW total
    # aggregate broadcast-cross-joined in (graph.py::hits — two per
    # iteration, auth then hub): the same scalar-subquery shape as the
    # dangling-mass correction; one row on the loop side, map-only
    # over the node table at any scale.
    "q_graph_hits": ("BroadcastNestedLoopJoin",),
    # The link-graph composite ends in the same directed PageRank, so
    # it inherits the identical one-row dangling-mass broadcast per
    # iteration (graph.py::pagerank(dangling=True)) — nothing else in
    # the extraction chain (map-only regexps + one distinct) loops.
    "q_link_graph_rank": ("BroadcastNestedLoopJoin",),
}


def audit(spark, name, fn, sf_dir) -> list[str]:
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    allowed = WHITELIST.get(name, ())
    return [s for s in SMELLS if s in plan and s not in allowed]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from linz_bde_uploader_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    names = args.queries or list(qs)
    bad = 0
    for name in names:
        try:
            hits = audit(spark, name, qs[name], args.sf_dir)
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            print(f"{name:34s} ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        if hits:
            print(f"{name:34s} SMELL {', '.join(hits)}")
            bad += 1
        else:
            print(f"{name:34s} clean")
    print(f"\n{len(names) - bad}/{len(names)} clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
