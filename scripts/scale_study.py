"""Measured scaling study: replicate the sf0.1 fixtures K× and time
representative harness queries at both sizes on the same local[32]
session.

Replication is key-shifted so join cardinalities scale honestly:
orders/lineitem shift o_orderkey together (FK preserved; dimension
tables stay fixed, so per-customer fan-in grows K× — the realistic
shape), documents get a per-replica text suffix so near-dup operators
don't degenerate into K-way exact-duplicate cliques, events/embeddings
shift their ids.

The point is the RATIO column: a query whose wall grows ≤ K× on fixed
cores has no super-linear term (the thing `scripts/plan_audit.py`
promises structurally, verified here empirically). Scan-bound queries
grow far less than K× while local[32] still has idle headroom —
that headroom is exactly what more executors buy at a real 100-TB
scale-up.

Usage:
    python scripts/scale_study.py [--k 10] [--dst /tmp/scale10] [--skip-gen]
"""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

PICK = [
    "q_tpch_q1_pricing", "q_tpch_q18_bigorders", "q_tpch_q3_revenue_topk",
    "q_j3_classify", "q_j5_apply_changes", "q_win_sessionize",
    "q_tfidf_topk", "q_dedup_minhash_pairs", "q_dedup_components",
    "q_sim_cosine_topk", "q_pack_sequences", "q_event_hopping_window",
    # the ANN/embedding family — the most expensive queries in the bench,
    # so their 10× behavior must be measured, not asserted (round-5 add)
    "q_dedup_embed_cosine", "q_sim_lsh_bucketed", "q_mm_fingerprint_dedup",
    # round-5 births
    "q_bpe_merges", "q_skew_salted_join",
    # round-5 session-2 births: LM training+scoring, cross-doc shingle
    # stats, auto-k k-means and the SemDeDup pair join built on it
    # (auto_k holds cluster size constant — the property under test),
    # and the int8-quantized scorer
    "q_lm_perplexity", "q_dedup_crossdoc", "q_kmeans_embeddings",
    "q_semdedup", "q_sim_quantized_topk", "q_cms_heavy_hitters",
    "q_bpe_encode", "q_graph_pagerank", "q_weighted_sample",
    "q_lm_collocations", "q_dedup_scrub_spans",
    # round-6 births: the directed-graph correction, the trigram LM (3
    # n-gram count shuffles — the heaviest new training pass), the PQ
    # encode+ADC scan, the incremental minhash probe, the map-only
    # classifier, the window-sharded shuffle, and the composed funnel
    "q_graph_pagerank_directed", "q_lm_trigram_perplexity",
    "q_sim_pq_topk", "q_dedup_incremental", "q_quality_classifier",
    "q_corpus_shuffle", "q_pipeline_quality_funnel",
    # round-6 session-2 births: quality-aware cluster dedup (components
    # + window), BM25's filtered-tf pass, the chained-agg funnel, the
    # Zipf count+top-n, grouped ES sampling, and negative sampling
    "q_dedup_keep_best", "q_bm25_topk", "q_event_funnel",
    "q_corpus_zipf", "q_weighted_sample_per_group", "q_negative_samples",
    "q_passage_retrieval",
    # round-6 session-3 births: DSIR's two token passes + dim-row
    # broadcast model, the entropy double-agg, and the ANN recall audit
    # (three corpus scans + k-row semi-joins)
    "q_dsir_select", "q_text_entropy", "q_ann_recall",
    # round-6 session-3 births, second batch: RRF fusion (two rankers +
    # bounded join), the langid confusion agg, and the source-overlap
    # matrix (verified pair volume + two metadata joins)
    "q_hybrid_rrf", "q_text_langid_confusion", "q_source_overlap",
    # round-7 births: MIPS exact scan + augment invariant, the double
    # batch-kNN recall audit (two corpus scans x |Q| broadcast), the
    # bounded mixture/fertility/topic aggs, DSIR over bigram features
    # (one more zip-shift than unigram), paragraph-grain banded LSH
    # (rows x ~docs_tokens/32), and the URL canonicalize + host rollup
    "q_sim_mips_topk", "q_batch_ann_recall", "q_mixture_plan",
    "q_topic_classify", "q_token_fertility", "q_dsir_select_bigram",
    "q_dedup_paragraph", "q_host_datasheet",
    # round-7 session-2 births: winnowing's fp-keyed self-join (df cap
    # bounds per-key fanout) and the OOV broadcast-membership agg
    "q_dedup_winnow", "q_text_oov",
    # round-8 births: the blocked fuzzy matcher (dictionary-first, so
    # pair work scales with distinct names, not rows), containment's
    # rare-shingle inverted self-join, the robots broadcast gate, the
    # zonemap audit (two tiny-table replays + one min/max pass), KN's
    # two window passes over the pair table, the leakage audit riding
    # the banded pair pipeline, the bloom bit explode + broadcast bit
    # join, and growth accounting's two bounded aggs
    "q_fuzzy_join", "q_dedup_containment", "q_robots_gate",
    "q_layout_skipping", "q_lm_kneser_ney", "q_split_leakage",
    "q_bloom_filter_audit", "q_event_growth", "q_quality_calibration",
    "q_curriculum", "q_event_anomaly", "q_crawl_novelty", "q_dq_audit",
    "q_ann_ndcg",
    # round-9 births: the link-graph composite (href explode + canon +
    # host agg + 4 PR iterations — edge volume scales with text bytes),
    # its spam/anchor siblings over the same extraction chain, the
    # α-mixture plan (token agg + |sources|-row window math), the
    # histogram sketch whose EXACT guard carries the per-type sort the
    # sketch replaces at scale, and the O(|columns|) schema-drift audit
    "q_link_graph_rank", "q_link_spam", "q_anchor_text",
    "q_mixture_alpha", "q_quantile_sketch", "q_schema_drift",
    # the HLL audit: sketch side is a ≤ |types|·64-register agg; the
    # exact count(distinct) guard is the full (type, user) shuffle the
    # sketch exists to retire
    "q_hll_distinct",
    # round-10 births: cross-doc ExactSubstr spans (positional shingle
    # explode is linear in token volume; pair nomination is keyed on
    # df<=8 rare shingles; verification joins nominated pairs only, so
    # match volume tracks truly-shared content — which the replicated
    # fixture grows linearly), and the corpus-build e2e composite
    # (map-only/broadcast gates + the audited bounded dedup/decontam
    # operators + a 7×|docs| explode into a 9-key agg)
    "q_dedup_exact_spans", "q_corpus_build_e2e",
    # the ExactSubstr APPLY face: the spans chain + a span-bounded
    # position explode + the array_except rebuild
    "q_dedup_exact_scrub",
    # round-11 birth: the incremental ExactSubstr ingestion gate —
    # batch-side explode linear in batch tokens, rarity a standing-
    # corpus statistic, verify joins nominated batch×corpus pairs
    # only; like the rest of the span family its pair volume tracks
    # genuinely-shared content
    "q_dedup_exact_incr",
    # round-11 birth: the LSH band-planning datasheet — the banded
    # candidate join + exact verify reduced to one scalar row, plus a
    # 19-literal s-curve explode (constant cost at any corpus size)
    "q_lsh_band_plan",
    # round-11 birth: canonical-URL dedup — map-only regexp chain +
    # one window shuffle keyed by canonical URL
    "q_url_dedup",
    # round-11 birth: embedding-grain decontamination — one map-only
    # scan scoring each row against a FIXED-SIZE (<= 64) literal
    # benchmark (a corpus-fraction benchmark first measured 13.7x at
    # 10x — the q_batch_ann_recall bounded-sample lesson re-learned)
    "q_semantic_decontam",
    # round-11 birth: WET-style markup stripping — pure map-only
    # chained regexp_replace, linear in bytes
    "q_html_to_text",
    # round-11 birth: leakage-proof cluster-consistent split — pair
    # volume + a components loop over the pair graph only
    "q_cluster_split",
    # round-13 births: the multimodal corpus composite (map-only pair
    # synthesis + Arrow fingerprint UDF + two windows keyed by
    # canonical URL / fingerprint + id-keyed flag joins) and its
    # per-source card over the same frame
    "q_mm_corpus_e2e", "q_mm_corpus_card",
    # round-13 births: drop-reason provenance — a relabeling
    # projection / a ≤7-key rollup over the corpus-build level frame
    # (the frame itself is the measured q_corpus_build_e2e chain)
    "q_corpus_drop_reason", "q_corpus_drop_hist",
    # round-13 birth: per-source contamination datasheet — the
    # decontam span chain (already measured at 1.2-1.5×) + one
    # column-pruned id→source join + a |sources|-key rollup
    "q_decontam_source",
    # round-13 birth: D4 — the semdedup chain (cluster size held by
    # auto_k) + one prototype window on the same cluster key
    "q_d4_select",
    # round-13 birth: UniMax — one token-count agg shuffle + window
    # math over the bounded |sources| table
    "q_mixture_unimax",
    # round-14 birth: CCNet composite — the stratified bigram LM's
    # (lang, prev, cur) count + score joins (the lm family's measured
    # shape with the language prepended to every key), one
    # per-language percent_rank window, bounded |langs|-key rollups
    "q_ccnet_e2e",
    # round-14 birth: per-snapshot dedup ablation — ONE banded-LSH +
    # exact-Jaccard verified pair pass (the measured
    # q_corpus_build_e2e near-dup machinery) + two distinct
    # projections of the pair set + a 4-key rollup
    "q_dedup_snapshot_ablation",
    # round-14 birth: bitext margin mining — two broadcast-query kNN
    # corpus scans (the measured q_batch_ann_recall shape; |Q| fixed
    # by the mining shard, so wall tracks corpus bytes) + margin
    # arithmetic over the bounded |Q|·k pair table
    "q_bitext_margin",
    # round-14 birth: quality-threshold ablation — the calibration
    # bin machinery + token counts (map-only) + the broadcast 4-gram
    # decontam probe + one 10-key agg + <= 10-row retention windows
    "q_quality_ablation",
    # round-14 birth: DoReMi one-step EG — global + stratified bigram
    # LM train/score passes (count tables bounded by bigram vocab,
    # which the vocabulary-renamed fixture honestly grows 10x) + two
    # |sources|-key aggs + |sources|-window math
    "q_mixture_doremi",
    # round-14 birth: stage-ordering ablation — ONE verified pair
    # pass (the snapshot-ablation machinery) + the map-only/broadcast
    # URL gates + id-keyed flag joins + one 1-row agg
    "q_corpus_order_ablation",
    # round-14 birth: perplexity-pruning ablation — the measured
    # bigram LM train/score plan + one global ntile window + a 10-key
    # agg + <= 10-row retention windows
    "q_ppl_prune_ablation",
    # round-15 birth: mixture materialize — the measured unimax plan
    # (tracked |sources| frame) + a broadcast rate join + map-side
    # explode + one (source, epoch) agg + a bounded |sources| rollup
    "q_mixture_materialize",
    # round-15 birth: BPE vocab ablation — the measured bpe_train loop
    # (8 rounds instead of q_bpe_merges' 6) + ONE chained-replace
    # corpus scan aggregated to a single row + a 4-row explode
    "q_bpe_vocab_ablation",
    # round-15 birth: data-constrained planner — the measured unimax
    # plan + window-free |sources|-table law math (no second corpus
    # pass at all)
    "q_data_constrained_plan",
    # round-15 birth: threshold ablation — ONE banded-LSH +
    # exact-Jaccard verified pair pass (the measured snapshot-ablation
    # machinery) folded to doc grain + one id-equi join + one 1-row
    # agg exploded to five rows
    "q_dedup_threshold_ablation",
    # round-15 birth: ANN radius ablation — one (sig, cosine) corpus
    # scan + k-row TakeOrdered + broadcast flag join + one 1-row agg
    # exploded to four radius rows
    "q_ann_radius_ablation",
    # round-15 birth: Heaps vocab growth — one token explode + one
    # token-key agg (the zipf count shuffle with min-bucket riding
    # along) + two 1-row aggs merged shuffle-free
    "q_vocab_growth",
    # round-15 birth: training export — the tracked unimax plan +
    # materialize explode + the measured sharded applyInPandas packer
    # + two bounded rollups
    "q_training_export",
    # round-15 session-2 birth: HITS — per iteration two edge-list
    # equi-joins (the measured pagerank shape) + two ONE-ROW
    # normalization-total broadcasts; work O(edges)/iteration
    "q_graph_hits",
    # round-15 session-2 birth: RHO-select — the measured DoReMi
    # global+stratified LM train/score passes at doc grain + one
    # doc-key equi join + one rank window per source partition
    "q_rho_select",
    # round-15 session-2 birth: readability — pure map-only regexp
    # folds + two 2-dp double expressions; linear in bytes
    "q_text_readability",
    # round-15 session-2 birth: Chinchilla planner — ONE token-count
    # measurement agg + a one-row supply broadcast into the 6-row
    # budget table; law math is window-free constant work
    "q_chinchilla_plan",
    # round-15 session-2 birth: LM-order ablation — the three measured
    # scorer plans (count tables bounded by vocab/bigram/trigram type
    # counts) + a broadcast id semi-join + three 1-row aggs
    "q_lm_order_ablation",
    # round-15 session-2 birth: gate agreement — four map-only gate
    # flags in one scan folded to an 11-sum single-row agg + a 6-row
    # literal explode; linear in bytes, constant state
    "q_gate_agreement",
    # round-15 session-2 birth: SoftDeDup — one shuffle on the bounded
    # head-prefix key + a count/min window inside each duplicate
    # cluster (cluster sizes are the duplicate mass, never the corpus)
    "q_dedup_soft",
    # round-15 session-2 birth: n-gram-size decontam ablation — the
    # measured contamination_hits broadcast-probe plan with (n, gram)
    # keys: gram explode |ns|x the single-size rows, benchmark side
    # broadcast-bounded, |docs|- then |ns|-key rollups
    "q_decontam_ngram_ablation",
]


def generate(spark, dst: str, k: int) -> None:
    from pyspark.sql import functions as F

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)

    def rep(df, shifts, text_tag=None):
        parts = []
        for i in range(k):
            d = df
            for col, off in shifts.items():
                d = d.withColumn(col, F.col(col) + F.lit(i * off))
            if text_tag and i > 0:
                # Replicas must be DIFFERENT documents, not near-dups of
                # each other: a 10× corpus is 10× more pages, not 10
                # copies. Each replica VOCABULARY-RENAMES the original:
                # every token maps through md5 keyed by (token, replica),
                # truncated to the token's own length. A 1-1 word map
                # preserves the corpus's statistical shape — token
                # frequency distribution, doc lengths, and every true
                # near-dup pair WITHIN the replica — while sharing zero
                # vocabulary across replicas, so true pairs scale exactly
                # K×. (Partial-text fillers measured in round 5 all
                # failed: a shared 70% keeps cross-replica cosine ~0.85,
                # which the OR-of-ANDs LSH bands catch as candidates —
                # ~half the K² replica pairs enter the verify stage, and
                # wall grew 11× for 10× data from fixture structure, not
                # operator behavior.)
                d = d.withColumn(
                    text_tag,
                    F.expr(
                        f"concat_ws(' ', transform(split({text_tag}, ' '),"
                        f" t -> substr(md5(concat(t, 'v{i}')), 1,"
                        f" greatest(length(t), 1))))"
                    ),
                )
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    off_o = 1_000_000
    rep(spark.read.parquet(f"{SRC}/orders.parquet"),
        {"o_orderkey": off_o}).write.mode("overwrite").parquet(
        f"{dst}/orders.parquet")
    rep(spark.read.parquet(f"{SRC}/lineitem.parquet"),
        {"l_orderkey": off_o}).write.mode("overwrite").parquet(
        f"{dst}/lineitem.parquet")
    rep(spark.read.parquet(f"{SRC}/events.parquet"),
        {"event_id": 1_000_000}).write.mode("overwrite").parquet(
        f"{dst}/events.parquet")
    rep(spark.read.parquet(f"{SRC}/documents.parquet"),
        {"doc_id": 100_000}, text_tag="text").write.mode(
        "overwrite").parquet(f"{dst}/documents.parquet")
    rep(spark.read.parquet(f"{SRC}/embeddings.parquet"),
        {"vec_id": 100_000}).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--dst", default="/tmp/scale10")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--only", nargs="*", default=None,
                    help="retime just these PICK queries")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from linz_bde_uploader_spark import caching
    from linz_bde_uploader_spark.session import get_spark

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if not args.skip_gen:
        generate(spark, args.dst, args.k)

    qs = entry.queries()

    def med(name: str, sf_dir: str) -> float:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(time.monotonic() - t0)
            spark.catalog.clearCache()
            caching.release_intermediates()
        return statistics.median(runs)

    print(f"{'query':28s} {'sf0.1':>7s} {f'{args.k}x':>7s} {'ratio':>6s}")
    for name in (args.only if args.only else PICK):
        a = med(name, SRC)
        b = med(name, args.dst)
        print(f"{name:28s} {a:7.2f} {b:7.2f} {b / a:6.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
