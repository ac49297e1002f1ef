"""Round-15 session-2 births: HITS hubs/authorities (the bipartite
centrality face), RHO-loss doc-grain selection (the DoReMi excess-loss
signal with the D4 exact cut), the Flesch readability signals (engine-
rule 2-dp rounding), the Chinchilla compute-optimal planner (closed
form priced under the data-constrained repeat law), and the n-gram-size
decontamination ablation (one widened job, nested contaminated sets)."""

from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.graph import hits


@pytest.fixture(scope="module")
def bip(spark):
    # bipartite citation graph: hubs 1,2,3 -> authorities 0,4.
    # 0 is cited by all three hubs; 4 only by hub 3 — so 0 is the
    # stronger authority, and 3 (pointing at BOTH authorities) the
    # stronger hub.
    return spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (3, 4)], "src long, dst long"
    )


class TestHits:
    def test_bipartite_roles_and_ordering(self, bip):
        sc = {r.node: (r.hub, r.auth) for r in hits(bip, n_iters=4).collect()}
        assert set(sc) == {0, 1, 2, 3, 4}
        # pure roles: sources have auth 0, sinks have hub 0
        assert sc[0][0] == 0.0 and sc[4][0] == 0.0
        assert sc[1][1] == 0.0 and sc[2][1] == 0.0 and sc[3][1] == 0.0
        # authority ordering: 0 (cited by 3 hubs) > 4 (cited by 1)
        assert sc[0][1] > sc[4][1] > 0
        # hub ordering: 3 (points at both authorities) > 1 = 2
        assert sc[3][0] > sc[1][0] > 0
        assert sc[1][0] == sc[2][0]

    def test_l1_mass_and_partition_invariance(self, spark, bip):
        out = hits(bip, n_iters=4)
        hub_mass = sum(r.hub for r in out.collect())
        auth_mass = sum(r.auth for r in out.collect())
        # L1 normalization: each score vector sums to ~1 — drift is
        # bounded by |nodes| half-ticks of the 6-dp OUTPUT rounding
        # (observed: hub mass 0.999999 on the 3-hub fixture)
        assert hub_mass == pytest.approx(1.0, abs=5e-6)
        assert auth_mass == pytest.approx(1.0, abs=5e-6)
        a = sorted((r.node, r.hub, r.auth) for r in out.collect())
        b = sorted(
            (r.node, r.hub, r.auth)
            for r in hits(bip.repartition(7), n_iters=4).collect()
        )
        assert a == b

    def test_no_in_edge_auth_zero_not_dropped(self, spark):
        # chain 5 -> 6: 5 has no in-edges (auth 0), 6 no out (hub 0);
        # both rows still surface (the coalesce contract)
        e = spark.createDataFrame([(5, 6)], "src long, dst long")
        sc = {r.node: (r.hub, r.auth) for r in hits(e, n_iters=2).collect()}
        assert set(sc) == {5, 6}
        assert sc[5] == (1.0, 0.0)
        assert sc[6] == (0.0, 1.0)


class TestRhoSelect:
    def _docs(self, spark):
        # source 'a': repetitive in-domain bigrams the global model
        # dilutes (positive excess); source 'b': a different dialect.
        rows = []
        i = 0
        for src, texts in {
            "a": ["x y x y x y", "x y x y", "y x y x y", "x y y x", "x x y"],
            "b": ["p q p q p q", "q p q p", "p p q q"],
        }.items():
            for t in texts:
                rows.append((i, src, t))
                i += 1
        # a 1-token doc: outside the frame (the LM minimum-length gate)
        rows.append((99, "a", "x"))
        return spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )

    def test_cut_is_exact_ceiling_and_self_consistent(self, spark):
        from linz_bde_uploader_spark.functions.lm import rho_select

        out = rho_select(self._docs(spark), keep_num=1, keep_den=2).collect()
        assert 99 not in {r.doc_id for r in out}
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r)
        assert set(by_src) == {"a", "b"}
        for src, rows in by_src.items():
            n = len(rows)
            assert {r.n_src for r in rows} == {n}
            # rank is the total order (excess desc, id asc)
            expect = sorted(rows, key=lambda r: (-r.excess, r.doc_id))
            assert [r.doc_id for r in expect] == [
                r.doc_id for r in sorted(rows, key=lambda r: r.rnk)
            ]
            # keep = exact ceil(n/2) — both sides of the cut surface
            kept = [r for r in rows if r.keep == 1]
            assert len(kept) == (n + 1) // 2
            assert all(
                (r.keep == 1) == ((r.rnk - 1) * 2 < n) for r in rows
            )
        # odd-sized source exercises the ceiling boundary (5 -> 3)
        assert len([r for r in by_src["a"] if r.keep == 1]) == 3

    def test_excess_is_clamped_nonnegative(self, spark):
        from linz_bde_uploader_spark.functions.lm import rho_select

        out = rho_select(self._docs(spark)).collect()
        assert all(r.excess >= 0.0 for r in out)
        assert all(
            r.excess
            == round(max(round(r.ce_uniform - r.ce_domain, 10), 0.0), 4)
            for r in out
        )


def _engine_round(x: float, dp: int) -> float:
    """Spark F.round on doubles: HALF_UP on the shortest-decimal form."""
    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


class TestReadability:
    def _one(self, spark, text):
        from linz_bde_uploader_spark.functions.text import (
            readability_signals,
        )

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        m = readability_signals(F.col("text"))
        return df.select(
            *[m[k].alias(k) for k in (
                "n_words", "n_sentences", "n_syllables", "flesch",
                "fk_grade", "band",
            )]
        ).collect()[0]

    def test_hand_counts_and_formula(self, spark):
        r = self._one(spark, "the cat. it sat.")
        assert (r.n_words, r.n_sentences, r.n_syllables) == (4, 2, 4)
        raw_f = 206.835 - 1.015 * (4 / 2) - 84.6 * (4 / 4)
        raw_g = 0.39 * (4 / 2) + 11.8 * (4 / 4) - 15.59
        assert r.flesch == _engine_round(raw_f, 2)
        assert r.fk_grade == _engine_round(raw_g, 2)
        assert r.band == "very_easy"

    def test_vowel_runs_and_sentence_floor(self, spark):
        # no terminal punctuation -> sentence floor 1; 'queueing' is one
        # vowel-run-rich word (ueuei = 2 runs? no: u-e-u-e-i... all
        # contiguous 'ueuei' = ONE run), 'rhythm' has y = 1 run
        r = self._one(spark, "queueing rhythm")
        assert (r.n_words, r.n_sentences, r.n_syllables) == (2, 1, 2)

    def test_empty_doc_finite_never_null(self, spark):
        r = self._one(spark, "")
        assert (r.n_words, r.n_sentences, r.n_syllables) == (0, 1, 0)
        assert r.flesch == 206.84  # 206.835 rounds half-up at 2 dp
        assert r.band == "very_easy"
        assert r.fk_grade is not None

    def test_difficult_band(self, spark):
        # long unpunctuated polysyllabic text -> low flesch
        r = self._one(spark, " ".join(["onomatopoeia"] * 30))
        assert r.band == "very_difficult"


class TestChinchillaPlan:
    def _plan(self, spark):
        from linz_bde_uploader_spark.functions.sampling import (
            chinchilla_plan,
        )

        docs = spark.createDataFrame(
            [(i, "a", "t " * 999 + "t") for i in range(30)],
            "doc_id long, source string, text string",
        )  # 30 docs x 1000 tokens = 30_000 supply
        return {r.source: r for r in chinchilla_plan(docs).collect()}

    def test_closed_form_and_supply_pricing(self, spark):
        rows = self._plan(spark)
        assert set(rows) == {f"C1e{e}" for e in (9, 11, 13, 15, 17, 19)}
        for e in (9, 11, 13, 15, 17, 19):
            r = rows[f"C1e{e}"]
            assert r.tokens == 30_000 and r.n_docs == 30
            # N*.D* recovers the budget: N·D = (C/6)^(a+b) = C/6
            m = float(f"1e{e}") / 6.0
            assert r.n_params * r.alloc_tokens == pytest.approx(
                m, rel=1e-3
            )
        # fresh regime at 1e9 (D* ~ 24k < 30k supply)
        r9 = rows["C1e9"]
        assert r9.epochs <= 1.0 and r9.efficiency == 1.0
        assert r9.effective_tokens == r9.alloc_tokens
        # deep repeat regime at 1e19: effective tokens cap near
        # U·(1 + R*) and efficiency collapses
        r19 = rows["C1e19"]
        assert r19.repeats > 0
        assert r19.effective_tokens < r19.alloc_tokens
        assert r19.effective_tokens <= int(30_000 * (1 + 15.39)) + 1
        # the tokens-per-param rule of thumb drifts UP with budget
        tpp = [rows[f"C1e{e}"].tokens_per_param for e in (9, 13, 17, 19)]
        assert tpp == sorted(tpp)
        # ~20 tokens/param lands at the published-scale budget
        assert 15 < rows["C1e17"].tokens_per_param < 25

    def test_matches_decimal_reference(self, spark):
        from linz_bde_uploader_spark.functions.sampling import (
            CHIN_EXP_D,
            CHIN_EXP_N,
            CHIN_G,
        )

        rows = self._plan(spark)
        for e in (9, 13, 19):
            r = rows[f"C1e{e}"]
            m = float(f"1e{e}") / 6.0
            assert r.n_params == int(_engine_round(CHIN_G * m**CHIN_EXP_N, 0))
            assert r.alloc_tokens == int(
                _engine_round(m**CHIN_EXP_D / CHIN_G, 0)
            )
            epochs = _engine_round(r.alloc_tokens / max(r.tokens, 1), 4)
            assert r.epochs == epochs


class TestNgramOverlapAblation:
    def _split(self, spark):
        rows = [
            (0, "a b c d e f"),        # bench (id % 4 == 0 here)
            (4, "p q r s t u"),        # bench
            (1, "a b c d x y"),        # shares 4-gram with doc 0
            (2, "a b x c d y"),        # shares only 2-grams
            (3, "z z z z z z"),        # clean at every n
            (5, "p q r s t u"),        # verbatim dup of bench doc 4
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        return (
            d.filter(F.col("doc_id") % 4 != 0),
            d.filter(F.col("doc_id") % 4 == 0),
        )

    def test_nesting_and_hand_counts(self, spark):
        from linz_bde_uploader_spark.functions.decontaminate import (
            ngram_overlap_ablation,
        )

        corpus, bench = self._split(spark)
        out = {
            r.n: r
            for r in ngram_overlap_ablation(
                corpus, bench, ns=(2, 3, 4, 5)
            ).collect()
        }
        assert set(out) == {2, 3, 4, 5}
        assert all(r.corpus_docs == 4 for r in out.values())
        # contaminated sets nest downward in n
        counts = [out[n].contaminated_docs for n in (2, 3, 4, 5)]
        assert counts == sorted(counts, reverse=True)
        # hand truth: at n=5 only the verbatim dup survives the cut;
        # at n=2 docs 1, 2 and 5 all hit; doc 3 never does
        assert out[5].contaminated_docs == 1
        assert out[2].contaminated_docs == 3
        assert out[4].contaminated_docs == 2  # docs 1 and 5

    def test_arms_equal_independent_single_size_runs(self, spark):
        from linz_bde_uploader_spark.functions.decontaminate import (
            contamination_hits,
            ngram_overlap_ablation,
        )

        corpus, bench = self._split(spark)
        out = {
            r.n: r
            for r in ngram_overlap_ablation(
                corpus, bench, ns=(2, 3, 4, 5)
            ).collect()
        }
        for n in (2, 3, 4, 5):
            direct = contamination_hits(corpus, bench, n=n).collect()
            assert out[n].contaminated_docs == len(direct)
            assert out[n].total_hits == sum(r.n_hits for r in direct)

    def test_zero_hit_size_still_emits_row(self, spark):
        # n = 7 > every doc's 6 tokens: no n-grams exist on EITHER
        # side, yet the size still emits its zero row (n = 6 would
        # not be zero — doc 5 is a verbatim 6-token copy of bench 4)
        from linz_bde_uploader_spark.functions.decontaminate import (
            ngram_overlap_ablation,
        )

        corpus, bench = self._split(spark)
        out = {
            r.n: r
            for r in ngram_overlap_ablation(
                corpus, bench, ns=(7,)
            ).collect()
        }
        assert out[7].contaminated_docs == 0
        assert out[7].total_hits == 0
        assert out[7].mean_hits == 0.0
        assert out[7].bench_grams == 0
        assert out[7].corpus_docs == 4


class TestSoftDedup:
    def _docs(self, spark):
        head = "a b c d e f g h"          # shared 8-token head
        rows = [
            (1, "s1", head + " tail one"),
            (2, "s1", head + " tail two differs"),
            (3, "s2", head),               # exactly the head
            (4, "s2", "q r s t u v w x unique tail"),
            (5, "s1", "short doc"),        # < 8 tokens: its own cluster
        ]
        return spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )

    def test_cluster_weights_and_hard_baseline(self, spark):
        from linz_bde_uploader_spark.functions.dedup import soft_dedup

        out = {r.doc_id: r for r in soft_dedup(
            self._docs(spark), prefix_tokens=8
        ).collect()}
        assert set(out) == {1, 2, 3, 4, 5}  # every doc surfaces
        # docs 1-3 share the head prefix -> one cluster of 3
        for i in (1, 2, 3):
            assert out[i].dup_count == 3
            assert out[i].soft_weight == round(1 / 3, 6)
        assert out[4].dup_count == 1 and out[4].soft_weight == 1.0
        assert out[5].dup_count == 1
        # hard baseline: min-id keeper only
        assert [out[i].keep_hard for i in (1, 2, 3)] == [1, 0, 0]
        assert out[4].keep_hard == 1 and out[5].keep_hard == 1
        # effective tokens = n_tokens / cluster size at 4 dp
        assert out[3].n_tokens == 8
        assert out[3].effective_tokens == round(8 / 3, 4)

    def test_soft_mass_conserved_per_cluster(self, spark):
        # sum of soft weights over a cluster ~= 1 (each member 1/c):
        # the reweighting keeps total sampling mass equal to the hard
        # gate's, distributed instead of deleted
        from linz_bde_uploader_spark.functions.dedup import soft_dedup

        out = soft_dedup(self._docs(spark), prefix_tokens=8).collect()
        mass = sum(r.soft_weight for r in out)
        n_clusters = len({(r.dup_count, r.doc_id) for r in out
                          if r.keep_hard == 1})
        assert mass == pytest.approx(n_clusters, abs=1e-5)


class TestGateAgreement:
    def test_cells_consistent_and_kappa_formula(self, spark):
        from linz_bde_uploader_spark.functions.dq import gate_agreement

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = gate_agreement(d).collect()
        assert len(out) == 6
        assert [(r.gate_a, r.gate_b) for r in out] == [
            ("classifier", "gopher"), ("classifier", "langid"),
            ("classifier", "readability"), ("gopher", "langid"),
            ("gopher", "readability"), ("langid", "readability"),
        ]
        ns = {r.n for r in out}
        assert len(ns) == 1
        n = ns.pop()
        for r in out:
            assert r.n11 + r.n10 + r.n01 + r.n00 == n
            assert r.agree_frac == round((r.n11 + r.n00) / n, 4)
            na, nb = r.n11 + r.n10, r.n11 + r.n01
            e = na * nb + (n - na) * (n - nb)
            den = n * n - e
            expect = 0.0 if den == 0 else round(
                (n * (r.n11 + r.n00) - e) / den, 4
            )
            assert r.kappa == pytest.approx(expect, abs=1e-9)
        # the statistic discriminates on the fixtures: the two
        # stopword-driven heuristics agree far above chance, while at
        # least one pair sits at/below chance (base-rate agreement
        # that raw agree_frac would overstate)
        by = {(r.gate_a, r.gate_b): r for r in out}
        assert by[("gopher", "langid")].kappa > 0.5
        assert min(r.kappa for r in out) < 0.05

    def test_degenerate_pair_reports_zero(self, spark):
        from linz_bde_uploader_spark.functions.dq import gate_agreement

        # every doc passes langid and gopher identically and both are
        # CONSTANT (all pass): denominator 0 -> kappa 0.0, never NULL
        d = spark.createDataFrame(
            [(i, ("the of and to a in is it " * 4).strip())
             for i in range(6)],
            "doc_id long, text string",
        )
        out = {(r.gate_a, r.gate_b): r for r in gate_agreement(d).collect()}
        r = out[("gopher", "langid")]
        assert r.n11 == 6 and r.n00 == 0 and r.kappa == 0.0


class TestLmOrderAblation:
    def _docs(self, spark):
        rows = [
            (1, "x y z x y z x"),
            (2, "x y x y x y"),
            (3, "z z z z"),
            (4, "p q"),       # 2 tokens: outside the comparison set
            (5, "q"),         # 1 token: outside
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_comparison_set_and_gram_counts(self, spark):
        from linz_bde_uploader_spark.functions.lm import ngram_order_ablation

        out = {r.ord: r for r in ngram_order_ablation(
            self._docs(spark)
        ).collect()}
        assert sorted(out) == [1, 2, 3]
        # docs 4 and 5 are outside EVERY order's mean (comparison-set
        # discipline), even though orders 1-2 could score doc 4
        assert all(out[o].n_docs == 3 for o in (1, 2, 3))
        # n_grams over the common set: sum(n_tok - ord + 1)
        toks = {1: 7, 2: 6, 3: 4}
        for o in (1, 2, 3):
            assert out[o].n_grams == sum(t - o + 1 for t in toks.values())

    def test_means_match_scorers_verbatim(self, spark):
        from linz_bde_uploader_spark.functions.lm import (
            ngram_order_ablation,
            score_documents,
            train_bigram_lm,
            trigram_score_documents,
            unigram_score_documents,
        )

        docs = self._docs(spark)
        out = {r.ord: r for r in ngram_order_ablation(docs).collect()}
        common = {1, 2, 3}
        scored = {
            1: unigram_score_documents(docs).collect(),
            2: score_documents(docs, train_bigram_lm(docs)).collect(),
            3: trigram_score_documents(docs).collect(),
        }
        for o, rows in scored.items():
            ces = [r.cross_entropy for r in rows if r.doc_id in common]
            ppls = [r.perplexity for r in rows if r.doc_id in common]
            n = len(ces)
            want_ce = round(sum(round(c * 1e4) for c in ces) / (1e4 * n), 4)
            want_pp = round(sum(round(p * 1e4) for p in ppls) / (1e4 * n), 4)
            assert out[o].mean_ce == pytest.approx(want_ce, abs=1e-9)
            assert out[o].mean_ppl == pytest.approx(want_pp, abs=1e-9)

    def test_unigram_scorer_hand_check(self, spark):
        # corpus 'a a b': p(a) = (2+1)/(3+2), p(b) = (1+1)/(3+2)
        import math

        from linz_bde_uploader_spark.functions.lm import (
            unigram_score_documents,
        )

        d = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
        r = unigram_score_documents(d).collect()[0]
        want = round(-(2 * math.log(3 / 5) + math.log(2 / 5)) / 3, 4)
        assert r.n_grams == 3
        assert r.cross_entropy == pytest.approx(want, abs=1e-9)
