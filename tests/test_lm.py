"""Bigram-LM perplexity gate (functions/lm.py) and cross-document
duplicated-shingle pruning (functions/dedup.py) — value-level tests
against hand-computed probabilities plus edge cases the sf-data oracle
sweep can't reach (short docs, unseen-bigram backoff, empty corpus
fragments)."""

import math

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions import lm as LM
from linz_bde_uploader_spark.functions.dedup import (
    duplicated_shingle_stats,
    prune_cross_duplicated,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b c"),
            (3, "x"),       # too short: no bigrams
            (4, ""),        # empty: no bigrams
        ],
        "doc_id long, text string",
    )


def test_doc_bigrams_short_docs_yield_nothing(docs):
    bi = LM.doc_bigrams(docs).collect()
    ids = {r.doc_id for r in bi}
    assert ids == {1, 2}
    d1 = sorted((r.prev, r.cur) for r in bi if r.doc_id == 1)
    assert d1 == [("a", "b"), ("a", "b"), ("b", "a")]


def test_train_bigram_lm_hand_computed(docs):
    lm = {(r.prev, r.cur): r for r in LM.train_bigram_lm(docs).collect()}
    # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1 ; vocab = {a,b,c}
    r = lm[("a", "b")]
    assert (r.pair_cnt, r.ctx_cnt, r.vocab_size) == (3, 3, 3)
    assert r.logp == pytest.approx(math.log(4 / 6))
    r = lm[("b", "c")]
    assert (r.pair_cnt, r.ctx_cnt) == (1, 2)
    assert r.logp == pytest.approx(math.log(2 / 5))


def test_score_documents_self_corpus(docs):
    model = LM.train_bigram_lm(docs)
    rows = {r.doc_id: r for r in LM.score_documents(docs, model).collect()}
    assert set(rows) == {1, 2}  # short/empty docs produce no score row
    # doc 2: bigrams (a,b) logp=ln(4/6), (b,c) logp=ln(2/5)
    ce = -(math.log(4 / 6) + math.log(2 / 5)) / 2
    assert rows[2].n_bigrams == 2
    assert rows[2].cross_entropy == pytest.approx(round(ce, 4))
    assert rows[2].perplexity == pytest.approx(round(math.exp(round(ce, 4)), 4))


def test_score_unseen_bigram_backoff(spark, docs):
    model = LM.train_bigram_lm(docs)
    other = spark.createDataFrame(
        [(10, "a z"), (11, "q z")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in LM.score_documents(other, model).collect()}
    # (a,z): context 'a' seen (ctx_cnt=3, V=3) -> ln(1/6)
    assert rows[10].cross_entropy == pytest.approx(round(-math.log(1 / 6), 4))
    # (q,z): context unseen -> ln(1/V) = ln(1/3)
    assert rows[11].cross_entropy == pytest.approx(round(-math.log(1 / 3), 4))


def test_perplexity_filter_keeps_low_tail(spark):
    d = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b a b a c"), (3, "z q")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in
            LM.perplexity_filter(d, max_perplexity=2.0).collect()}
    # doc 1 is the most predictable; doc 3's bigram is rare -> high ppl
    assert 1 in kept and 3 not in kept


def test_duplicated_shingle_stats_and_prune(spark):
    d = spark.createDataFrame(
        [
            # NOTE: token_value hashes (length, first char) — test words
            # must differ in first letter to be distinct features
            (1, "ab cd ef gh"),        # both shingles shared with doc 2
            (2, "ab cd ef gh"),        # exact dup of 1
            (3, "ij kl mn op qr"),     # unique
        ],
        "doc_id long, text string",
    )
    stats = {r.doc_id: r for r in duplicated_shingle_stats(d).collect()}
    assert stats[1].n_shingles == 2 and stats[1].dup_fraction == 1.0
    assert stats[3].dup_shingles == 0 and stats[3].dup_fraction == 0.0
    kept = {r.doc_id for r in prune_cross_duplicated(d, 0.5).collect()}
    assert kept == {3}


def test_dup_stats_within_doc_repeat_not_counted(spark):
    # a shingle repeated INSIDE one doc is not cross-document duplication
    d = spark.createDataFrame(
        [(1, "aa bb cc aa bb cc"), (2, "dd ee ff")],
        "doc_id long, text string",
    )
    stats = {r.doc_id: r for r in duplicated_shingle_stats(d).collect()}
    assert stats[1].dup_shingles == 0
    assert stats[2].dup_shingles == 0


def test_collocations_pmi_hand_computed(spark):
    # corpus engineered so ("new","york") is a strong collocation:
    # always adjacent, both words rare elsewhere
    rows = [(i, "new york is big and new york is old") for i in range(3)]
    rows += [(10 + i, "the cat is on the mat and the dog is old")
             for i in range(3)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    top = LM.collocations(d, min_count=6, k=5).collect()
    assert top[0].prev == "new" and top[0].cur == "york"
    # hand PMI: pair_cnt=6, prev_cnt(new)=6, cur_cnt(york)=6, total=54
    assert top[0].pair_cnt == 6
    assert top[0].pmi == pytest.approx(round(math.log(6 * 54 / (6 * 6)), 4))
    # min_count gates the noise pairs: only the three count-6 pairs pass
    assert len(top) == 3


def test_scrub_duplicated_spans(spark):
    from linz_bde_uploader_spark.functions.dedup import scrub_duplicated_spans

    d = spark.createDataFrame(
        [
            # "ab cd ef" is a shared 3-gram between docs 1 and 2;
            # the tails are unique (distinct first letters per token)
            (1, "ab cd ef gh ij"),
            (2, "ab cd ef kl mn"),
            (3, "op qr st uv wx"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           scrub_duplicated_spans(d, n=3, min_doc_freq=2).collect()}
    # positions 1-3 scrubbed in docs 1 and 2; tails survive
    assert out[1].n_removed == 3 and out[1].clean_text == "gh ij"
    assert out[2].n_removed == 3 and out[2].clean_text == "kl mn"
    assert out[3].n_removed == 0 and out[3].clean_text == "op qr st uv wx"


def test_scrub_spans_within_doc_repeat_survives(spark):
    from linz_bde_uploader_spark.functions.dedup import scrub_duplicated_spans

    # a span repeated INSIDE one doc is not cross-document boilerplate
    d = spark.createDataFrame(
        [(1, "aa bb cc aa bb cc"), (2, "dd ee ff gg hh ii")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           scrub_duplicated_spans(d, n=3, min_doc_freq=2).collect()}
    assert out[1].n_removed == 0
    assert out[2].n_removed == 0


def test_kn_model_hand_computed(docs):
    """Corpus bigrams: (a,b)x3 (docs 1+2), (b,a)x1, (b,c)x1. T=3
    types, V=3. Hand-check p(b|a) and p(c|b) against the
    interpolated-KN formula."""
    m = {(r.prev, r.cur): r for r in LM.train_kn_bigram_lm(docs).collect()}
    ab = m[("a", "b")]
    assert (ab.pair_cnt, ab.ctx_cnt, ab.n1f, ab.n1b, ab.T, ab.V) == (
        3, 3, 1, 1, 3, 3)
    # p(b|a) = (3-.75)/3 + (.75*1/3)*((1+1)/(3+3))
    p_ab = (3 - 0.75) / 3 + (0.75 * 1 / 3) * ((1 + 1) / 6)
    assert ab.logp == pytest.approx(math.log(p_ab), abs=1e-12)
    bc = m[("b", "c")]
    assert (bc.pair_cnt, bc.ctx_cnt, bc.n1f, bc.n1b) == (1, 2, 2, 1)
    p_bc = (1 - 0.75) / 2 + (0.75 * 2 / 2) * ((1 + 1) / 6)
    assert bc.logp == pytest.approx(math.log(p_bc), abs=1e-12)


def test_kn_mass_sums_to_one_per_seen_context(spark):
    """Interpolated KN is a proper distribution over the vocabulary for
    every seen context — Σ_w p(w|v) = 1 when pcont uses the exact
    (unfloored) continuation ratio; with the +1/(T+V) floor the total
    exceeds 1 by exactly D·N1+(v,·)/c(v) · (V_extra mass). Verify the
    DISCOUNTED frequency part + interpolation weight add to 1 over
    seen continuations + reserved mass."""
    docs = spark.createDataFrame(
        [(1, "a b a c a b b a")], "doc_id long, text string"
    )
    m = [r for r in LM.train_kn_bigram_lm(docs).collect() if r.prev == "a"]
    cc = m[0].ctx_cnt
    freq_part = sum((r.pair_cnt - 0.75) / cc for r in m)
    reserved = 0.75 * m[0].n1f / cc
    assert freq_part + reserved == pytest.approx(1.0, abs=1e-12)


def test_kn_score_self_corpus_and_python_twin(docs):
    got = {r.doc_id: r for r in LM.kn_score_documents(docs).collect()}
    assert set(got) == {1, 2}
    # twin
    pairs = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    ctx = {"a": 3, "b": 2}
    n1f = {"a": 1, "b": 2}
    n1b = {"b": 1, "a": 1, "c": 1}
    T = V = 3

    def p(v, w):
        return max(pairs[(v, w)] - 0.75, 0) / ctx[v] + (
            0.75 * n1f[v] / ctx[v]
        ) * ((n1b[w] + 1) / (T + V))

    for did, bis in {1: [("a", "b"), ("b", "a"), ("a", "b")],
                     2: [("a", "b"), ("b", "c")]}.items():
        ce = -sum(math.log(p(v, w)) for v, w in bis) / len(bis)
        assert got[did].cross_entropy == pytest.approx(round(ce, 4), abs=5e-5)
        assert got[did].n_bigrams == len(bis)


def test_kn_backoff_ladder_out_of_corpus(spark, docs):
    """Foreign docs: unseen pair w/ seen context, unseen context, and a
    fully unseen word must all score finite (no NULL, no -inf)."""
    model = LM.train_kn_bigram_lm(docs)
    foreign = spark.createDataFrame(
        [(9, "a c"),    # seen context 'a', pair (a,c) unseen
         (10, "c a"),   # context 'c' never a prev
         (11, "q q")],  # word never seen at all
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           LM.kn_score_documents(foreign, model).collect()}
    assert set(got) == {9, 10, 11}
    for r in got.values():
        assert r.perplexity > 0 and math.isfinite(r.cross_entropy)
    # unseen pair, seen context: lam('a') * pcont('c')
    exp9 = -math.log((0.75 * 1 / 3) * ((1 + 1) / 6))
    assert got[9].cross_entropy == pytest.approx(round(exp9, 4), abs=5e-5)
    # unseen context: pcont('a') = (1+1)/6
    exp10 = -math.log((1 + 1) / 6)
    assert got[10].cross_entropy == pytest.approx(round(exp10, 4), abs=5e-5)
    # fully unseen word: floor 1/(T+V)
    exp11 = -math.log(1 / 6)
    assert got[11].cross_entropy == pytest.approx(round(exp11, 4), abs=5e-5)


def test_doc_trigrams_short_docs_yield_nothing(docs):
    tri = LM.doc_trigrams(docs).collect()
    ids = {r.doc_id for r in tri}
    assert ids == {1, 2}  # doc 3 ("x") and doc 4 ("") have < 3 tokens
    d1 = sorted((r.w1, r.w2, r.w3) for r in tri if r.doc_id == 1)
    assert d1 == [("a", "b", "a"), ("b", "a", "b")]


def test_trigram_score_hand_computed(docs):
    # corpus token stream: a b a b | a b c | x | '' (empty token from
    # the empty doc) -> T=9, V=5 {a,b,c,x,''}
    # bigram counts: ab:3 ba:1 bc:1 ; trigram counts: aba:1 bab:1 abc:1
    # doc 2 has ONE trigram (a,b,c):
    #   p = 0.6*(abc/ab) + 0.3*(bc/uni(b)) + 0.1*((uni(c)+1)/(T+V))
    #     = 0.6*(1/3) + 0.3*(1/3) + 0.1*(2/14)
    p = 0.6 * (1 / 3) + 0.3 * (1 / 3) + 0.1 * (2 / 14)
    rows = {r.doc_id: r for r in LM.trigram_score_documents(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[2].n_trigrams == 1
    assert rows[2].cross_entropy == pytest.approx(-math.log(p), abs=1e-4)
    assert rows[2].perplexity == pytest.approx(1 / p, abs=2e-3)


def test_trigram_unseen_backoff_is_finite(spark, docs):
    # score a document whose trigram/bigram contexts were never trained:
    # ML terms back off to 0, the add-one unigram floor keeps p > 0
    lm = LM.train_trigram_lm(docs)
    other = spark.createDataFrame(
        [(9, "q r s t")], "doc_id long, text string"
    )
    rows = LM.trigram_score_documents(other, lm=lm).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_trigrams == 2
    assert math.isfinite(r.cross_entropy) and r.cross_entropy > 0
    # exactly the unigram floor: p = 0.1 * (0+1)/(9+5) per trigram
    floor_p = 0.1 * (1 / 14)
    assert r.cross_entropy == pytest.approx(-math.log(floor_p), abs=1e-4)


def test_trigram_partition_invariant(spark, docs):
    a = sorted(
        (r.doc_id, r.cross_entropy)
        for r in LM.trigram_score_documents(docs).collect()
    )
    b = sorted(
        (r.doc_id, r.cross_entropy)
        for r in LM.trigram_score_documents(docs.repartition(5)).collect()
    )
    assert a == b


class TestPerplexityBuckets:
    """CCNet head/middle/tail bucketing + bucketed mixture plan."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # two strata; per-doc perplexities vary with repetitiveness.
        rows = []
        fills = ["a b c d e", "a a b b c", "a b a b a", "c d e a b",
                 "e d c b a", "a a a a b", "b c d e a", "d e a b c",
                 "a b c a b"]
        for i, t in enumerate(fills):
            rows.append((i, t, "en"))
        for i, t in enumerate(fills[:6]):
            rows.append((100 + i, t + " c", "de"))
        rows.append((999, "x", "en"))   # < 2 tokens: dropped
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_buckets_match_python_percent_rank(self, corpus):
        out = LM.perplexity_buckets(corpus).collect()
        assert all(r.doc_id != 999 for r in out)
        scores = {r.doc_id: r.perplexity for r in out}
        langs = {r.doc_id: r.lang for r in out}
        got = {r.doc_id: r.ppl_bucket for r in out}
        for lang in {"en", "de"}:
            ids = sorted((scores[i], i) for i in scores if langs[i] == lang)
            n = len(ids)
            for rank, (_, did) in enumerate(ids):
                pr = rank / (n - 1) if n > 1 else 0.0
                want = ("head" if pr < 1 / 3
                        else "middle" if pr < 2 / 3 else "tail")
                assert got[did] == want, (lang, did, pr)

    def test_mixture_plan_over_buckets(self, corpus):
        plan = LM.perplexity_mixture_plan(
            corpus, {"head": 0.5, "middle": 0.3, "tail": 0.2},
            budget_tokens=1000,
        ).orderBy("bucket").collect()
        assert [r.bucket for r in plan] == ["head", "middle", "tail"]
        # every bucket supplies rows here; plan arithmetic sanity
        for r in plan:
            assert r.n_docs > 0 and r.tokens > 0
            assert r.sample_fraction <= 1.0
            assert r.epochs >= 1
        targets = {r.bucket: r.target_tokens for r in plan}
        assert targets == {"head": 500, "middle": 300, "tail": 200}

    def test_unknown_weight_key_raises(self, corpus):
        with pytest.raises(ValueError, match="bucket labels"):
            LM.perplexity_mixture_plan(corpus, {"hd": 1.0}, 10)
