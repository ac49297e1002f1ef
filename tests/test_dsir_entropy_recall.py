"""Round-6 session-3 operators: DSIR importance resampling
(functions/dsir.py), per-document token entropy (text.token_entropy),
and the ANN recall@k self-audit (similarity.ann_recall). Each is
pinned to an exact Python twin on a hand-built corpus; the DuckDB
oracle twins cover the sf-scale behavior."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions import dsir as DS
from linz_bde_uploader_spark.functions import similarity as S
from linz_bde_uploader_spark.functions import text as X
from linz_bde_uploader_spark.functions.text import HASH_MIX, HASH_MOD

DOCS = [
    # (id, text, lang): the 'en' rows share the 'alpha'/'beta' vocab;
    # the 'other' rows use disjoint tokens, so DSIR must up-weight
    # target-vocab docs. Tokens differ in first letter (token_value
    # hashes length + first char only).
    (1, "alpha beta alpha gamma", "en"),
    (2, "alpha beta beta", "en"),
    (3, "zulu xray zulu xray zulu", "other"),
    (4, "alpha beta gamma delta", "other"),
    (5, "quebec romeo sierra", "other"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def _tokval(t: str) -> int:
    return (len(t) * 17 + ord(t[0]) * 31) % HASH_MOD


def _dsir_twin(dim: int = DS.DSIR_DIM):
    """Serial twin of dsir_logratio + the Gumbel perturbation."""
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for doc_id, text, lang in DOCS:
        for t in text.split(" "):
            b = _tokval(t) % dim
            per_doc.setdefault(doc_id, []).append(b)
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    r_tot = sum(raw.values())
    t_tot = sum(tgt.values())
    lam = {
        b: round(
            (math.log((tgt.get(b, 0) + 1.0) / (t_tot + dim))
             - math.log((raw[b] + 1.0) / (r_tot + dim))) * 1_000_000
        )
        for b in raw
    }
    out = {}
    for doc_id, buckets in per_doc.items():
        s = sum(lam[b] for b in buckets)
        logw = round(s / 1_000_000.0, 6)
        u = ((doc_id % HASH_MOD) * HASH_MIX % HASH_MOD + 1) / (HASH_MOD + 1.0)
        score = round(logw + -math.log(-math.log(u)), 6)
        out[doc_id] = (len(buckets), logw, score)
    return out


def test_dsir_logratio_matches_serial_twin(spark, docs):
    got = {
        r.doc_id: (r.n_tokens, r.logw)
        for r in DS.dsir_logratio(docs, F.col("lang") == "en").collect()
    }
    twin = _dsir_twin()
    assert set(got) == set(twin)
    for doc_id, (n, logw, _score) in twin.items():
        assert got[doc_id] == (n, pytest.approx(logw, abs=1e-9)), doc_id


def test_dsir_target_docs_outweigh_disjoint_vocab(spark, docs):
    logw = {
        r.doc_id: r.logw
        for r in DS.dsir_logratio(docs, F.col("lang") == "en").collect()
    }
    # target-vocab docs (1, 2, and the target-looking 4) must carry more
    # importance mass per token than the disjoint-vocab docs (3, 5)
    assert min(logw[1], logw[2], logw[4]) > max(logw[3], logw[5])


def test_dsir_select_is_gumbel_topk_of_twin(spark, docs):
    rows = DS.dsir_select(docs, n=3, target=F.col("lang") == "en").collect()
    twin = _dsir_twin()
    expect = sorted(
        twin.items(), key=lambda kv: (-kv[1][2], kv[0])
    )[:3]
    assert [r.doc_id for r in rows] == [doc_id for doc_id, _ in expect]
    for r, (_doc_id, (_n, _logw, score)) in zip(rows, expect):
        assert r.score == pytest.approx(score, abs=1e-9)


def test_dsir_select_salt_changes_draw_not_weights(spark, docs):
    a = DS.dsir_select(docs, n=5, target=F.col("lang") == "en", salt=0)
    b = DS.dsir_select(docs, n=5, target=F.col("lang") == "en", salt=7)
    wa = {r.doc_id: r.logw for r in a.collect()}
    wb = {r.doc_id: r.logw for r in b.collect()}
    sa = {r.doc_id: r.score for r in a.collect()}
    sb = {r.doc_id: r.score for r in b.collect()}
    assert wa == wb          # the importance model is salt-free
    assert sa != sb          # the perturbation (and thus the draw) moves


def test_token_entropy_exact_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one distinct token -> H = 0
            (2, "a b c d"),          # uniform over 4 -> H = ln 4
            (3, "a a b"),            # 2/3, 1/3
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.entropy_nats, r.norm_entropy)
        for r in X.token_entropy(df).collect()
    }
    assert got[1] == (4, 1, 0.0, 0.0)
    assert got[2][0:2] == (4, 4)
    assert got[2][2] == pytest.approx(math.log(4), abs=1e-6)
    assert got[2][3] == pytest.approx(1.0, abs=1e-6)
    h3 = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert got[3][2] == pytest.approx(h3, abs=1e-6)
    assert got[3][3] == pytest.approx(h3 / math.log(2), abs=1e-6)


def test_token_entropy_flags_template_spam_tail(spark):
    rows = [(i, "lorem ipsum dolor sit amet " * 4) for i in range(5)]
    rows += [(10 + i, f"unique{i} mixed{i} words{i} vary{i}") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ne = {r.doc_id: r.norm_entropy for r in X.token_entropy(df).collect()}
    spam = [ne[i] for i in range(5)]
    fresh = [ne[10 + i] for i in range(5)]
    assert max(spam) < min(fresh)


def test_ann_recall_perfect_on_self(spark):
    # identical representations -> both methods must report recall 1.0
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.ann_recall(df, rows[0][1], k=5, out_dims=16, exclude_id=0)
    got = {r.method: (r.k, r.hits, r.recall) for r in out.collect()}
    assert set(got) == {"int8", "jl16"}
    assert got["int8"][0] == 5
    # int8 symmetric quantization of 64-dim vectors essentially
    # preserves the ranking at this scale
    assert got["int8"][2] >= 0.8
    for _m, (k, hits, recall) in got.items():
        assert 0 <= hits <= k
        assert recall == pytest.approx(hits / k, abs=1e-9)


def _dsir_bigram_twin(dim: int = DS.DSIR_DIM):
    """Serial twin of the ngram=2 feature path."""
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for doc_id, text, lang in DOCS:
        toks = text.split(" ")
        for p, c in zip(toks, toks[1:]):
            b = ((_tokval(p) * 31 + _tokval(c)) % HASH_MOD) % dim
            per_doc.setdefault(doc_id, []).append(b)
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    r_tot, t_tot = sum(raw.values()), sum(tgt.values())
    lam = {
        b: round(
            (math.log((tgt.get(b, 0) + 1.0) / (t_tot + dim))
             - math.log((raw[b] + 1.0) / (r_tot + dim))) * 1_000_000
        )
        for b in raw
    }
    return {
        doc_id: (len(bs), round(sum(lam[b] for b in bs) / 1_000_000.0, 6))
        for doc_id, bs in per_doc.items()
    }


def test_dsir_bigram_features_match_serial_twin(spark, docs):
    got = {
        r.doc_id: (r.n_tokens, r.logw)
        for r in DS.dsir_logratio(
            docs, F.col("lang") == "en", ngram=2
        ).collect()
    }
    twin = _dsir_bigram_twin()
    assert set(got) == set(twin)
    for doc_id, (nf, logw) in twin.items():
        assert got[doc_id] == (nf, pytest.approx(logw, abs=1e-9)), doc_id
    # bigram evidence separates target-vocab docs more sharply than the
    # shared-unigram doc 4 (its bigrams differ from docs 1-2's)
    assert got[1][1] > got[3][1] and got[2][1] > got[5][1]


def test_dsir_rejects_bad_ngram(spark, docs):
    with pytest.raises(ValueError):
        DS.dsir_logratio(docs, F.col("lang") == "en", ngram=3).collect()


def test_batch_ann_recall_matches_python_twin(spark):
    import random

    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(25)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qrows = [(i, v) for i, v in rows[:3]]
    q = spark.createDataFrame(qrows, ["q_id", "q_vec"])
    k = 5
    got = {
        r.q_id: (r.k, r.hits, r.recall)
        for r in S.batch_ann_recall(e, q, k=k).collect()
    }
    assert set(got) == {0, 1, 2}

    def topk(vecs, qv, qid):
        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = sum(x * x for x in a) ** 0.5
            nb = sum(x * x for x in b) ** 0.5
            return round(d / (na * nb), 6)

        scored = sorted(
            ((-cos(v, qv), i) for i, v in vecs if i != qid)
        )[:k]
        return {i for _, i in scored}

    quant = [(i, S.quantize_vector(v)) for i, v in rows]
    for qid, qv in qrows:
        exact = topk(rows, qv, qid)
        approx = topk(quant, S.quantize_vector(qv), qid)
        hits = len(exact & approx)
        assert got[qid] == (k, hits, round(hits / k, 6)), qid
    # identical 16-dim vectors under int8: recall should be high
    assert sum(h for _, h, _r in got.values()) >= 2 * k


def test_frozen_model_scores_match_batch_logratio(spark, docs):
    for ngram in (1, 2):
        lam = DS.logratio_model(docs, F.col("lang") == "en", ngram=ngram)
        assert len(lam) == DS.DSIR_DIM
        frozen = {
            r.doc_id: (r.n_tokens, r.logw)
            for r in DS.score_with_model(docs, lam, ngram=ngram).collect()
        }
        batch = {
            r.doc_id: (r.n_tokens, r.logw)
            for r in DS.dsir_logratio(
                docs, F.col("lang") == "en", ngram=ngram
            ).collect()
        }
        for doc_id, nt_lw in batch.items():
            assert frozen[doc_id] == nt_lw, (ngram, doc_id)


def test_score_with_model_unseen_and_empty_features(spark, docs):
    lam = DS.logratio_model(docs, F.col("lang") == "en")
    new = spark.createDataFrame(
        [(99, "november oscar papa"), (100, "alpha beta")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in DS.score_with_model(new, lam).collect()}
    # unseen-vocab doc still scores via the all-smoothing buckets —
    # exactly sum(lam[bucket]) (slightly POSITIVE here: T < R makes the
    # add-one smoothed unseen ratio favor the smaller target corpus)
    assert got[99].n_tokens == 3
    exp99 = round(
        sum(lam[_tokval(t) % DS.DSIR_DIM]
            for t in ("november", "oscar", "papa")) / 1_000_000.0, 6
    )
    assert got[99].logw == pytest.approx(exp99, abs=1e-9)
    exp100 = round(
        sum(lam[_tokval(t) % DS.DSIR_DIM] for t in ("alpha", "beta"))
        / 1_000_000.0, 6
    )
    assert got[100].logw == pytest.approx(exp100, abs=1e-9)
    # bigram scorer: one-token doc has zero features -> logw 0.0
    one = spark.createDataFrame([(7, "alpha")], ["doc_id", "text"])
    r = DS.score_with_model(one, lam, ngram=2).collect()[0]
    assert (r.n_tokens, r.logw) == (0, 0.0)
