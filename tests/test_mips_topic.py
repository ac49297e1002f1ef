"""MIPS norm-augmentation reduction (similarity.mips_augment /
mips_topk) and the keyword-lexicon topic classifier
(text.topic_classify) — round-7-queue operators, pytest-covered ahead
of their rotation slots."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions import similarity as S
from linz_bde_uploader_spark.functions import text as X


@pytest.fixture(scope="module")
def vecs(spark):
    rng = random.Random(11)
    rows = []
    for i in range(40):
        scale = rng.uniform(0.2, 3.0)  # length carries signal -> MIPS
        rows.append(
            (i, [scale * rng.uniform(-1, 1) for _ in range(16)])
        )
    return rows, spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_mips_topk_matches_python_inner_product(spark, vecs):
    rows, df = vecs
    q = rows[0][1]
    got = [r.vec_id for r in S.mips_topk(df, q, k=5, exclude_id=0).collect()]
    twin = sorted(
        ((round(sum(a * b for a, b in zip(v, q)), 6), -i), i)
        for i, v in rows
        if i != 0
    )
    expect = [i for _, i in sorted(twin, key=lambda t: (-t[0][0], t[1]))][:5]
    assert got == expect


def test_augmented_cosine_order_equals_inner_product_order(spark, vecs):
    rows, df = vecs
    q = rows[0][1]
    m = S.corpus_max_norm(df)
    assert m > 0
    aug = S.mips_augment(df, m)
    # augmented norms are all exactly M (up to float dust)
    norms = aug.select(
        F.sqrt(S.dot(F.col("_aug"), F.col("_aug"))).alias("n")
    ).collect()
    assert all(r.n == pytest.approx(m, rel=1e-6) for r in norms)
    # cosine ranking against (q, 0) == inner-product ranking against q
    aq = [float(x) for x in q] + [0.0]
    cos_rank = [
        r.vec_id
        for r in S.cosine_topk(
            aug.select("vec_id", F.col("_aug").alias("embedding")),
            aq, k=10, exclude_id=0,
        ).collect()
    ]
    ip_rank = [
        r.vec_id for r in S.mips_topk(df, q, k=10, exclude_id=0).collect()
    ]
    assert cos_rank == ip_rank


def test_mips_augment_rejects_bad_max_norm(spark, vecs):
    _, df = vecs
    with pytest.raises(ValueError):
        S.mips_augment(df, 0.0)


def test_topic_classify_argmax_ties_and_floor(spark):
    df = spark.createDataFrame(
        [
            (1, "the query uses a table scan and an index"),   # data
            (2, "training a model on tokens and embedding vector"),  # ml
            (3, "click the link on the page"),                 # web
            (4, "table model"),                                # tie data/ml -> data
            (5, "nothing relevant whatsoever"),                # other
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.topic, r.hits) for r in X.topic_classify(df).collect()}
    assert got[1] == ("data", 4)
    assert got[2] == ("ml", 5)
    assert got[3] == ("web", 3)
    assert got[4] == ("data", 1)   # tie broken by topic name order
    assert got[5] == ("other", 0)


def test_topic_classify_custom_lexicon_and_floor(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha beta beta")],
        ["doc_id", "text"],
    )
    lex = {"a": ("alpha",), "b": ("beta",)}
    got = {
        r.doc_id: (r.topic, r.hits)
        for r in X.topic_classify(df, lexicon=lex, min_hits=2).collect()
    }
    assert got[1] == ("other", 1)  # below min_hits
    assert got[2] == ("a", 2)      # tie at 2 -> name order


def test_mixture_plan_budget_arithmetic(spark):
    from linz_bde_uploader_spark.functions.sampling import mixture_plan

    df = spark.createDataFrame(
        [
            # big: 3 docs x 4 tokens = 12 tokens
            (1, "a b c d", "big"), (2, "a b c d", "big"), (3, "a b c d", "big"),
            # small: 1 doc x 2 tokens
            (4, "a b", "small"),
            # unlisted: present in corpus, absent from weights
            (5, "x y z", "stray"),
        ],
        ["doc_id", "text", "source"],
    )
    plan = {
        r.source: r
        for r in mixture_plan(
            df, {"big": 1.0, "small": 1.0}, budget_tokens=12
        ).collect()
    }
    big, small, stray = plan["big"], plan["small"], plan["stray"]
    # 50/50 of 12 -> 6 tokens each
    assert (big.tokens, big.target_tokens) == (12, 6)
    assert big.sample_fraction == pytest.approx(0.5, abs=1e-9)
    assert big.epochs == 1
    # small supplies 2, needs 6 -> 3 epochs, fraction capped at 1
    assert (small.tokens, small.target_tokens) == (2, 6)
    assert small.sample_fraction == 1.0
    assert small.epochs == 3
    # unlisted source reported with zero plan, not dropped
    assert (stray.target_tokens, stray.sample_fraction, stray.epochs) == (0, 0.0, 0)


def test_split_leakage_audit_matches_python_twin(spark):
    """Near-dup pairs from identical-text clones; leakage counted under
    both split policies must equal the hash-twin computation."""
    from linz_bde_uploader_spark.functions.sampling import (
        split_leakage_audit,
    )

    HASH_MOD, HASH_MIX = 2147483647, 2654435761

    def bucket(i):
        return ((i % HASH_MOD) * HASH_MIX % HASH_MOD) % 100

    def split_of(i):
        b = bucket(i)
        return "train" if b < 90 else ("val" if b < 95 else "test")

    # clone pairs (identical text -> certain near-dup); unique docs use
    # distinct first letters (token_value hashes length+first char)
    t1 = " ".join(f"a{i}" for i in range(12))
    t2 = " ".join(f"b{i}" for i in range(12))
    t3 = " ".join(f"c{i}" for i in range(12))
    rows = []
    for base, (txt, grp_pair) in enumerate(
        [(t1, (0, 0)), (t2, (0, 1)), (t3, (2, 2))]
    ):
        ga, gb = grp_pair
        rows += [(100 * base + 1, txt, ga), (100 * base + 2, txt, gb)]
    # plus a unique singleton
    rows.append((999, " ".join(f"z{i}" for i in range(12)), 3))
    df = spark.createDataFrame(rows, "doc_id long, text string, grp long")

    got = {r.policy: r for r in
           split_leakage_audit(df, "grp", threshold=0.9).collect()}
    pair_ids = [(1, 2), (101, 102), (201, 202)]
    groups = {1: 0, 2: 0, 101: 0, 102: 1, 201: 2, 202: 2}
    xd = sum(split_of(a) != split_of(b) for a, b in pair_ids)
    xg = sum(
        split_of(groups[a]) != split_of(groups[b]) for a, b in pair_ids
    )
    assert got["doc_hash"].n_pairs == 3 == got["group_hash"].n_pairs
    assert got["doc_hash"].cross_pairs == xd
    assert got["group_hash"].cross_pairs == xg
    assert got["doc_hash"].leak_rate == round(xd / 3, 4)
    # same-group clone pairs can NEVER leak under the group policy
    same_group_pairs = [(a, b) for a, b in pair_ids if groups[a] == groups[b]]
    assert len(same_group_pairs) == 2 and xg <= 1


def test_split_leakage_audit_empty_pairset(spark):
    from linz_bde_uploader_spark.functions.sampling import (
        split_leakage_audit,
    )

    df = spark.createDataFrame(
        [(1, "aa bb cc dd", 0), (2, "ee ff gg hh", 1)],
        "doc_id long, text string, grp long",
    )
    got = {r.policy: r for r in
           split_leakage_audit(df, "grp", threshold=0.9).collect()}
    for r in got.values():
        assert (r.n_pairs, r.cross_pairs, r.leak_rate) == (0, 0, 0.0)


def test_mixture_plan_nonstring_group_col_reports_string_source(spark):
    # group_col of a non-string type must not silently coerce the output
    # schema through the seed-row union (r7 advice): source is always
    # reported as string.
    from linz_bde_uploader_spark.functions.sampling import mixture_plan

    df = spark.createDataFrame(
        [(1, "a b c d", 7), (2, "a b", 8)], ["doc_id", "text", "source"]
    )
    out = mixture_plan(df, {"7": 1.0}, budget_tokens=4, group_col="source")
    assert dict(out.dtypes)["source"] == "string"
    plan = {r.source: r for r in out.collect()}
    assert plan["7"].target_tokens == 4 and plan["8"].target_tokens == 0


def test_mixture_plan_reports_empty_weighted_source(spark):
    """A source named in weights but absent from the data must still emit
    a row (tokens=0, its target_tokens visible) — the inverse direction
    of the no-silent-caps rule (ADVICE r6)."""
    from linz_bde_uploader_spark.functions.sampling import mixture_plan

    df = spark.createDataFrame(
        [(1, "a b c d", "big")], ["doc_id", "text", "source"]
    )
    plan = {
        r.source: r
        for r in mixture_plan(
            df, {"big": 1.0, "ghost": 1.0}, budget_tokens=8
        ).collect()
    }
    ghost = plan["ghost"]
    assert (ghost.n_docs, ghost.tokens) == (0, 0)
    assert ghost.target_tokens == 4          # its budget share, visible
    assert (ghost.sample_fraction, ghost.epochs) == (0.0, 0)
    assert plan["big"].n_docs == 1           # seed rows don't inflate counts
    assert plan["big"].tokens == 4


def test_mixture_plan_rejects_bad_inputs(spark):
    from linz_bde_uploader_spark.functions.sampling import mixture_plan

    df = spark.createDataFrame([(1, "a", "s")], ["doc_id", "text", "source"])
    with pytest.raises(ValueError):
        mixture_plan(df, {"s": 1.0}, budget_tokens=0)
    with pytest.raises(ValueError):
        mixture_plan(df, {"s": -1.0}, budget_tokens=10)
    with pytest.raises(ValueError):
        mixture_plan(df, {"s": 0.0}, budget_tokens=10)
