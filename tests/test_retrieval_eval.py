"""Round-6 session-3 retrieval/eval operators: RRF hybrid fusion
(tfidf.rrf_fuse / with_rank), the langid confusion-matrix audit
(text.langid_confusion), and the cross-source near-dup overlap matrix
(dedup.source_overlap_matrix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions import dedup as D
from linz_bde_uploader_spark.functions import text as X
from linz_bde_uploader_spark.functions import tfidf as TI


def test_with_rank_orders_and_breaks_ties_by_id(spark):
    df = spark.createDataFrame(
        [(3, 0.9), (1, 0.9), (2, 0.5)], ["doc_id", "score"]
    )
    got = {r.doc_id: r.rank for r in TI.with_rank(df, "score").collect()}
    assert got == {1: 1, 3: 2, 2: 3}  # tie at 0.9 -> lower id first


def test_rrf_fuse_exact_scores_and_null_ranks(spark):
    lex = spark.createDataFrame([(10, 1), (20, 2)], ["doc_id", "rank"])
    sem = spark.createDataFrame([(20, 1), (30, 2)], ["doc_id", "rank"])
    rows = {
        r.doc_id: r
        for r in TI.rrf_fuse(
            [("lex", lex), ("sem", sem)], k=60, top_n=10
        ).collect()
    }
    # doc 20 in both lists wins; 10 and 30 get a single term + NULL rank
    assert rows[20].rrf == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    assert rows[10].rrf == pytest.approx(1 / 61, abs=1e-6)
    assert rows[10].sem_rank is None
    assert rows[30].lex_rank is None
    ordered = sorted(rows.values(), key=lambda r: (-r.rrf, r.doc_id))
    assert [r.doc_id for r in ordered] == [20, 10, 30]


def test_rrf_fuse_rejects_empty_input(spark):
    with pytest.raises(ValueError):
        TI.rrf_fuse([])


def test_langid_confusion_cells_and_fractions(spark):
    en = "the cat sat on the mat and the dog is in the house"
    zz = "zork blix quum vrex plon klag snee brum"
    df = spark.createDataFrame(
        [(1, en, "en"), (2, en, "en"), (3, zz, "en"),
         (4, zz, "zh"), (5, en, "zh")],
        ["doc_id", "text", "lang"],
    )
    got = {
        (r.lang, r.pred): (r.n_docs, r.frac_of_lang)
        for r in X.langid_confusion(df).collect()
    }
    assert got[("en", "en")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert got[("en", "other")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert got[("zh", "other")] == (1, pytest.approx(0.5, abs=1e-6))
    assert got[("zh", "en")] == (1, pytest.approx(0.5, abs=1e-6))


def test_source_overlap_matrix_matches_pair_aggregation(spark):
    # two mirrored feeds (same articles, tiny edits) + one disjoint feed
    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t, "feedA"))
        rows.append((100 + i, t + " extra", "feedB"))
    rows.append((200, "unrelated words entirely different corpus here now", "feedC"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    matrix = {
        (r.source_a, r.source_b): (r.n_pairs, r.mean_jaccard)
        for r in D.source_overlap_matrix(
            df, "doc_id", "text", "source", threshold=0.3
        ).collect()
    }
    # twin: aggregate the verified pairs directly
    pairs = D.candidate_jaccard_verify(
        df, "doc_id", "text", threshold=0.3
    ).collect()
    twin: dict[tuple[str, str], list[float]] = {}
    src = {r[0]: r[2] for r in rows}
    for p in pairs:
        key = tuple(sorted((src[p.id_a], src[p.id_b])))
        twin.setdefault(key, []).append(p.jaccard)
    assert set(matrix) == set(twin)
    for key, js in twin.items():
        n, mean = matrix[key]
        assert n == len(js)
        fixed = sum(round(j * 1_000_000) for j in js)
        assert mean == pytest.approx(
            round((fixed / 1_000_000.0) / len(js), 6), abs=1e-9
        )
    # the mirrored feeds must show up as a cross-source overlap cell
    assert ("feedA", "feedB") in matrix
    assert all("feedC" not in k for k in matrix)
