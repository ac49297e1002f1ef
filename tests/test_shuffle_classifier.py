"""Deterministic corpus shuffle (sampling.deterministic_shuffle) and the
hashed-feature linear quality classifier (text.quality_classifier) —
permutation/partition invariants and hand-checked scoring."""

import math

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.sampling import (
    deterministic_shuffle,
    shuffle_key,
    weighted_sample,
)
from linz_bde_uploader_spark.functions.text import (
    HASH_MIX,
    HASH_MOD,
    QC_DIM,
    quality_classifier,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 200).selectExpr("id AS doc_id")


def test_shuffle_covers_all_rows_contiguously(ids):
    out = deterministic_shuffle(ids, n_shards=8).collect()
    assert len(out) == 200
    assert {r.shard for r in out} <= set(range(8))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(len(positions)))


def test_shuffle_partition_and_rerun_invariant(ids):
    a = sorted(
        (r.doc_id, r.shard, r.pos_in_shard)
        for r in deterministic_shuffle(ids, n_shards=8).collect()
    )
    b = sorted(
        (r.doc_id, r.shard, r.pos_in_shard)
        for r in deterministic_shuffle(ids.repartition(13), n_shards=8).collect()
    )
    assert a == b


def test_shuffle_salt_is_fresh_permutation(ids):
    a = {r.doc_id: (r.shard, r.pos_in_shard)
         for r in deterministic_shuffle(ids, n_shards=8).collect()}
    b = {r.doc_id: (r.shard, r.pos_in_shard)
         for r in deterministic_shuffle(ids, n_shards=8, salt=1).collect()}
    assert a != b                       # order actually changed
    assert set(a) == set(b)             # same rows, different placement


def test_shuffle_key_matches_python(spark):
    rows = spark.createDataFrame(
        [(5,), (123456789,)], "doc_id long"
    ).select(shuffle_key("doc_id").alias("k")).collect()
    expect = [((i % HASH_MOD) * HASH_MIX) % HASH_MOD
              for i in (5, 123456789)]
    assert [r.k for r in rows] == expect


def test_weighted_sample_survives_extreme_ids(spark):
    # the es_key overflow fix: ids past ~3.47e9 (and negative ids) used
    # to overflow int64 in the pre-fix multiply, NULL the key, and
    # silently vanish from the sample
    df = spark.createDataFrame(
        [(4_000_000_000, 10.0), (-7, 10.0), (1, 10.0)],
        "doc_id long, w double",
    )
    got = weighted_sample(df, 3, "w").collect()
    assert {r.doc_id for r in got} == {4_000_000_000, -7, 1}
    assert all(r.skey is not None for r in got)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "ab cd ab"),
            (2, "zz"),
            (3, ""),
        ],
        "doc_id long, text string",
    )


def _py_weight(tok: str) -> float:
    tv = (len(tok) * 17 + (ord(tok[0]) if tok else 0) * 31) % HASH_MOD
    j = tv % QC_DIM
    return ((j + 1) * HASH_MIX % HASH_MOD) / HASH_MOD - 0.5


def test_classifier_matches_python_fold(docs):
    rows = {r.doc_id: r for r in quality_classifier(docs).collect()}
    for doc_id, text in [(1, "ab cd ab"), (2, "zz")]:
        toks = text.split(" ")
        s = sum(_py_weight(t) for t in toks)  # sequential fold
        logit = 0.0 + 4.0 * (s / len(toks))
        r = rows[doc_id]
        assert r.logit == pytest.approx(logit, abs=1e-6)
        assert r.prob == pytest.approx(1 / (1 + math.exp(-r.logit)), abs=1e-6)
        assert r.keep == (r.prob >= 0.5)
    # '' splits to [''] — still scored, n_tokens 1
    assert rows[3].n_tokens == 1


def test_classifier_is_map_only(docs):
    plan = (
        quality_classifier(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # zero shuffles
    assert "EvalPython" not in plan  # zero Python in the row path


def test_classifier_partition_invariant(docs):
    a = sorted((r.doc_id, r.prob) for r in quality_classifier(docs).collect())
    b = sorted(
        (r.doc_id, r.prob)
        for r in quality_classifier(docs.repartition(5)).collect()
    )
    assert a == b


class TestGroupedSamplingZipfIncremental:
    def test_weighted_sample_per_group_sizes_and_determinism(self, spark):
        from linz_bde_uploader_spark.functions.sampling import (
            weighted_sample_per_group,
        )

        df = spark.createDataFrame(
            [(i, "g" + str(i % 3), float(1 + i % 7)) for i in range(90)],
            "doc_id long, grp string, w double",
        )
        out = weighted_sample_per_group(df, 5, "w", "grp").collect()
        by_grp = {}
        for r in out:
            by_grp.setdefault(r.grp, set()).add(r.doc_id)
        assert all(len(v) == 5 for v in by_grp.values())
        assert set(by_grp) == {"g0", "g1", "g2"}
        again = {
            (r.grp, r.doc_id)
            for r in weighted_sample_per_group(df.repartition(7), 5, "w", "grp").collect()
        }
        assert {(r.grp, r.doc_id) for r in out} == again

    def test_zipf_slope_and_ranks(self, spark):
        from linz_bde_uploader_spark.functions.text import zipf_topk

        # freq(tok_i) proportional to 1/i -> slope ~ -1
        rows = []
        did = 0
        for i, tok in enumerate(["aa", "bb", "cc", "dd", "ee"], start=1):
            for _ in range(60 // i):
                rows.append((did, tok)); did += 1
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = zipf_topk(df, top_n=5).collect()
        assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
        assert out[0].zipf_slope == pytest.approx(-1.0, abs=0.1)
        assert len({r.zipf_slope for r in out}) == 1  # same slope every row

    def test_incremental_filter_drops_known_keeps_novel(self, spark):
        from linz_bde_uploader_spark.functions.dedup import (
            incremental_minhash_filter,
        )

        # 3-word shingles: docs need >= 3 tokens; the duplicate shares
        # all shingles with the index, the novel one shares none
        index = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                (10, "alpha beta gamma delta epsilon zeta"),  # exact dup
                (11, "qq ww ee rr tt yy"),                    # novel
            ],
            "doc_id long, text string",
        )
        kept = {r.doc_id for r in incremental_minhash_filter(new, index).collect()}
        assert kept == {11}

    def test_incremental_filter_empty_index_keeps_all(self, spark):
        from linz_bde_uploader_spark.functions.dedup import (
            incremental_minhash_filter,
        )

        index = spark.createDataFrame([], "doc_id long, text string")
        new = spark.createDataFrame(
            [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
        )
        kept = {r.doc_id for r in incremental_minhash_filter(new, index).collect()}
        assert kept == {1, 2}


class TestBM25:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "spark scan scan scan"),
                (2, "scan merge"),
                (3, "merge merge merge merge merge merge merge merge"),
                (4, "nothing relevant here at all"),
            ],
            "doc_id long, text string",
        )

    def test_bm25_relevance_ordering(self, spark, corpus):
        from linz_bde_uploader_spark.functions.tfidf import bm25_topk

        out = bm25_topk(corpus, ["scan"], k=10).collect()
        ids = [r.doc_id for r in out]
        assert ids[0] == 1          # highest tf wins
        assert set(ids) == {1, 2}   # zero-score docs filtered
        assert all(r.bm25 > 0 for r in out)

    def test_bm25_length_normalization(self, spark, corpus):
        from linz_bde_uploader_spark.functions.tfidf import bm25_topk

        # 'merge' appears once in the short doc 2 and 8x in the long doc
        # 3 — saturation + length norm keep doc 3 ahead but bounded
        out = {r.doc_id: r.bm25 for r in bm25_topk(corpus, ["merge"], k=10).collect()}
        assert out[3] > out[2]
        assert out[3] < out[2] * (1.2 + 1) / 1.2 * 8  # far below linear tf

    def test_bm25_multi_term_is_sum(self, spark, corpus):
        from linz_bde_uploader_spark.functions.tfidf import bm25_topk

        single = {r.doc_id: r.bm25 for r in bm25_topk(corpus, ["scan"], k=10).collect()}
        multi = {r.doc_id: r.bm25 for r in bm25_topk(corpus, ["scan", "merge"], k=10).collect()}
        # doc 2 matches both terms: its multi score exceeds either single
        assert multi[2] > single[2]

    def test_bm25_plan_single_bnlj_broadcast(self, spark, corpus):
        from linz_bde_uploader_spark.functions.tfidf import bm25_topk

        plan = (
            bm25_topk(corpus, ["scan"], k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "EvalPython" not in plan
        # the 1-row stats broadcast is the only join
        assert plan.count("BroadcastNestedLoopJoin") == 1


class TestNegativeSamples:
    def test_never_self_and_in_range(self, spark):
        from linz_bde_uploader_spark.functions.sampling import negative_samples

        df = spark.range(0, 50).selectExpr("id AS doc_id")
        out = negative_samples(df, k=5).collect()
        assert len(out) == 250
        for r in out:
            assert 0 <= r.neg_id < 50
            assert r.neg_id != r.doc_id

    def test_deterministic_and_salt_varies(self, spark):
        from linz_bde_uploader_spark.functions.sampling import negative_samples

        df = spark.range(0, 30).selectExpr("id AS doc_id")
        a = sorted((r.doc_id, r.j, r.neg_id)
                   for r in negative_samples(df, k=3).collect())
        b = sorted((r.doc_id, r.j, r.neg_id)
                   for r in negative_samples(df.repartition(7), k=3).collect())
        c = sorted((r.doc_id, r.j, r.neg_id)
                   for r in negative_samples(df, k=3, salt=9).collect())
        assert a == b
        assert a != c

    def test_requires_two_rows(self, spark):
        from linz_bde_uploader_spark.functions.sampling import negative_samples

        df = spark.range(0, 1).selectExpr("id AS doc_id")
        with pytest.raises(ValueError):
            negative_samples(df, k=2)


class TestKeepBestDatasheet:
    def test_keep_best_prefers_quality_then_id(self, spark):
        from linz_bde_uploader_spark.functions.dedup import (
            keep_best_per_cluster,
        )

        docs = spark.createDataFrame(
            [(1, 0), (2, 3), (3, 3), (9, 1)],  # 9 = singleton
            "doc_id long, q long",
        )
        comp = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "id long, component long"
        )
        out = {(r.doc_id, r.component) for r in
               keep_best_per_cluster(docs, comp, "q").collect()}
        # cluster 1: quality 3 tie between 2 and 3 -> lowest id 2 wins
        # (NOT the min-id member 1, whose quality is 0)
        assert out == {(2, 1), (9, 9)}

    def test_keep_best_all_singletons_identity(self, spark):
        from linz_bde_uploader_spark.functions.dedup import (
            keep_best_per_cluster,
        )

        docs = spark.createDataFrame(
            [(i, i % 4) for i in range(10)], "doc_id long, q long"
        )
        comp = spark.createDataFrame([], "id long, component long")
        out = keep_best_per_cluster(docs, comp, "q").collect()
        assert {r.doc_id for r in out} == set(range(10))
        assert all(r.component == r.doc_id for r in out)


class TestQualityCalibration:
    def test_bins_and_twin(self, spark):
        from linz_bde_uploader_spark.functions.text import (
            gopher_pass, quality_calibration, quality_classifier,
        )

        # mixed corpus: normal sentences (pass gopher) + junk (fail)
        rows = [(i, "the quick brown fox jumps over the lazy dog again "
                    + f"w{i} x{i}") for i in range(6)]
        rows += [(10 + i, "### ... ### ... ###") for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.bin: r for r in quality_calibration(df, n_bins=4).collect()}
        # twin from the public pieces
        q = quality_classifier(df, passthrough=("text",))
        probe = q.select(
            "doc_id", "prob",
            gopher_pass(F.col("text")).alias("gp"),
        ).collect()
        import collections
        twin = collections.defaultdict(list)
        for r in probe:
            b = min(3, int(r.prob * 4))
            twin[b].append(r)
        assert set(out) == set(twin)
        for b, rs in twin.items():
            assert out[b].n_docs == len(rs)
            assert out[b].mean_prob == pytest.approx(
                round(sum(round(r.prob * 1e6) for r in rs)
                      / (len(rs) * 1e6), 6), abs=1e-9)
            assert out[b].gopher_pass_frac == pytest.approx(
                round(sum(r.gp for r in rs) / len(rs) + 1e-12, 4), abs=1e-9)
        # total docs conserved across bins (no silent drops)
        assert sum(r.n_docs for r in out.values()) == 9

    def test_prob_one_clamps_into_last_bin(self, spark):
        from linz_bde_uploader_spark.functions.text import (
            quality_calibration,
        )

        df = spark.createDataFrame(
            [(1, "aa bb cc dd ee")], "doc_id long, text string"
        )
        rows = quality_calibration(df, n_bins=5).collect()
        assert all(0 <= r.bin <= 4 for r in rows)

    def test_rejects_bad_bins(self, spark):
        from linz_bde_uploader_spark.functions.text import (
            quality_calibration,
        )

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            quality_calibration(df, n_bins=0)


class TestCurriculumSchedule:
    def test_phases_by_exact_quartiles(self, spark):
        from linz_bde_uploader_spark.functions.sampling import (
            curriculum_schedule,
        )

        scores = spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "doc_id long, difficulty double"
        )
        out = {r.doc_id: r for r in
               curriculum_schedule(scores, n_phases=4, n_shards=2).collect()}
        # exact quartiles of 0..7: 1.75, 3.5, 5.25; boundary -> easier phase
        expect = {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3}
        assert {k: v.phase for k, v in out.items()} == expect

    def test_positions_dense_and_deterministic(self, spark):
        from linz_bde_uploader_spark.functions.sampling import (
            curriculum_schedule,
        )

        scores = spark.createDataFrame(
            [(i, float(i % 5)) for i in range(40)],
            "doc_id long, difficulty double",
        )
        a = curriculum_schedule(scores, n_phases=2, n_shards=4).collect()
        b = curriculum_schedule(
            scores.repartition(7), n_phases=2, n_shards=4
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # layout-proof
        import collections
        by = collections.defaultdict(list)
        for r in a:
            by[(r.phase, r.shard)].append(r.pos_in_shard)
        for pos in by.values():
            assert sorted(pos) == list(range(len(pos)))  # dense 0..n-1
        # fresh salt permutes within phases but keeps phase membership
        c = {r.doc_id: r.phase for r in
             curriculum_schedule(scores, n_phases=2, n_shards=4,
                                 salt=7).collect()}
        assert c == {r.doc_id: r.phase for r in a}

    def test_single_phase_no_boundaries(self, spark):
        from linz_bde_uploader_spark.functions.sampling import (
            curriculum_schedule,
        )

        scores = spark.createDataFrame(
            [(1, 9.0), (2, 1.0)], "doc_id long, difficulty double"
        )
        rows = curriculum_schedule(scores, n_phases=1, n_shards=1).collect()
        assert {r.phase for r in rows} == {0}
        with pytest.raises(ValueError):
            curriculum_schedule(scores, n_phases=0)
