"""Round-10 operators: cross-document ExactSubstr span dedup and the
end-to-end corpus-build composite."""

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.dedup import cross_doc_exact_spans

SHARED = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta " + SHARED + " gamma delta unique one zz"),
            (2, "intro words here " + SHARED + " totally other tail qq"),
            (3, "no overlap at all just singular prose forever and amen"),
            (4, "short doc"),
            # repeats the span twice -> two alignments vs docs 1 and 2
            (5, SHARED + " middle filler words " + SHARED),
        ],
        "doc_id long, text string",
    )


class TestCrossDocExactSpans:
    """dedup.py::cross_doc_exact_spans (Lee et al. 2022 ExactSubstr,
    bounded): maximal shared runs per alignment diagonal over
    rare-shingle-nominated pairs."""

    def test_maximal_spans_and_alignments(self, spark):
        got = sorted(
            (r.id_a, r.id_b, r.start_a, r.start_b, r.span_len, r.span_text)
            for r in cross_doc_exact_spans(_docs(spark)).collect()
        )
        # maximal: ONE 10-token span per alignment, never sub-spans;
        # doc 5's internal repeat -> one row per distinct alignment
        assert got == [
            (1, 2, 3, 4, 10, SHARED),
            (1, 5, 3, 1, 10, SHARED),
            (1, 5, 3, 14, 10, SHARED),
            (2, 5, 4, 1, 10, SHARED),
            (2, 5, 4, 14, 10, SHARED),
        ]

    def test_min_span_filter(self, spark):
        # raising the threshold above the shared length empties the set
        assert (
            cross_doc_exact_spans(_docs(spark), min_span_tokens=11).count()
            == 0
        )

    def test_span_len_clamped_to_doc_length(self, spark):
        # two identical 4-token docs: the padded short-doc shingle must
        # not overstate span_len past the documents' real length
        df = spark.createDataFrame(
            [(1, "aa bb cc dd"), (2, "aa bb cc dd")],
            "doc_id long, text string",
        )
        rows = cross_doc_exact_spans(
            df, min_span_tokens=4, min_shared=1
        ).collect()
        assert [(r.span_len, r.span_text) for r in rows] == [
            (4, "aa bb cc dd")
        ]

    def test_interrupted_span_splits_runs(self, spark):
        # one differing token inside an otherwise-shared region splits
        # the report into the two maximal sub-spans around it
        a = "k1 k2 k3 k4 k5 k6 XX m1 m2 m3 m4 m5 m6"
        b = "k1 k2 k3 k4 k5 k6 YY m1 m2 m3 m4 m5 m6"
        df = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"
        )
        got = sorted(
            (r.start_a, r.start_b, r.span_len)
            for r in cross_doc_exact_spans(
                df, min_span_tokens=6, min_shared=1
            ).collect()
        )
        assert got == [(1, 1, 6), (8, 8, 6)]

    def test_boilerplate_shingles_never_nominate(self, spark):
        # a shingle present in > max_doc_freq docs cannot key a pair:
        # 10 docs sharing ONLY a frequent fragment produce no rows at
        # max_doc_freq=8 (that mass is scrub_duplicated_spans' job)
        frag = "common boiler plate words here six"
        df = spark.createDataFrame(
            [(i, f"u{i}a u{i}b " + frag + f" u{i}c u{i}d") for i in range(10)],
            "doc_id long, text string",
        )
        assert cross_doc_exact_spans(df, min_span_tokens=6).count() == 0

    def test_deterministic(self, spark):
        d = _docs(spark)
        r1 = sorted(map(tuple, cross_doc_exact_spans(d).collect()))
        r2 = sorted(map(tuple, cross_doc_exact_spans(d).collect()))
        assert r1 == r2


class TestScrubCrossDocSpans:
    """dedup.py::scrub_cross_doc_spans — the ExactSubstr APPLY face:
    earliest occurrence survives, later occurrences scrub."""

    def test_keep_earliest_remove_later(self, spark):
        from linz_bde_uploader_spark.functions.dedup import (
            scrub_cross_doc_spans,
        )

        got = {
            r.doc_id: (r.n_removed, r.clean_text)
            for r in scrub_cross_doc_spans(_docs(spark)).collect()
        }
        # doc 1 (lowest id sharing the span) keeps it intact
        assert got[1] == (
            0, "alpha beta " + SHARED + " gamma delta unique one zz"
        )
        # doc 2 loses exactly the 10 shared tokens, prose intact
        assert got[2] == (10, "intro words here totally other tail qq")
        # doc 5 loses BOTH of its copies (each alignment covered)
        assert got[5] == (20, "middle filler words")
        # untouched docs scrub nothing
        assert got[3][0] == 0 and got[4][0] == 0

    def test_transitive_single_survivor(self, spark):
        # a < b < c sharing one span: only a's copy survives
        from linz_bde_uploader_spark.functions.dedup import (
            scrub_cross_doc_spans,
        )

        # filler tokens must differ in (length, first char) — the
        # token_value feature pair — or they hash-collide and the
        # spans legitimately extend over them
        df = spark.createDataFrame(
            [
                (1, "ax byy " + SHARED),
                (2, SHARED + " czzz dw"),
                (3, "eqqqq " + SHARED + " frrrrr"),
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.n_removed
            for r in scrub_cross_doc_spans(df).collect()
        }
        assert got == {1: 0, 2: 10, 3: 10}

    def test_fully_scrubbed_doc_is_empty_string(self, spark):
        # a doc that IS the span (later occurrence) scrubs to '' —
        # never NULL (driver-surface rule; the oracle coalesces the
        # DuckDB array_to_string([]) NULL to match)
        from linz_bde_uploader_spark.functions.dedup import (
            scrub_cross_doc_spans,
        )

        df = spark.createDataFrame(
            [(1, "pre1 pre2 " + SHARED), (2, SHARED)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_removed, r.clean_text)
            for r in scrub_cross_doc_spans(df, min_shared=1).collect()
        }
        assert got[2] == (10, "")
        assert got[1][0] == 0


class TestCorpusBuildE2E:
    """__spark_entry__.py::q_corpus_build_e2e — the whole-pipeline
    composite. These tests pin the INVARIANTS of the funnel (gate
    ordering, monotonicity, budget/packing consistency) over the real
    sf0.001 fixtures; per-stage values are pinned by the DuckDB
    oracle."""

    @pytest.fixture(scope="class")
    def funnel(self, spark, sf_dir):
        import __spark_entry__ as E

        rows = E.queries()["q_corpus_build_e2e"](spark, sf_dir).collect()
        return {r.stage: r for r in rows}

    def test_stage_roster_and_order(self, funnel):
        assert [funnel[s].stage_no for s in (
            "ingest", "blocklist", "robots", "quality", "exact_dedup",
            "near_dedup", "decontaminate", "alpha_mixture", "pack",
        )] == list(range(9))

    def test_doc_counts_monotone_through_gates(self, funnel):
        gates = ["ingest", "blocklist", "robots", "quality",
                 "exact_dedup", "near_dedup", "decontaminate"]
        counts = [funnel[s].n_docs for s in gates]
        assert counts == sorted(counts, reverse=True)
        assert counts[-1] > 0  # the funnel must not drain completely
        # every gate family must actually bite on the fixtures
        assert funnel["blocklist"].n_docs < funnel["ingest"].n_docs
        assert funnel["robots"].n_docs < funnel["blocklist"].n_docs
        assert funnel["quality"].n_docs < funnel["robots"].n_docs
        assert funnel["decontaminate"].n_docs < funnel["near_dedup"].n_docs

    def test_token_sums_track_docs(self, funnel):
        gates = ["ingest", "blocklist", "robots", "quality",
                 "exact_dedup", "near_dedup", "decontaminate"]
        toks = [funnel[s].n_tokens for s in gates]
        assert toks == sorted(toks, reverse=True)

    def test_alpha_budget_and_coverage(self, funnel):
        # the α plan covers exactly the decontaminated survivors, and
        # the fixed-point q renormalization lands the token budget
        # within |sources| rounding units of 100k
        assert funnel["alpha_mixture"].n_docs == (
            funnel["decontaminate"].n_docs
        )
        assert abs(funnel["alpha_mixture"].n_tokens - 100_000) <= 20

    def test_pack_conservation_and_capacity(self, funnel):
        # packing conserves survivor tokens (none exceed the 256 clamp
        # on these fixtures) and cannot beat the capacity bound
        assert funnel["pack"].n_tokens == funnel["decontaminate"].n_tokens
        min_packs = -(-funnel["pack"].n_tokens // 256)  # ceil
        assert funnel["pack"].n_docs >= min_packs
        assert funnel["pack"].n_docs <= funnel["decontaminate"].n_docs
