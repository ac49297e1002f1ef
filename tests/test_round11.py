"""Round-11 births: the incremental ExactSubstr ingestion gate
(``dedup.incremental_exact_span_mass``) — the batch-vs-standing-corpus
face of the round-10 span family."""

from __future__ import annotations

from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.dedup import (
    incremental_exact_span_mass,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
            (2, "kilo lima mike november oscar papa quebec romeo sierra tango"),
        ],
        "doc_id long, text string",
    )


class TestIncrementalExactSpanMass:
    def test_copy_no_copy_and_multi_partner(self, spark):
        new = spark.createDataFrame(
            [
                # 7-token verbatim span of corpus doc 1
                (10, "xray alpha bravo charlie delta echo foxtrot golf yankee zulu"),
                # nothing shared
                (11, "uniform victor whiskey xray yankee zulu one two three four"),
                # 6-token spans of BOTH corpus docs, covering the whole doc
                (12, "alpha bravo charlie delta echo foxtrot kilo lima mike november oscar papa"),
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_spans, r.n_partners, r.covered_tokens,
                       r.max_span, r.copy_ratio)
            for r in incremental_exact_span_mass(new, _corpus(spark)).collect()
        }
        assert got[10] == (1, 1, 7, 7, 0.7)
        assert got[11] == (0, 0, 0, 0, 0.0)  # a row per arrival, zeros
        assert got[12] == (2, 2, 12, 6, 1.0)

    def test_overlapping_spans_never_double_count(self, spark):
        # two corpus docs share an 8-token run with the new doc at the
        # SAME new-doc positions: two spans, two partners, but the
        # covered mass counts each position once
        corpus = spark.createDataFrame(
            [
                (1, "alpha bravo charlie delta echo foxtrot golf hotel pad1 pad2"),
                (2, "zero alpha bravo charlie delta echo foxtrot golf hotel tail"),
            ],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(10, "alpha bravo charlie delta echo foxtrot golf hotel ending words")],
            "doc_id long, text string",
        )
        (r,) = incremental_exact_span_mass(new, corpus).collect()
        assert r.n_spans == 2 and r.n_partners == 2
        assert r.covered_tokens == 8 and r.max_span == 8
        assert r.copy_ratio == 0.8

    def test_below_min_span_is_no_copy(self, spark):
        new = spark.createDataFrame(
            # only 5 shared tokens < min_span_tokens=6
            [(10, "alpha bravo charlie delta echo nine eight seven six five")],
            "doc_id long, text string",
        )
        (r,) = incremental_exact_span_mass(new, _corpus(spark)).collect()
        assert (r.n_spans, r.covered_tokens) == (0, 0)
        # and the same text clears the gate at a lower threshold
        (r5,) = incremental_exact_span_mass(
            new, _corpus(spark), min_span_tokens=5
        ).collect()
        assert (r5.n_spans, r5.covered_tokens, r5.max_span) == (1, 5, 5)

    def test_token_level_verify_under_collisions(self, spark):
        # the genuine 6-token prefix is shared verbatim; every TAIL
        # token pairs with a token_value collision partner (same
        # length, same first char, different text) at the same
        # diagonal position — the hash pipeline alone would extend
        # the span across the colliding tail to the full 10 tokens;
        # the string verify must clamp it to the genuine 6-token run
        corpus = spark.createDataFrame(
            [(1, "alpha bravo charlie delta echo foxtrot golf hotel india jumble")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(10, "alpha bravo charlie delta echo foxtrot gulf hazel indus jubile")],
            "doc_id long, text string",
        )
        (r,) = incremental_exact_span_mass(new, corpus).collect()
        assert (r.n_spans, r.covered_tokens, r.max_span) == (1, 6, 6)

    def test_rarity_is_an_index_statistic(self, spark):
        # a shingle present in MORE than max_doc_freq index docs cannot
        # nominate: the boilerplate sentence below lives in 3 index
        # docs, so with max_doc_freq=2 the new doc matches nothing even
        # though the text is shared verbatim
        corpus = spark.createDataFrame(
            [
                (i, f"head{i} alpha bravo charlie delta echo foxtrot tail{i}")
                for i in range(1, 4)
            ],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(10, "alpha bravo charlie delta echo foxtrot more words here now")],
            "doc_id long, text string",
        )
        (r,) = incremental_exact_span_mass(
            new, corpus, max_doc_freq=2
        ).collect()
        assert r.n_spans == 0
        (r8,) = incremental_exact_span_mass(
            new, corpus, max_doc_freq=8
        ).collect()
        assert r8.n_spans == 3 and r8.n_partners == 3
        assert r8.covered_tokens == 6

    def test_deterministic(self, spark):
        new = spark.createDataFrame(
            [(10, "alpha bravo charlie delta echo foxtrot golf extra pad here")],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, incremental_exact_span_mass(new, _corpus(spark)).collect()))
        b = sorted(map(tuple, incremental_exact_span_mass(new, _corpus(spark)).collect()))
        assert a == b
