"""Text-analysis Column functions (engine extensions; SURVEY §2.7 notes
the reference has no data-plane text functions)."""

from __future__ import annotations

import re

import pytest

from linz_bde_uploader_spark.functions import text as X


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "Hello, world! 123 test"),
            (2, "a b c"),
            (3, "don't stop-me now2x"),
        ],
        ["id", "text"],
    )


def test_bpe_ish_token_count_matches_python_regex(spark, df):
    got = {
        r.id: r.n for r in df.select(
            "id", X.bpe_ish_token_count("text").alias("n")
        ).collect()
    }
    pat = re.compile(X.BPE_ISH_PATTERN)
    for rid, txt in [(1, "Hello, world! 123 test"), (2, "a b c"),
                     (3, "don't stop-me now2x")]:
        assert got[rid] == len(pat.findall(txt)), txt
    # "Hello, world! 123 test" -> Hello , world ! 123 test = 6
    assert got[1] == 6
    # "don't stop-me now2x" -> don ' t stop - me now 2 x = 9
    assert got[3] == 9


def test_whitespace_vs_bpe_counts_differ_on_punctuation(spark, df):
    rows = df.select(
        X.token_count("text").alias("ws"),
        X.bpe_ish_token_count("text").alias("bpe"),
    ).collect()
    ws = [r.ws for r in rows]
    bpe = [r.bpe for r in rows]
    assert ws == [4, 3, 3]
    assert bpe == [6, 3, 9]
