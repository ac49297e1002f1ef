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


def test_deterministic_split_and_sample(spark):
    from linz_bde_uploader_spark.functions import sampling as SP

    df = spark.createDataFrame([(i,) for i in range(1000)], ["id"])
    split = SP.with_split(df, "id")
    counts = {r.split: r.n for r in split.groupBy("split").count()
              .withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # pure function of the id: recomputing gives identical assignment
    again = {r.id: r.split for r in SP.with_split(df, "id").collect()}
    first = {r.id: r.split for r in split.collect()}
    assert first == again
    # python recomputation matches the Column arithmetic
    for i in (0, 1, 7, 999):
        b = (i * 2654435761 % 2147483647) % 100
        expect = "train" if b < 90 else ("val" if b < 95 else "test")
        assert first[i] == expect, i

    # samples nest: 5% ⊂ 10%
    s5 = {r.id for r in SP.deterministic_sample(df, "id", 5).collect()}
    s10 = {r.id for r in SP.deterministic_sample(df, "id", 10).collect()}
    assert s5 <= s10 and len(s5) < len(s10)

    import pytest as _pt
    with _pt.raises(ValueError):
        SP.with_split(df, "id", {"train": 50, "val": 10})
    with _pt.raises(ValueError):
        SP.deterministic_sample(df, "id", 101)


def test_split_bucket_extreme_ids(spark):
    """Huge and negative ids must still land in a real bucket: the id is
    reduced mod 2^31-1 before the mix so the product never wraps 64 bits,
    and pmod keeps buckets non-negative — no NULL splits (r2 advice)."""
    from linz_bde_uploader_spark.functions import sampling as SP

    ids = [-5, -1, 0, 2**31, 10**15, 2**62, -(2**61)]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    rows = df.select("id", SP.split_bucket("id").alias("b")).collect()
    for r in rows:
        assert r.b is not None and 0 <= r.b < 100, r
        # python reference: same reduce-then-mix arithmetic
        expect = ((r.id % 2147483647) * 2654435761 % 2147483647) % 100
        assert r.b == expect, r
    split = SP.with_split(df, "id")
    assert all(r.split is not None for r in split.collect())
