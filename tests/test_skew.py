"""Salting utilities: results must equal the unsalted equivalents while
spreading hot keys across salt values."""

from __future__ import annotations

from pyspark.sql import functions as F

from linz_bde_uploader_spark.operators.skew import (
    SALT_COL,
    salted_agg,
    salted_join,
    with_salt,
)


def _skewed(spark):
    # key=1 holds 90% of rows (the hot key), keys 2..10 one row each
    rows = [(1, i) for i in range(90)] + [(k, 1000 + k) for k in range(2, 11)]
    return spark.createDataFrame(rows, "k long, payload long")


def test_with_salt_spreads_hot_key(spark):
    df = with_salt(_skewed(spark), 8, from_cols=["payload"])
    hot = df.filter("k = 1").select(SALT_COL).distinct().count()
    assert hot >= 6  # the hot key occupies most salt buckets
    assert df.filter(f"{SALT_COL} < 0 OR {SALT_COL} >= 8").count() == 0


def test_salted_join_equals_plain_join(spark):
    large = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 8)], "k long, name string"
    )
    plain = {(r.k, r.payload, r.name)
             for r in large.join(small, "k").collect()}
    salted = {(r.k, r.payload, r.name)
              for r in salted_join(large, small, "k", n=8,
                                   salt_from=["payload"]).collect()}
    assert salted == plain and len(plain) == 96  # 90 hot + 6 dims 2..7


def test_salted_join_left_outer(spark):
    large = _skewed(spark)
    small = spark.createDataFrame([(1, "one")], "k long, name string")
    out = salted_join(large, small, "k", n=4, how="left",
                      salt_from=["payload"])
    got = {(r.k, r.name) for r in out.collect()}
    assert (1, "one") in got and (2, None) in got
    assert out.count() == 99


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k, r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"),
            F.min("payload").alias("mn"), F.max("payload").alias("mx"),
        ).collect()
    }
    salted = {
        (r.k, r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            df, ["k"],
            {"n": "count", "s": "sum:payload", "mn": "min:payload",
             "mx": "max:payload"},
            n=8, salt_from=["payload"],
        ).collect()
    }
    assert salted == plain
