"""SCD Type-2 history builder (operators/scd.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from linz_bde_uploader_spark.operators.scd import scd2_as_of, scd2_build


def _history(spark):
    changes = spark.createDataFrame(
        [
            # key, ts, change id, state
            (1, 100, 1, "bronze"),
            (1, 200, 2, "silver"),
            (1, 300, 3, "gold"),
            (2, 150, 4, "bronze"),
            # simultaneous changes for key 3 — tiebreak on change id
            (3, 100, 5, "a"),
            (3, 100, 6, "b"),
        ],
        ["k", "ts", "cid", "state"],
    )
    return scd2_build(changes, key="k", ts="ts", tiebreak="cid")


def test_scd2_validity_chain(spark):
    rows = {r.cid: r for r in _history(spark).collect()}
    assert (rows[1].valid_from, rows[1].valid_to, rows[1].is_current) == (100, 200, False)
    assert (rows[2].valid_from, rows[2].valid_to, rows[2].is_current) == (200, 300, False)
    assert (rows[3].valid_from, rows[3].valid_to, rows[3].is_current) == (300, None, True)
    assert (rows[4].valid_to, rows[4].is_current) == (None, True)


def test_scd2_tiebreak_is_deterministic(spark):
    rows = {r.cid: r for r in _history(spark).collect()}
    # equal timestamps: cid 5 closes at cid 6's ts (same instant), cid 6 open
    assert rows[5].valid_to == 100 and not rows[5].is_current
    assert rows[6].valid_to is None and rows[6].is_current


def test_scd2_exactly_one_current_per_key(spark):
    h = _history(spark)
    per_key = h.groupBy("k").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current")
    )
    assert all(r.n_current == 1 for r in per_key.collect())


def test_scd2_as_of_slice(spark):
    h = _history(spark)
    at_250 = {r.k: r.state for r in scd2_as_of(h, 250).collect()}
    # key 1 was 'silver' during [200, 300); key 2 open since 150;
    # key 3: cid 5 closed at 100 (zero-width), cid 6 valid from 100 open
    assert at_250 == {1: "silver", 2: "bronze", 3: "b"}
