"""As-of join (tagged-union + running-last composition, operators/asof.py)."""

from __future__ import annotations

import pytest

from linz_bde_uploader_spark.operators.asof import asof_join

LEFT = [  # (eid, key, t)
    (1, "a", 10),
    (2, "a", 20),
    (3, "a", 5),
    (4, "b", 100),
]
RIGHT = [  # (key, t, px)
    ("a", 10, 1.0),
    ("a", 15, 2.0),
    ("b", 200, 9.0),
]


@pytest.fixture(scope="module")
def frames(spark):
    l = spark.createDataFrame(LEFT, "eid long, k string, t long")
    r = spark.createDataFrame(RIGHT, "k string, t long, px double")
    return l, r


def test_asof_basic(spark, frames):
    l, r = frames
    got = {
        row.eid: row.px_asof
        for row in asof_join(l, r, "k", "t", ["px"]).collect()
    }
    assert got == {
        1: 1.0,   # right at t=10 matches a left at t=10 (<= contract)
        2: 2.0,   # latest at-or-before 20 is t=15
        3: None,  # nothing at-or-before 5
        4: None,  # b's only right row is in the future
    }


def test_asof_tolerance(spark, frames):
    l, r = frames
    got = {
        row.eid: row.px_asof
        for row in asof_join(l, r, "k", "t", ["px"], tolerance=5).collect()
    }
    # eid 2 at t=20 matched t=15 (age 5, allowed); eid 1 age 0
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: None}
    got1 = {
        row.eid: row.px_asof
        for row in asof_join(l, r, "k", "t", ["px"], tolerance=4).collect()
    }
    assert got1 == {1: 1.0, 2: None, 3: None, 4: None}


def test_asof_matches_duckdb_semantics(spark, frames):
    """Cross-check against DuckDB's native ASOF LEFT JOIN on the same
    data — the oracle contract the harness query relies on."""
    import duckdb

    l, r = frames
    con = duckdb.connect()
    con.execute("CREATE TABLE l(eid BIGINT, k VARCHAR, t BIGINT)")
    con.execute("CREATE TABLE r(k VARCHAR, t BIGINT, px DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", LEFT)
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", RIGHT)
    want = dict(
        con.execute(
            "SELECT l.eid, r.px FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    )
    got = {
        row.eid: row.px_asof
        for row in asof_join(l, r, "k", "t", ["px"]).collect()
    }
    assert got == want


def test_asof_null_right_value_is_the_match(spark):
    """A matched right row with a NULL value must yield NULL — not an
    older non-NULL value (last-row semantics, matching DuckDB ASOF)."""
    l = spark.createDataFrame([(1, "a", 20)], "eid long, k string, t long")
    r = spark.createDataFrame(
        [("a", 5, 3.0), ("a", 10, None)], "k string, t long, px double"
    )
    got = asof_join(l, r, "k", "t", ["px"]).collect()[0]
    assert got.px_asof is None


def test_asof_null_time_right_rows_never_match(spark):
    """SQL semantics: l.t >= NULL is never true, so NULL-time right rows
    must not leak values into any left row."""
    l = spark.createDataFrame([(1, "a", 20)], "eid long, k string, t long")
    r = spark.createDataFrame([("a", None, 7.0)], "k string, t long, px double")
    got = asof_join(l, r, "k", "t", ["px"]).collect()[0]
    assert got.px_asof is None


def test_asof_multi_value_cols_come_from_one_row(spark):
    l = spark.createDataFrame([(1, "a", 20)], "eid long, k string, t long")
    r = spark.createDataFrame(
        [("a", 5, 1.0, None), ("a", 10, None, 2.0)],
        "k string, t long, px double, qty double",
    )
    got = asof_join(l, r, "k", "t", ["px", "qty"]).collect()[0]
    # the t=10 row is the match: px NULL, qty 2.0 — never a mix of rows
    assert got.px_asof is None and got.qty_asof == 2.0


def test_asof_rejects_colliding_names(spark, frames):
    l, r = frames
    with pytest.raises(ValueError):
        asof_join(l.withColumnRenamed("eid", "px_asof"), r, "k", "t", ["px"])
    with pytest.raises(ValueError):
        asof_join(l.withColumnRenamed("eid", "_side"), r, "k", "t", ["px"])
