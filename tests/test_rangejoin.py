"""Bin-bucketed range join (operators/rangejoin.py)."""

from __future__ import annotations

import pytest

from linz_bde_uploader_spark.operators.rangejoin import interval_point_join

POINTS = [  # (eid, key, t)
    (1, "a", 5),
    (2, "a", 10),
    (3, "a", 25),
    (4, "b", 10),
]
INTERVALS = [  # (iid, key, s, e)
    (100, "a", 0, 10),     # catches t=5, t=10
    (101, "a", 8, 30),     # catches t=10, t=25
    (102, "b", 50, 60),    # catches nothing
]


@pytest.fixture(scope="module")
def frames(spark):
    p = spark.createDataFrame(POINTS, "eid long, k string, t long")
    i = spark.createDataFrame(INTERVALS, "iid long, k string, s long, e long")
    return p, i


@pytest.mark.parametrize("bin_width", [1, 7, 100])
def test_interval_point_join_exact_pairs(spark, frames, bin_width):
    """The pair set is identical for any bin width (bins are an indexing
    strategy, not a semantic) and each qualifying pair appears once."""
    p, i = frames
    rows = [
        (r.eid, r.iid)
        for r in interval_point_join(p, i, "k", "t", "s", "e", bin_width).collect()
    ]
    assert sorted(rows) == [(1, 100), (2, 100), (2, 101), (3, 101)]
    assert len(rows) == len(set(rows))  # exactly-once, no dedup pass


def test_matches_plain_inequality_join(spark, frames):
    p, i = frames
    want = sorted(
        (pe, ie)
        for pe, pk, pt in POINTS
        for ie, ik, s, e in INTERVALS
        if pk == ik and s <= pt <= e
    )
    got = sorted(
        (r.eid, r.iid)
        for r in interval_point_join(p, i, "k", "t", "s", "e", 10).collect()
    )
    assert got == want
