"""Window-function analytics: sessionization, per-group top-k, sliding
frames. (Extensions — the reference has no window functions, SURVEY §2.5.)
"""

from __future__ import annotations

import pytest

from linz_bde_uploader_spark.functions import windows as WN

# (event_id, user, t, value)  — user 1: gaps 5,100,5  → sessions {1,2},{3,4}
# with gap=50; user 2: single event.
EVENTS = [
    (10, 1, 1000, 4.0),
    (11, 1, 1005, 8.0),
    (12, 1, 1105, 2.0),
    (13, 1, 1110, 6.0),
    (20, 2, 500, 9.0),
]


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.createDataFrame(EVENTS, ["event_id", "user_id", "t", "value"])


def test_sessionize_splits_on_gap(spark, events_df):
    got = {
        r.event_id: r.session_id
        for r in WN.sessionize(events_df, "user_id", "t", "event_id", gap=50).collect()
    }
    assert got == {10: 1, 11: 1, 12: 2, 13: 2, 20: 1}


def test_session_stats_rollup(spark, events_df):
    rows = {
        (r.user_id, r.session_id): (r.n_events, r.start_t, r.end_t)
        for r in WN.session_stats(
            events_df, "user_id", "t", "event_id", gap=50
        ).collect()
    }
    assert rows == {
        (1, 1): (2, 1000, 1005),
        (1, 2): (2, 1105, 1110),
        (2, 1): (1, 500, 500),
    }


def test_topk_per_group(spark, events_df):
    rows = [
        (r.event_id, r.rank)
        for r in WN.topk_per_group(events_df, "user_id", "value", "event_id", k=2)
        .orderBy("user_id", "rank")
        .collect()
    ]
    # user 1: values 8.0 (id 11), 6.0 (id 13) win; user 2: its only event
    assert rows == [(11, 1), (13, 2), (20, 1)]


def test_topk_ties_break_on_id(spark):
    df = spark.createDataFrame(
        [(1, 1, 5.0), (2, 1, 5.0), (3, 1, 5.0)], ["event_id", "g", "value"]
    )
    rows = [
        r.event_id
        for r in WN.topk_per_group(df, "g", "value", "event_id", k=2)
        .orderBy("rank")
        .collect()
    ]
    assert rows == [1, 2]


def test_moving_avg_frame(spark, events_df):
    got = {
        r.event_id: r.mov_avg
        for r in WN.moving_avg(
            events_df, "user_id", "t", "event_id", "value", preceding=1
        ).collect()
    }
    assert got[10] == 4.0          # frame = [4]
    assert got[11] == 6.0          # frame = [4, 8]
    assert got[12] == 5.0          # frame = [8, 2]
    assert got[13] == 4.0          # frame = [2, 6]
    assert got[20] == 9.0
