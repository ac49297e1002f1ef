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


def test_session_window_stats_matches_manual_sessionize(spark, events_df):
    """Spark's native session_window must carve the same sessions as the
    lag/running-sum sessionize on non-boundary data (no delta equals the
    gap exactly). Timestamps come from the same epoch seconds."""
    from pyspark.sql import functions as F

    ts = events_df.withColumn("ts", F.timestamp_seconds(F.col("t")))
    got = {
        (r.user_id, int(r.session_start.timestamp()), r.n_events)
        for r in WN.session_window_stats(
            ts, "user_id", "ts", gap="50 seconds"
        ).collect()
    }
    manual = {
        (r.user_id, r.start_t, r.n_events)
        for r in WN.session_stats(
            events_df, "user_id", "t", "event_id", gap=50
        ).collect()
    }
    assert got == manual
    # end = last event + gap (the half-open session_window contract)
    ends = {
        (r.user_id, int(r.session_start.timestamp())):
            int(r.session_end.timestamp())
        for r in WN.session_window_stats(
            ts, "user_id", "ts", gap="50 seconds"
        ).collect()
    }
    assert ends[(1, 1000)] == 1005 + 50
    assert ends[(2, 500)] == 500 + 50


def test_session_window_stats_streaming_bounded_state(spark, tmp_path):
    """The native session window is the STREAMING-capable shape: with a
    watermark it runs in append mode on a real stream (bounded state —
    closed sessions evict), which the batch-only window composition in
    sessionize cannot."""
    from pyspark.sql import functions as F

    src = tmp_path / "events_in"
    (
        spark.createDataFrame(
            [(1, 1000), (1, 1005), (1, 1205), (2, 500)], "user_id long, t long"
        )
        .select("user_id", F.timestamp_seconds("t").alias("ts"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(src))
    )
    stream = spark.readStream.schema(
        "user_id long, ts timestamp"
    ).parquet(str(src))
    out = WN.session_window_stats(
        stream, "user_id", "ts", gap="50 seconds", watermark="1 second"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.user_id, int(r.session_start.timestamp()), r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # append mode emits exactly the sessions the watermark CLOSED
    # (ends 1055 and 550 ≤ watermark 1204) and withholds the still-open
    # one (end 1255) — the bounded-state eviction contract itself
    assert rows == {(1, 1000, 2), (2, 500, 1)}


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


class TestFunnelCohort:
    @staticmethod
    def _events(spark):
        # user 1: full funnel in order; user 2: click BEFORE view (stage
        # 1 only), later click doesn't exist; user 3: view+click, no
        # purchase; user 4: never views
        from datetime import datetime as DT

        rows = [
            (1, DT(2024, 1, 1, 10), 1, "view"),
            (2, DT(2024, 1, 1, 11), 1, "click"),
            (3, DT(2024, 1, 1, 12), 1, "purchase"),
            (4, DT(2024, 1, 1, 9), 2, "click"),
            (5, DT(2024, 1, 1, 10), 2, "view"),
            (6, DT(2024, 1, 1, 8), 3, "view"),
            (7, DT(2024, 1, 1, 9), 3, "click"),
            (8, DT(2024, 1, 1, 7), 4, "purchase"),
        ]
        return spark.createDataFrame(
            rows, "event_id long, ts_ntz timestamp_ntz, user_id long, event_type string"
        )

    def test_funnel_stage_ordering_is_strict(self, spark):
        from linz_bde_uploader_spark.functions.windows import event_funnel

        out = {
            r.user_id: r.stage
            for r in event_funnel(
                self._events(spark), ["view", "click", "purchase"]
            ).collect()
        }
        # user 2's click precedes their view -> stage stays 1;
        # user 4 never viewed -> absent entirely
        assert out == {1: 3, 2: 1, 3: 2}

    def test_funnel_equal_timestamp_not_counted(self, spark):
        from datetime import datetime as DT

        from linz_bde_uploader_spark.functions.windows import event_funnel

        df = spark.createDataFrame(
            [(1, DT(2024, 1, 1, 10), 7, "view"),
             (2, DT(2024, 1, 1, 10), 7, "click")],
            "event_id long, ts_ntz timestamp_ntz, user_id long, event_type string",
        )
        out = event_funnel(df, ["view", "click"]).collect()
        assert out[0].stage == 1  # strictly-after contract

    def test_cohort_retention_triangle(self, spark):
        from datetime import datetime as DT

        from linz_bde_uploader_spark.functions.windows import cohort_retention

        df = spark.createDataFrame(
            [
                (1, DT(2024, 1, 1, 5), 1, "view"),
                (2, DT(2024, 1, 2, 5), 1, "view"),   # day 1 return
                (3, DT(2024, 1, 1, 6), 2, "view"),
                (4, DT(2024, 1, 3, 6), 2, "view"),   # day 2 return
                (5, DT(2024, 1, 2, 7), 3, "view"),   # later cohort
            ],
            "event_id long, ts_ntz timestamp_ntz, user_id long, event_type string",
        )
        out = {
            (str(r.cohort_day), r.day_offset): r.active_users
            for r in cohort_retention(df).collect()
        }
        assert out == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-01", 2): 1,
            ("2024-01-02", 0): 1,
        }


class TestGrowthAccounting:
    def test_new_returning_cumulative(self, spark):
        from datetime import datetime as DT

        from linz_bde_uploader_spark.functions.windows import (
            growth_accounting,
        )

        df = spark.createDataFrame(
            [
                (1, DT(2024, 1, 1, 5), 1, "view"),
                (2, DT(2024, 1, 1, 6), 1, "view"),   # same user+day dedup
                (3, DT(2024, 1, 1, 7), 2, "view"),
                (4, DT(2024, 1, 2, 5), 1, "view"),   # returning
                (5, DT(2024, 1, 2, 6), 3, "view"),   # new on day 2
                (6, DT(2024, 1, 4, 5), 3, "view"),   # gap day, returning
            ],
            "event_id long, ts_ntz timestamp_ntz, user_id long, event_type string",
        )
        out = {str(r.day): r for r in growth_accounting(df).collect()}
        d1, d2, d4 = out["2024-01-01"], out["2024-01-02"], out["2024-01-04"]
        assert (d1.active_users, d1.new_users, d1.returning_users,
                d1.cumulative_users) == (2, 2, 0, 2)
        assert (d2.active_users, d2.new_users, d2.returning_users,
                d2.cumulative_users) == (2, 1, 1, 3)
        # inactive day 3 emits no row; cumulative carries through day 4
        assert "2024-01-03" not in out
        assert (d4.active_users, d4.new_users, d4.returning_users,
                d4.cumulative_users) == (1, 0, 1, 3)

    def test_cumulative_equals_distinct_ever_seen(self, spark):
        from datetime import datetime as DT

        from linz_bde_uploader_spark.functions.windows import (
            growth_accounting,
        )

        rows = [
            (i, DT(2024, 1, 1 + (i * 3) % 7, 8), (i * 5) % 11, "view")
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts_ntz timestamp_ntz, user_id long, event_type string",
        )
        out = sorted(growth_accounting(df).collect(), key=lambda r: r.day)
        seen = set()
        by_day = {}
        for i, d, u, _ in rows:
            by_day.setdefault(d.date(), set()).add(u)
        for r in out:
            seen |= by_day[r.day]
            assert r.cumulative_users == len(seen)
            assert r.active_users == len(by_day[r.day])


class TestDailyAnomalies:
    def test_spike_flagged_constant_series_not(self, spark):
        from datetime import datetime as DT

        from linz_bde_uploader_spark.functions.windows import daily_anomalies

        rows = []
        eid = 0
        # "view": alternating 2/3 a day for 6 days (nonzero MAD), then a
        # 40-event spike on day 7
        for d in range(1, 7):
            for _ in range(2 + d % 2):
                rows.append((eid, DT(2024, 1, d, 8), 1, "view")); eid += 1
        for _ in range(40):
            rows.append((eid, DT(2024, 1, 7, 8), 1, "view")); eid += 1
        # "click": constant 3/day -> MAD 0, nothing flagged
        for d in range(1, 8):
            for _ in range(3):
                rows.append((eid, DT(2024, 1, d, 8), 1, "click")); eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts_ntz timestamp_ntz, user_id long, event_type string",
        )
        out = {(r.key, str(r.day)): r for r in daily_anomalies(df).collect()}
        spike = out[("view", "2024-01-07")]
        assert spike.is_anomaly and spike.n == 40
        # verify against a python twin
        import statistics
        counts = [2 + d % 2 for d in range(1, 7)] + [40]
        med = statistics.median(counts)
        mad = statistics.median([abs(c - med) for c in counts])
        if mad > 0:
            zz = round(0.6745 * (40 - med) / mad, 4)
            assert spike.robust_z == zz
        for d in range(1, 8):
            r = out[("click", f"2024-01-0{d}")]
            assert not r.is_anomaly and r.robust_z == 0.0

    def test_mad_zero_spike_still_unflagged_documented(self, spark):
        """A 6-same + 1-spike series has MAD 0 (the dev-0 majority), so
        robust_z is 0 by the documented zero-MAD contract — the test
        pins the CONTRACT; callers needing spike detection on
        near-constant series lower the aggregation grain."""
        from datetime import datetime as DT

        from linz_bde_uploader_spark.functions.windows import daily_anomalies

        rows = []
        eid = 0
        for d in range(1, 7):
            rows.append((eid, DT(2024, 2, d, 8), 1, "x")); eid += 1
        for _ in range(50):
            rows.append((eid, DT(2024, 2, 7, 8), 1, "x")); eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts_ntz timestamp_ntz, user_id long, event_type string",
        )
        out = {str(r.day): r for r in daily_anomalies(df).collect()}
        assert out["2024-02-07"].mad == 0.0
        assert not out["2024-02-07"].is_anomaly
