"""Window-function analytics over event streams.

The reference has NO window functions (SURVEY §2.5 — its only sort/limit
idioms are driver-side list sorts and LIMIT 1); these extend the engine
with the standard event-analytics shapes a training-data pipeline needs:
gap-based sessionization, per-group top-k, and sliding-frame aggregates.

Scale posture: every operator here is one `Window.partitionBy(key)` —
a single hash shuffle on the partition key, then per-partition sorted
evaluation (Spark's WindowExec sorts within partitions; no global sort,
no driver involvement). Skewed keys are the usual caveat: a user with
billions of events serializes one partition — pre-split hot keys with
``operators.skew`` salting if a key can exceed an executor's slice.

Determinism: window orderings always include a unique tiebreaker column
(the event id) so frame contents — and therefore results — are identical
on any engine; frames are ROWS-based, never RANGE, for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    time_col: Column | str,
    id_col: str,
    gap: int,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap`` (same time unit as
    ``time_col``). Returns the input plus a per-key ``session_id``
    (1-based, ordered by time).

    Classic two-window composition: lag() marks session starts, a running
    sum over the *same* ordering numbers them. Both windows share one
    partitioning and sort, so the plan has a single shuffle + sort.
    """
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    order = [t.asc(), F.col(id_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(t).over(w)
    is_new = (prev.isNull() | ((t - prev) > gap)).cast("long")
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(is_new).over(run))


def session_stats(
    df: DataFrame,
    key_col: str,
    time_col: Column | str,
    id_col: str,
    gap: int,
) -> DataFrame:
    """Per-session rollup: (key, session_id, n_events, start, end)."""
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    sess = sessionize(df.withColumn("_t", t), key_col, "_t", id_col, gap)
    return sess.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("_t").alias("start_t"),
        F.max("_t").alias("end_t"),
    )


def session_window_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-session rollup via Spark's NATIVE ``session_window`` — the
    operator to prefer on a live stream: with a watermark the state
    store evicts closed sessions, giving bounded state on an unbounded
    feed (the lag/running-sum composition in :func:`sessionize` is
    batch-only — a window over all history can't stream).

    Returns (key, session_start, session_end, n_events) with
    ``session_end = last event + gap`` (Spark's half-open contract).

    Boundary note vs :func:`sessionize`: an event arriving at EXACTLY
    ``gap`` after the previous one starts a NEW session here (the window
    is ``[start, last+gap)``) but stays in the SAME session there
    (strict ``>`` test) — the two agree on all non-boundary data.

    Scale: same single hash shuffle on the grouping key as any
    aggregation; session merging happens inside the aggregation, no
    extra exchange."""
    src = df
    if df.isStreaming and watermark:
        src = df.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` descending (ties broken by
    ``id_col`` ascending — deterministic). row_number() over a ROWS
    window; Spark evaluates it with per-partition sorted iteration, and
    the rank filter prunes before anything leaves the window operator."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def moving_avg(
    df: DataFrame,
    key_col: str,
    time_col: Column | str,
    id_col: str,
    value_col: str,
    preceding: int = 3,
    out_col: str = "mov_avg",
) -> DataFrame:
    """Sliding-frame mean of ``value_col`` over the last ``preceding``+1
    rows per key (ROWS frame — unique ordering makes frame contents, and
    the left-to-right summation inside the frame, engine-independent).
    Rounded to 6 dp for stable cross-engine comparison."""
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    w = (
        Window.partitionBy(key_col)
        .orderBy(t.asc(), F.col(id_col).asc())
        .rowsBetween(-preceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.round(F.avg(value_col).over(w), 6))


def event_funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_ntz",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each user, the deepest stage reached
    where stage ``i+1`` must occur STRICTLY AFTER the user's earliest
    completion of stage ``i`` (the classic conversion funnel — view →
    click → purchase). Returns ``(user, stage)`` for users who reached
    stage 1; ``stage`` is 1-based depth.

    Scale: ``len(stages)`` chained aggregations, each keyed on the user
    — the same hash partitioning reused across every step (no exchange
    re-shuffle once co-partitioned), state O(users), and NO per-user
    event self-join (the naive stage-pairing join is quadratic in
    events-per-user; this is linear). Skewed users cost one partition's
    sort, the windows-module caveat."""
    if not stages:
        raise ValueError("stages must be non-empty")
    cur = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, st in enumerate(stages[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == st)
            .join(cur.select(user_col, f"t{i-1}"), user_col)
            .filter(F.col(ts_col) > F.col(f"t{i-1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    stage = None
    for i in range(len(stages), 1, -1):
        cond = F.col(f"t{i}").isNotNull()
        stage = (
            F.when(cond, i) if stage is None else stage.when(cond, i)
        )
    stage = F.lit(1) if stage is None else stage.otherwise(1)
    return cur.select(
        F.col(user_col), stage.cast("int").alias("stage")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ntz",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the DAY of their first
    event, counted as active per day offset — the
    ``(cohort_day, day_offset, active_users)`` triangle every
    engagement dashboard draws.

    Scale: one agg for first-days (state O(users)), one user-keyed join
    back to events (AQE broadcasts the first-day table when small), one
    partial-agg count-distinct over the bounded (cohort, offset) key
    space. Nothing quadratic, nothing per-user on the driver."""
    first = events.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("cohort_day")
    )
    return (
        events.join(first, user_col)
        .select(
            "cohort_day",
            F.datediff(F.to_date(ts_col), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(user_col).alias("active_users"))
    )


def growth_accounting(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ntz",
) -> DataFrame:
    """Daily growth accounting — the complement of
    :func:`cohort_retention`'s triangle: one row per active day with

    ``(day, active_users, new_users, returning_users,
    cumulative_users)``

    where ``new_users`` were first seen that day, ``returning = active
    - new``, and ``cumulative_users`` is the running total of
    first-sightings (= distinct users ever seen through that day —
    computed as a running SUM of the per-day new counts, which equals
    the windowed count-distinct without ever holding per-user state in
    a window frame).

    Scale: one agg for first-days (state O(users)), one distinct over
    (day, user) — both partial-aggregated shuffles — a user-keyed join
    (AQE broadcasts the first-day table when small), one bounded
    per-day agg, and the cumulative window runs over the tiny per-DAY
    table only (|days| rows), not over events."""
    from pyspark.sql import Window

    first = events.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("_first_day")
    )
    daily = events.select(
        F.to_date(ts_col).alias("day"), F.col(user_col)
    ).distinct()
    per_day = (
        daily.join(first, user_col)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_users"),
            F.sum(
                (F.col("day") == F.col("_first_day")).cast("long")
            ).alias("new_users"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias(
            "returning_users"
        ),
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


def daily_anomalies(
    events: DataFrame,
    ts_col: str = "ts_ntz",
    key_col: str = "event_type",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust anomaly detection on daily event volumes — the pipeline-
    monitoring primitive (is today's feed broken?): per ``key_col``,
    flag days whose count deviates from the key's MEDIAN by more than
    ``threshold`` robust z-scores, where

        robust_z = 0.6745 · (n - median) / MAD
        MAD      = median(|n - median|)

    (Iglewicz & Hoaglin's modified z-score — median/MAD instead of
    mean/stddev, so a single broken day cannot mask itself by inflating
    the baseline, which is exactly the failure mode of a plain z-score
    on pipeline volumes). Returns ``(key, day, n, med, mad, robust_z,
    is_anomaly)``; a zero MAD (constant series) yields ``robust_z = 0``
    and flags nothing — a constant series has no scale to judge
    deviation against, and the 4-dp rounding keeps both engines
    identical.

    Scale: the daily count agg is the only data-sized shuffle; the
    median/MAD aggregates and the rejoin run over the bounded
    (key × days) table. Exact interpolated medians (Spark ``median`` ==
    DuckDB ``median``) — at extreme key cardinalities swap for
    approx_percentile and accept boundary jitter."""
    daily = (
        events.select(
            F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    med = daily.groupBy("key").agg(F.median("n").alias("med"))
    dev = daily.join(med, "key").withColumn(
        "_dev", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("key").agg(F.median("_dev").alias("mad"))
    z = F.when(
        F.col("mad") > 0,
        F.round(
            F.lit(0.6745) * (F.col("n") - F.col("med")) / F.col("mad"), 4
        ),
    ).otherwise(F.lit(0.0))
    return (
        dev.join(mad, "key")
        .select(
            "key",
            "day",
            "n",
            "med",
            "mad",
            z.alias("robust_z"),
        )
        .withColumn(
            "is_anomaly", F.abs(F.col("robust_z")) > F.lit(threshold)
        )
    )
