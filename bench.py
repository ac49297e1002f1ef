"""Benchmark harness: time every ``queries()`` entry and print ONE JSON line.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default all cores). Each query is executed to
full materialization via the ``noop`` sink (computes every column — a bare
``count()`` would let column pruning skip most of the work), timed with a
monotonic clock, and run ``$SPARK_GRAFT_BENCH_REPEATS`` times (default 3).
The reported per-query statistic is the MIN of its runs: on a shared host
the noise is strictly additive (a stall can only make a run slower, never
faster), so the min is the closest observable to the query's true cost —
round 4's median-of-3 was contaminated when one stall overlapped two of a
query's three interleaved laps (raw 22.9/14.2/4.8 s → median 14.2 for a
~4.8 s query). The median and raw runs still go to BENCH_DETAIL.json.
Repeats are interleaved as full passes over the registry so one host
stall cannot swallow every sample of the same query, and a constant
SENTINEL query (fixed-size in-memory agg, data-independent) is timed
every ~20 queries; its timeline in BENCH_DETAIL.json pinpoints any host
stall post-hoc (a slow sentinel = the host, not the query).

Output (single line on stdout; everything else goes to stderr):
    {"metric": "total_query_wall", "value": N, "unit": "sec",
     "queries": {<slowest 5>}, "families": {<per-family sums>},
     "n_queries": N, "detail": "BENCH_DETAIL.json", "sf": 0.1}

The stdout line is kept SHORT (~1 KB) on purpose: the external driver
retains only a ~2 KB stdout tail, and a full 90+-query dict overflows it
(round 3 shipped with ``parsed: null`` for exactly this reason). The
complete per-query median dict plus raw runs goes to ``BENCH_DETAIL.json``
beside this script.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
import traceback

import pandas as pd


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entry
    from linz_bde_uploader_spark.session import get_spark

    spark = get_spark()
    # Warm the JVM/session AND the scan machinery (file listing, footer
    # reads, codegen) so the first measured query doesn't absorb one-time
    # setup costs that every later query gets for free.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Warm the join/aggregate/window/noop-sink code paths as well — the
    # first measured query otherwise absorbs their one-time codegen and
    # thread-pool setup (observed: +2-3 s on whichever query runs first).
    a = spark.range(100_000).selectExpr("id", "id % 100 AS k")
    b = spark.range(1_000).selectExpr("id AS k2")
    (
        a.join(b, a.k == b.k2)
        .groupBy("k")
        .count()
        .selectExpr("k", "count", "row_number() OVER (ORDER BY k) AS rn")
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    # The 1k-row build side broadcasts, so the above only warms
    # BroadcastHashJoin — warm SortMergeJoin too (full-outer joins in the
    # diff kernel can never broadcast).
    bcast_prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    a.join(b, a.k == b.k2, "full_outer").write.mode("overwrite").format(
        "noop"
    ).save()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast_prev)
    # Warm the Python/Arrow worker pool across all cores — the first
    # pandas-UDF query otherwise absorbs one worker spin-up per partition
    # (~2-3 s at 32 partitions).
    from pyspark.sql import functions as F  # noqa: PLC0415

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    par = spark.sparkContext.defaultParallelism
    (
        spark.range(100_000)
        .repartition(par)
        .select(_warm("id"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    # events.parquet has shipped as TIMESTAMP(NANOS) in some rounds; the
    # conf makes that layout readable (raw longs) and is a no-op for the
    # TIMESTAMP(MICROS) layout — workload.events() normalizes either.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("orders", "lineitem", "customer", "documents", "events",
              "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()

    # Per-query MIN over N runs: single-run walls on this VM jitter
    # 3-10× on unlucky queries, and host-stall noise is strictly
    # additive, so the min of N interleaved samples is the most
    # stall-robust estimator of the query's true cost.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    failed: dict[str, str] = {}
    queries = entry.queries()

    # Data-independent constant probe: ~100 ms of pure in-memory agg.
    # Timed on a fixed cadence; any sample far above its own min marks a
    # host stall window in the (pass, position, wall) timeline.
    def sentinel() -> float:
        t0 = time.monotonic()
        spark.range(20_000_000).selectExpr(
            "sum(id) AS s", "count(*) AS c"
        ).write.mode("overwrite").format("noop").save()
        return round(time.monotonic() - t0, 3)

    sentinel()  # warm its codegen so sample 0 isn't an outlier
    sentinel_log: list[dict] = []
    # Repeats are INTERLEAVED (full pass over the registry per repeat)
    # rather than back-to-back: a multi-second host stall spans tens of
    # seconds of wall-clock, and back-to-back repeats put all of one
    # query's samples inside the same stall — the median then reports
    # 6× for a query that is fine (observed, non-reproducible in
    # isolation). Interleaving separates a query's samples by the whole
    # registry, so the median shrugs off any single bad window.
    for rep in range(repeats):
        for qi, (name, fn) in enumerate(queries.items()):
            if name in failed:
                continue
            if qi % 20 == 0:
                if qi:
                    # Spark's ContextCleaner releases finished broadcasts
                    # and shuffles only when the JVM GC collects their
                    # driver-side references; over a 100+-query pass G1
                    # defers that long enough for stale blocks to crowd
                    # executor storage and skew late-query timings. A
                    # periodic explicit GC keeps the cleaner current.
                    spark.sparkContext._jvm.System.gc()
                sentinel_log.append(
                    {"pass": rep, "pos": qi, "wall": sentinel()}
                )
            t0 = time.monotonic()
            try:
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                raw_runs.setdefault(name, []).append(
                    round(time.monotonic() - t0, 3)
                )
            except Exception as e:  # noqa: BLE001 — a broken query must not hide the rest
                # Keep any samples from earlier passes: a transient
                # one-pass failure must not erase a query from the total
                # (that silently shrinks total_query_wall vs prior rounds).
                failed[name] = f"{type(e).__name__}: {e}"
                log(f"{name:34s} FAILED {failed[name]}")
                traceback.print_exc(file=sys.stderr)
            finally:
                # Operators persist intermediates (banded projections, JSONL
                # budget caches); drop them so queries are measured
                # independently and storage memory never accumulates.
                spark.catalog.clearCache()
        log(f"-- pass {rep + 1}/{repeats} complete")
    for name, runs in raw_runs.items():
        best = min(runs)
        timings[name] = round(best, 3)
        log(f"{name:34s} {best:7.3f}s  " + " ".join(f"{r:.3f}" for r in runs))

    total = round(sum(timings.values()), 3)

    # Full per-query detail to a file (the driver's stdout tail is ~2 KB;
    # the stdout line below stays small so it always parses).
    detail = {
        "metric": "total_query_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "medians": {
            n: round(statistics.median(r), 3) for n, r in raw_runs.items()
        },
        "raw_runs": raw_runs,
        "sentinel": sentinel_log,
        "sf": sf,
        "repeats": repeats,
        "aggregation": "min_per_query",
    }
    if failed:
        detail["failed"] = failed
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    log(f"full per-query detail -> {detail_path}")

    def family(name: str) -> str:
        tok = name.split("_")[1] if "_" in name else name
        return re.sub(r"\d+$", "", tok) or tok

    families: dict[str, float] = {}
    for name, sec in timings.items():
        families[family(name)] = round(
            families.get(family(name), 0.0) + sec, 3
        )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    )
    out = {
        "metric": "total_query_wall",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "families": families,
        "n_queries": len(timings),
        "n_expected": len(queries),
        "detail": "BENCH_DETAIL.json",
        "sf": sf,
        "repeats": repeats,
        "aggregation": "min_per_query",
    }
    if failed:
        out["failed"] = {k: v[:80] for k, v in failed.items()}
    if sentinel_log:
        walls = [s["wall"] for s in sentinel_log]
        out["sentinel_min"] = min(walls)
        out["sentinel_max"] = max(walls)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
