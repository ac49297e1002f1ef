"""Isolated per-query measurement + plan capture (optimization guide §1).

Times each named query with the noop sink on a warmed session (same
methodology as bench.py: min over N interleaved repeats) and writes
``plans/r15/<query>_<tag>.txt`` with the ``explain("formatted")`` output.

Usage:
    python scripts/isolate_query.py [--tag before|after] [--repeats 3]
        [--sf-dir /root/testdata/sf0.1] [--no-plans] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--round", default="r16", dest="round_dir",
                    help="plans/<round> output directory")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from linz_bde_uploader_spark.session import get_spark

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = entry.queries()
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.round_dir)
    os.makedirs(plans_dir, exist_ok=True)

    runs: dict[str, list[float]] = {n: [] for n in args.queries}
    for rep in range(args.repeats):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
            t0 = time.monotonic()
            df = qs[name](spark, args.sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs[name].append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
            if rep == 0 and not args.no_plans:
                df2 = qs[name](spark, args.sf_dir)
                plan = df2._sc._jvm.PythonSQLUtils.explainString(
                    df2._jdf.queryExecution(), "formatted")
                with open(os.path.join(plans_dir,
                                       f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(plan)
                spark.catalog.clearCache()
    for name, rs in runs.items():
        print(f"{name:34s} min={min(rs):7.3f}s  runs=" +
              " ".join(f"{r:.3f}" for r in rs), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
