"""Registry-wide DataFrame-CONSTRUCTION census (guide §5 — driver work).

Times each queries() entry's BUILD phase only (calling the query
function, which constructs the DataFrame but runs no action) on a
warmed session. This is the py4j/analysis cost the r15 census put at
~140 s/lap; use it to target expression-tree memoization and
withColumn-chain batching, and to prove before/after construction
cuts without the noise of execution.

Usage:
    python scripts/build_census.py [--repeats 3] [--sf-dir ...]
        [--out /tmp/census.json] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/build_census.json")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from linz_bde_uploader_spark.caching import release_intermediates
    from linz_bde_uploader_spark.session import get_spark

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = entry.queries()
    names = args.queries or list(qs)

    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.repeats):
        for name in names:
            t0 = time.monotonic()
            qs[name](spark, args.sf_dir)
            runs[name].append(round(time.monotonic() - t0, 3))
            # some builders run bounded setup actions (model collects);
            # drop their caches so repeats measure the same work
            spark.catalog.clearCache()
            release_intermediates()
    out = {n: min(rs) for n, rs in runs.items()}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    total = sum(out.values())
    print(f"build-phase total (min of {args.repeats}): {total:.1f}s "
          f"over {len(out)} queries -> {args.out}")
    for n, s in sorted(out.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{n:36s} {s:7.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
