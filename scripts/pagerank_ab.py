"""Interleaved checkpoint_every A/B for the pagerank queries (VERDICT
r15 item 2): run q_graph_pagerank and q_graph_pagerank_directed with
checkpoint_every forced to each candidate value, alternating variants
within ONE warmed session at the ambient core count, noop sink, and
print the per-variant minima — the controlled measurement the r15
driver lap contradiction asks for.

Usage: python scripts/pagerank_ab.py [--repeats 4] [--values 1,2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--values", default="1,2")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()
    values = [int(v) for v in args.values.split(",")]

    import __spark_entry__ as entry
    from linz_bde_uploader_spark.functions import graph
    from linz_bde_uploader_spark.session import get_spark

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = entry.queries()
    targets = ["q_graph_pagerank", "q_graph_pagerank_directed"]

    real_pagerank = graph.pagerank
    results: dict[tuple[str, int], list[float]] = {
        (t, v): [] for t in targets for v in values
    }
    try:
        for rep in range(args.repeats):
            for v in values:
                def forced(edges, n_iters=4, damping=0.85,
                           checkpoint_every=1, dangling=False, _v=v):
                    return real_pagerank(edges, n_iters, damping,
                                         checkpoint_every=_v,
                                         dangling=dangling)
                graph.pagerank = forced
                for t in targets:
                    spark.sparkContext.setJobDescription(
                        f"{t} ckpt={v} rep={rep}")
                    t0 = time.monotonic()
                    qs[t](spark, args.sf_dir).write.mode(
                        "overwrite").format("noop").save()
                    dt = round(time.monotonic() - t0, 3)
                    results[(t, v)].append(dt)
                    spark.catalog.clearCache()
                    print(f"rep{rep} ckpt={v} {t:28s} {dt:7.3f}s",
                          flush=True)
    finally:
        graph.pagerank = real_pagerank
    print()
    for t in targets:
        for v in values:
            rs = results[(t, v)]
            print(f"{t:28s} ckpt={v}  min={min(rs):7.3f}  "
                  f"median={sorted(rs)[len(rs)//2]:7.3f}  runs="
                  + " ".join(f"{r:.3f}" for r in rs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
