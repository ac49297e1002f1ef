"""Spark-vs-DuckDB oracle comparator, mirroring the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin side-by-side at
a small scale factor, compares row count, sorted schema, and a value hash
(columns sorted by name, rows sorted by all columns — same shape the driver
uses), and prints one status line per query.

Usage:
    python scripts/check_oracles.py [--sf-dir /root/testdata/sf0.001] [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple]) -> str:
    canon = sorted(repr(r) for r in rows)
    h = hashlib.sha256()
    for r in canon:
        h.update(r.encode())
    return h.hexdigest()[:16]


def normalize(cols: list[str], rows, round_dp: int | None = None) -> list[tuple]:
    # round_dp=None hashes RAW float reprs — the strict posture. The
    # r15 driver flagged a q_gate_agreement cell that the old 6-dp
    # normalization here masked; never re-weaken the default. Pass
    # --round-dp only to localize a known mismatch to float tails.
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if round_dp is not None and isinstance(v, float):
                v = round(v, round_dp)
            vals.append(v)
        out.append(tuple(vals))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.001"))
    ap.add_argument("--round-dp", type=int, default=None,
                    help="diagnostic only: round floats before hashing "
                         "(default: raw reprs, the strict posture)")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import duckdb
    import __spark_entry__ as entry
    from linz_bde_uploader_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.queries or list(qs)
    n_fail = 0
    for name in names:
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name:34s} rows={len(srows):7d}  NO-ORACLE (rows-only)")
                continue
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            sh = value_hash(normalize(scols, srows, args.round_dp))
            oh = value_hash(normalize(ocols, orows, args.round_dp))
            ok = (len(srows) == len(orows)
                  and sorted(scols) == sorted(ocols)
                  and sh == oh)
            status = "OK" if ok else "MISMATCH"
            if not ok:
                n_fail += 1
            print(f"{name:34s} rows={len(srows):7d}/{len(orows):<7d} "
                  f"schema={'=' if sorted(scols) == sorted(ocols) else '!'} "
                  f"hash={'=' if sh == oh else '!'}  {status}")
        except Exception as e:  # noqa: BLE001 — report and continue
            n_fail += 1
            print(f"{name:34s} ERROR: {type(e).__name__}: {e}")
            if os.environ.get("VERBOSE"):
                traceback.print_exc()
    print(f"\n{len(names) - n_fail}/{len(names)} green")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
