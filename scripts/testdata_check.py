"""Fast testdata-drift canary — run FIRST at the start of a session.

The external driver can regenerate ``/root/testdata`` between rounds and
has changed physical layouts before (events.parquet shipped as
TIMESTAMP(NANOS)/int64 in some rounds and TIMESTAMP(MICROS) in others,
silently breaking every events-based query until the reader was taught
both). This script diffs the current parquet schemas against the
contract the engine supports and exits non-zero on anything unexpected —
in under a second, no Spark session.

Usage:
    python scripts/testdata_check.py [--root /root/testdata]
"""

from __future__ import annotations

import argparse
import os
import sys

# column → the pyarrow type names the engine's readers handle. A tuple
# means "any of these layouts is normalized by the reader".
EXPECTED: dict[str, dict[str, tuple[str, ...]]] = {
    "region": {"r_regionkey": ("int32", "int64"), "r_name": ("string", "large_string")},
    "nation": {"n_nationkey": ("int32", "int64"), "n_name": ("string", "large_string"),
               "n_regionkey": ("int32", "int64")},
    "customer": {"c_custkey": ("int64",), "c_name": ("string", "large_string"),
                 "c_nationkey": ("int32", "int64"), "c_acctbal": ("double",),
                 "c_mktsegment": ("string", "large_string")},
    "supplier": {"s_suppkey": ("int64",), "s_name": ("string", "large_string"),
                 "s_nationkey": ("int32", "int64"), "s_acctbal": ("double",)},
    "part": {"p_partkey": ("int64",), "p_name": ("string", "large_string"),
             "p_brand": ("string", "large_string"), "p_type": ("string", "large_string"),
             "p_size": ("int32", "int64"), "p_retailprice": ("double",)},
    "orders": {"o_orderkey": ("int64",), "o_custkey": ("int64",),
               "o_orderstatus": ("string", "large_string"), "o_totalprice": ("double",),
               "o_orderdate": ("timestamp[us]", "timestamp[ns]"),
               "o_orderpriority": ("string", "large_string")},
    "lineitem": {"l_orderkey": ("int64",), "l_partkey": ("int64",),
                 "l_suppkey": ("int64",), "l_linenumber": ("int32", "int64"),
                 "l_quantity": ("double",), "l_extendedprice": ("double",),
                 "l_discount": ("double",), "l_tax": ("double",),
                 "l_returnflag": ("string", "large_string"),
                 "l_linestatus": ("string", "large_string"),
                 "l_shipdate": ("timestamp[us]", "timestamp[ns]")},
    # both events layouts are supported by plans/workload.py::events()
    "events": {"event_id": ("int64",), "ts": ("timestamp[us]", "timestamp[ns]", "int64"),
               "user_id": ("int64",), "event_type": ("string", "large_string"),
               "value": ("double",), "props": ("string", "large_string")},
    "documents": {"doc_id": ("int64",), "text": ("string", "large_string"),
                  "lang": ("string", "large_string"), "source": ("string", "large_string"),
                  "n_chars": ("int64",)},
    "embeddings": {"vec_id": ("int64",),
                   "embedding": ("list<element: float>", "list<item: float>",
                                 "large_list<element: float>"),
                   "label": ("int32", "int64")},
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/testdata")
    args = ap.parse_args()

    import pyarrow.parquet as pq

    problems: list[str] = []
    for sf in sorted(os.listdir(args.root)):
        sf_dir = os.path.join(args.root, sf)
        if not os.path.isdir(sf_dir):
            continue
        for table, cols in EXPECTED.items():
            path = os.path.join(sf_dir, f"{table}.parquet")
            if not os.path.exists(path):
                problems.append(f"{sf}/{table}: MISSING")
                continue
            schema = pq.read_schema(path)
            got = {f.name: str(f.type) for f in schema}
            for col, allowed in cols.items():
                if col not in got:
                    problems.append(f"{sf}/{table}.{col}: column missing")
                elif got[col] not in allowed:
                    problems.append(
                        f"{sf}/{table}.{col}: {got[col]} not in {allowed}"
                    )
            for col in got:
                if col not in cols:
                    problems.append(f"{sf}/{table}.{col}: NEW column {got[col]}")

    if problems:
        print("TESTDATA DRIFT DETECTED — run scripts/check_oracles.py "
              "before trusting any prior green:")
        for p in problems:
            print(f"  {p}")
        return 1
    print("testdata schemas match the supported contract (all scale factors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
