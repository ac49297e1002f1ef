"""The events fixture has shipped in two physical parquet layouts across
rounds (TIMESTAMP(NANOS) → int64-nanos under nanosAsLong, and plain
TIMESTAMP(MICROS)). ``plans.workload.events()`` must normalize EITHER
into the same contract: ``ts`` BIGINT epoch nanos, ``ts_ntz`` µs
timestamp_ntz — so a fixture regeneration can never silently break the
19 event-based queries again."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from linz_bde_uploader_spark.plans import workload as W

ROWS = [
    (1, datetime.datetime(2024, 3, 5, 10, 0, 0, 123456), 7, "click", 1.5, "{}"),
    (2, datetime.datetime(2024, 3, 5, 11, 30, 0, 654321), 8, "view", 2.5, "{}"),
]


def _write_events(tmp_path, unit):
    ts_vals = [r[1] for r in ROWS]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array(ts_vals, pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS]),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS]),
        }
    )
    d = tmp_path / f"layout_{unit}"
    d.mkdir()
    pq.write_table(table, d / "events.parquet")
    return str(d)


EXPECT_NANOS = {
    1: 1709632800123456000,
    2: 1709638200654321000,
}


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_contract_is_layout_independent(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    e = W.events(spark, sf_dir)
    types = dict(e.dtypes)
    assert types["ts"] == "bigint"
    assert types["ts_ntz"] == "timestamp_ntz"
    got = {r["event_id"]: (r["ts"], r["ts_ntz"]) for r in e.collect()}
    for eid, nanos in EXPECT_NANOS.items():
        assert got[eid][0] == nanos, (unit, eid, got[eid][0])
        # ts_ntz is the µs wall clock of the same instant
        assert got[eid][1] == ROWS[eid - 1][1]
