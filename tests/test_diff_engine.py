"""The diff/merge kernel against the reference's own e2e scenario shape
(t/linz_bde_uploader.t:1164-1221: level-5 merge with exact I/U/D/nullU
counters and exact post-state) — re-created with original data."""

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.operators.diff import (
    ACTION_COL,
    apply_changes,
    classify_incremental_changes,
    full_table_diff,
    keyswap_repair,
    level0_replace,
    merge_stats,
)

COLS = ["line_id", "seq", "ref_id", "flipped", "audit_id"]


@pytest.fixture(scope="module")
def scenario(spark):
    # current table state (3 rows, key = audit_id)
    current = spark.createDataFrame(
        [
            (9001, 1, 501, "Y", 71001),
            (9002, 2, 502, "N", 71002),
            (9003, 3, 503, "Y", 71003),
        ],
        COLS,
    )
    # incoming snapshot: 71003 gone, 71001 seq changed, 71002 unchanged
    # (declared U but actually a null update), two new keys 71100/71101
    incoming = spark.createDataFrame(
        [
            (9001, 10, 501, "Y", 71001),
            (9002, 2, 502, "N", 71002),
            (9100, 4, 601, "N", 71100),
            (9101, 5, 602, "Y", 71101),
        ],
        COLS,
    )
    change_keys = spark.createDataFrame(
        [(71003,), (71100,), (71101,), (71001,), (71002,)], ["audit_id"]
    )
    return current, incoming, change_keys


def test_classification(spark, scenario):
    current, incoming, change_keys = scenario
    actions = classify_incremental_changes(current, incoming, change_keys, "audit_id")
    acts = {r.audit_id: r[ACTION_COL] for r in actions.collect()}
    assert acts == {
        71003: "D",
        71100: "I",
        71101: "I",
        71001: "U",
        71002: "0",  # declared U, data identical → null update
    }


def test_merge_stats_and_apply(spark, scenario):
    current, incoming, change_keys = scenario
    actions = classify_incremental_changes(current, incoming, change_keys, "audit_id")
    stats = merge_stats(actions)
    assert (stats.ninsert, stats.nupdate, stats.nnullupdate, stats.ndelete) == (2, 1, 1, 1)

    merged = apply_changes(current, incoming, actions, "audit_id")
    rows = {r.audit_id: r for r in merged.collect()}
    assert set(rows) == {71001, 71002, 71100, 71101}
    assert rows[71001].seq == 10            # updated
    assert rows[71002].seq == 2             # untouched null-update
    assert rows[71100].line_id == 9100      # inserted


def test_keyswap_classification(spark):
    # key changed 71005→71055 while unique column line_id stays 9005:
    # the OLD key must join the change set (J4) and the new key classifies X
    current = spark.createDataFrame(
        [(9005, 1, 505, "Y", 71005), (9006, 2, 506, "N", 71006)], COLS
    )
    incoming = spark.createDataFrame(
        [(9005, 1, 505, "Y", 71055), (9006, 2, 506, "N", 71006)], COLS
    )
    change_keys = spark.createDataFrame([(71055,)], ["audit_id"])

    extra = keyswap_repair(current, incoming, change_keys, "audit_id", ["line_id"])
    assert [r.audit_id for r in extra.collect()] == [71005]

    full_keys = change_keys.unionByName(extra)
    actions = classify_incremental_changes(
        current, incoming, full_keys, "audit_id", unique_cols=["line_id"]
    )
    acts = {r.audit_id: r[ACTION_COL] for r in actions.collect()}
    assert acts == {71005: "D", 71055: "I"}

    merged = apply_changes(current, incoming, actions, "audit_id")
    keys = {r.audit_id for r in merged.collect()}
    assert keys == {71055, 71006}


def test_unique_col_differs_is_X(spark):
    # same key, but a unique-constraint column changed → 'X' (delete+insert)
    current = spark.createDataFrame([(9005, 1, 505, "Y", 71005)], COLS)
    incoming = spark.createDataFrame([(9505, 1, 505, "Y", 71005)], COLS)
    change_keys = spark.createDataFrame([(71005,)], ["audit_id"])
    actions = classify_incremental_changes(
        current, incoming, change_keys, "audit_id", unique_cols=["line_id"]
    )
    acts = {r.audit_id: r[ACTION_COL] for r in actions.collect()}
    assert acts == {71005: "X"}
    stats = merge_stats(actions)
    assert stats.nupdate == 1  # X counts as an update in upload_stats
    merged = apply_changes(current, incoming, actions, "audit_id")
    assert merged.collect()[0].line_id == 9505


def test_null_safe_compare(spark):
    # NULL == NULL must compare equal (IS NOT DISTINCT FROM semantics)
    schema = "line_id int, seq int, ref_id int, flipped string, audit_id int"
    current = spark.createDataFrame([(None, 1, None, "Y", 71001)], schema)
    incoming = spark.createDataFrame([(None, 1, None, "Y", 71001)], schema)
    change_keys = spark.createDataFrame([(71001,)], ["audit_id"])
    actions = classify_incremental_changes(current, incoming, change_keys, "audit_id")
    assert actions.collect()[0][ACTION_COL] == "0"
    # NULL vs value must differ
    incoming2 = spark.createDataFrame([(None, 1, 7, "Y", 71001)], schema)
    actions2 = classify_incremental_changes(current, incoming2, change_keys, "audit_id")
    assert actions2.collect()[0][ACTION_COL] == "U"


def test_full_table_diff(spark, scenario):
    current, incoming, _ = scenario
    diff = full_table_diff(current, incoming, "audit_id")
    acts = {r.audit_id: r[ACTION_COL] for r in diff.collect()}
    # 71002 unchanged → excluded entirely
    assert acts == {71003: "D", 71001: "U", 71100: "I", 71101: "I"}
    merged = apply_changes(current, incoming, diff, "audit_id")
    assert merged.count() == 4


def test_level0_replace(spark, scenario):
    _, incoming, _ = scenario
    out, stats = level0_replace(incoming)
    assert stats.ninsert == 4 and stats.ndelete == 0
    assert out.count() == 4


def test_declared_actions_are_advisory(spark, scenario):
    # a key declared 'I' that already exists with identical data must
    # classify '0', not insert a duplicate (reference recomputes actions)
    current, _, _ = scenario
    change_keys = spark.createDataFrame([(71001,)], ["audit_id"])
    actions = classify_incremental_changes(current, current, change_keys, "audit_id")
    assert actions.collect()[0][ACTION_COL] == "0"
    merged = apply_changes(current, current, actions, "audit_id")
    assert merged.count() == current.count()


def test_key_validity_gate(spark, tmp_path):
    """Reference key gate (sql/02-bde_control_functions.sql.in:2839-2877):
    single integral column; with check_unique also NOT NULL + unique. The
    sink's incremental paths enforce the schema half before any job."""
    from linz_bde_uploader_spark.operators.diff import (
        KeyValidityError,
        validate_key_column,
    )
    from linz_bde_uploader_spark.sinks.target import ParquetTarget

    good = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    validate_key_column(good, "id")                      # integral: ok
    validate_key_column(good, "id", check_unique=True)   # unique + not null

    import pytest as _pt
    with _pt.raises(KeyValidityError, match="not present"):
        validate_key_column(good, "nope")
    with _pt.raises(KeyValidityError, match="integral"):
        validate_key_column(good, "v")
    dupes = spark.createDataFrame([(1,), (1,)], "id long")
    with _pt.raises(KeyValidityError, match="duplicate"):
        validate_key_column(dupes, "id", check_unique=True)
    nulls = spark.createDataFrame([(1,), (None,)], "id long")
    with _pt.raises(KeyValidityError, match="NULL"):
        validate_key_column(nulls, "id", check_unique=True)

    # the sink refuses a non-integral key before running any job
    tgt = ParquetTarget(str(tmp_path / "t"), key="v")
    tgt.replace(good)
    with _pt.raises(KeyValidityError, match="integral"):
        tgt.stage_incremental(
            spark, good, spark.createDataFrame([("a",)], "v string")
        )
