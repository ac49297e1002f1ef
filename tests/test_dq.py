"""Data-quality audit primitives (functions/dq.py)."""

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.dq import (
    check_row,
    dq_audit,
    fk_check,
    null_check,
    range_check,
)


class TestChecks:
    def test_null_and_range(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0), (2, None), (3, -5.0), (4, 99.0)],
            "id long, v double",
        )
        n = null_check("v_null", df, "v").collect()[0]
        assert (n.check, n.n_rows, n.n_bad, n.bad_rate) == ("v_null", 4, 1, 0.25)
        r = range_check("v_range", df, "v", 0.0, 50.0).collect()[0]
        # NULL counts as a range violation too (documented), plus -5 and 99
        assert (r.n_bad, r.bad_rate) == (3, 0.75)

    def test_fk_orphans_exclude_null_keys(self, spark):
        child = spark.createDataFrame(
            [(1, 10), (2, 99), (3, None), (4, 10)], "id long, fk long"
        )
        parent = spark.createDataFrame([(10,), (20,)], "pk long")
        row = fk_check("fk", child, "fk", parent, "pk").collect()[0]
        # 99 is the only orphan; NULL is the null_check's finding
        assert (row.n_rows, row.n_bad, row.bad_rate) == (4, 1, 0.25)

    def test_empty_table_rate_zero(self, spark):
        df = spark.createDataFrame([], "id long, v double")
        row = null_check("v_null", df, "v").collect()[0]
        assert (row.n_rows, row.n_bad, row.bad_rate) == (0, 0, 0.0)

    def test_audit_union_and_custom_predicate(self, spark):
        docs = spark.createDataFrame(
            [(1, "abc", 3), (2, "xy", 5)], "id long, text string, n long"
        )
        out = {
            r.check: r
            for r in dq_audit(
                [
                    null_check("text_null", docs, "text"),
                    check_row(
                        "n_matches_len", docs,
                        F.length("text") != F.col("n"),
                    ),
                ]
            ).collect()
        }
        assert out["text_null"].n_bad == 0
        assert out["n_matches_len"].n_bad == 1  # doc 2 claims 5, len 2
        with pytest.raises(ValueError):
            dq_audit([])

    def test_null_evaluating_predicate_is_bad_by_default(self, spark):
        # r8 ADVICE: length(text) != n is NULL when either side is NULL
        # — the default must flag it (a row the check cannot vouch for
        # is a finding), with null_is_bad=False as the explicit opt-out.
        docs = spark.createDataFrame(
            [(1, "abc", 3), (2, None, 3), (3, "xy", None)],
            "id long, text string, n long",
        )
        bad = F.length("text") != F.col("n")
        strict = check_row("c", docs, bad).collect()[0]
        assert (strict.n_rows, strict.n_bad) == (3, 2)  # both NULL rows
        lax = check_row("c", docs, bad, null_is_bad=False).collect()[0]
        assert (lax.n_rows, lax.n_bad) == (3, 0)
