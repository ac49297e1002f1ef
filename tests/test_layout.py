"""Zonemap / data-skipping layout audit (functions/layout.py)."""

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.layout import (
    equiwidth_zonemaps,
    skipping_audit,
)


@pytest.fixture(scope="module")
def facts(spark):
    # 100 rows, values 0..99, keys 0..99
    return spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, v double"
    )


class TestZonemaps:
    def test_range_layout_tight_disjoint_envelopes(self, facts):
        zm = {r.bucket: r for r in
              equiwidth_zonemaps(facts, "v", "k", 10, "range").collect()}
        assert len(zm) == 10
        for b, r in zm.items():
            assert r.n_rows == 10
            assert r.zmin == b * 10.0 and r.zmax == b * 10.0 + 9.0

    def test_max_value_clamps_into_last_bucket(self, facts):
        zm = equiwidth_zonemaps(facts, "v", "k", 10, "range")
        assert zm.agg(F.max("bucket")).collect()[0][0] == 9

    def test_hash_layout_smears_envelopes(self, facts):
        zm = equiwidth_zonemaps(facts, "v", "k", 10, "hash").collect()
        for r in zm:
            # every hash bucket spans nearly the whole domain
            assert r.zmax - r.zmin >= 90.0 and r.n_rows == 10

    def test_degenerate_constant_column_single_bucket(self, spark):
        df = spark.createDataFrame([(i, 5.0) for i in range(4)], "k long, v double")
        zm = equiwidth_zonemaps(df, "v", "k", 8, "range").collect()
        assert len(zm) == 1 and zm[0].bucket == 0 and zm[0].n_rows == 4

    def test_rejects_bad_args(self, facts):
        with pytest.raises(ValueError):
            equiwidth_zonemaps(facts, "v", "k", 0)
        with pytest.raises(ValueError):
            equiwidth_zonemaps(facts, "v", "k", 4, "zorder")

    def test_empty_or_all_null_value_column_raises_clearly(self, spark):
        # r8 ADVICE: the collected min/max row is (None, None) on an
        # empty input or an all-NULL value column — must be a clear
        # ValueError, not an opaque float(None) TypeError.
        empty = spark.createDataFrame([], "k long, v double")
        with pytest.raises(ValueError, match="empty input or all-NULL"):
            equiwidth_zonemaps(empty, "v", "k", 4, "range")
        nulls = spark.createDataFrame(
            [(1, None), (2, None)], "k long, v double"
        )
        with pytest.raises(ValueError, match="empty input or all-NULL"):
            equiwidth_zonemaps(nulls, "v", "k", 4, "range")


class TestSkippingAudit:
    def test_range_prunes_hash_does_not(self, facts):
        out = {
            r.pred_id: r
            for r in skipping_audit(
                facts, "v", "k", [(0.0, 9.0), (95.0, 99.0), (200.0, 300.0)],
                n_buckets=10,
            ).collect()
        }
        # narrow predicate: range layout scans 1 bucket, hash scans all
        p0 = out[0]
        assert p0.pruned_range == 0.9 and p0.scanned_rows_range == 10
        assert p0.pruned_hash == 0.0 and p0.scanned_rows_hash == 100
        # top-edge predicate (bucket 9 holds 90..99)
        p1 = out[1]
        assert p1.pruned_range == 0.9 and p1.scanned_rows_range == 10
        # out-of-domain predicate prunes EVERYTHING under range layout
        p2 = out[2]
        assert p2.pruned_range == 1.0 and p2.scanned_rows_range == 0
        assert p2.pruned_hash == 1.0 and p2.scanned_rows_hash == 0

    def test_pred_bounds_surface(self, facts):
        rows = skipping_audit(facts, "v", "k", [(3.0, 4.0)], 5).collect()
        assert rows[0].lo == 3.0 and rows[0].hi == 4.0

    def test_empty_predicates_rejected(self, facts):
        with pytest.raises(ValueError):
            skipping_audit(facts, "v", "k", [])
