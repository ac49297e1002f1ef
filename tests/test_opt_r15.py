"""Focused tests for round-15 optimization changes (internals only —
every declared query's results are pinned by the oracle sweep)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from linz_bde_uploader_spark.plans import workload as W


class TestScanSplits:
    def test_single_row_group_small_file(self, tmp_path):
        p = str(tmp_path / "one.parquet")
        pq.write_table(pa.table({"x": list(range(1000))}), p)
        W._SCAN_SPLITS.pop(p, None)
        assert W._scan_splits(p) == 1

    def test_row_groups_bound_splits(self, tmp_path):
        p = str(tmp_path / "rg.parquet")
        pq.write_table(pa.table({"x": list(range(1000))}), p,
                       row_group_size=100)
        W._SCAN_SPLITS.pop(p, None)
        # 10 row groups but one byte-range split: still 1 effective task
        assert W._scan_splits(p) == 1
        # with a tiny split size, splits are capped by the row-group count
        W._SCAN_SPLITS.pop(p, None)
        assert W._scan_splits(p, max_split_bytes=64) == 10

    def test_directory_layout(self, tmp_path):
        # Spark-written tables are DIRECTORIES of part files (the test
        # fixtures' layout); bytes and row groups sum across parts.
        d = tmp_path / "dir.parquet"
        d.mkdir()
        pq.write_table(pa.table({"x": list(range(500))}),
                       str(d / "part-0.parquet"), row_group_size=100)
        pq.write_table(pa.table({"x": list(range(500))}),
                       str(d / "part-1.parquet"), row_group_size=100)
        (d / "_SUCCESS").write_text("")  # non-parquet marker is skipped
        p = str(d)
        W._SCAN_SPLITS.pop(p, None)
        assert W._scan_splits(p) == 1
        W._SCAN_SPLITS.pop(p, None)
        # tiny split size: capped by the 10 row groups across both parts
        assert W._scan_splits(p, max_split_bytes=64) == 10

    def test_memo_column_identity_and_parity(self, spark):
        from pyspark.sql import functions as F

        from linz_bde_uploader_spark.caching import memo_column
        from linz_bde_uploader_spark.functions import text as X

        # same key -> the SAME Column object (one construction)
        a = memo_column(("t_memo", "text"), lambda: F.upper(F.col("text")))
        b = memo_column(("t_memo", "text"), lambda: F.upper(F.col("text")))
        assert a is b
        # memoized gate trees evaluate identically to fresh construction,
        # including when one memoized tree is embedded TWICE in one plan
        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over a lazy dog")],
            "doc_id long, text string",
        )
        memo = df.select(
            X.fingerprint("text").alias("f1"),
            X.fingerprint("text").alias("f2"),
            X.gopher_pass("text").alias("g"),
            X.quality_score("text").alias("q"),
        ).first()
        fresh = df.select(
            X.fingerprint(F.col("text")).alias("f1"),
            X.gopher_pass(F.col("text")).alias("g"),
            X.quality_score(F.col("text")).alias("q"),
        ).first()
        assert memo.f1 == memo.f2 == fresh.f1
        assert memo.g == fresh.g and memo.q == fresh.q

    def test_memoized(self, tmp_path):
        p = str(tmp_path / "memo.parquet")
        pq.write_table(pa.table({"x": [1, 2, 3]}), p)
        W._SCAN_SPLITS.pop(p, None)
        first = W._scan_splits(p)
        os.remove(p)  # a second call must not re-read the footer
        assert W._scan_splits(p) == first

    def test_pinned_schema_matches_inferred(self, spark, tmp_path):
        p = str(tmp_path / "s.parquet")
        pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), p)
        inferred = spark.read.parquet(p).schema
        pinned = W._pinned_reader(spark, p).parquet(p)
        assert pinned.schema == inferred
        assert [tuple(r) for r in pinned.orderBy("a").collect()] == [
            (1, "x"), (2, "y")]

    def test_pinned_schema_keyed_by_nanos_conf(self, spark, tmp_path):
        # the memo key includes the nanosAsLong conf so the events
        # table's two layouts can never cross-contaminate
        p = str(tmp_path / "k.parquet")
        pq.write_table(pa.table({"a": [1]}), p)
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong",
                              "false")
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            W._pinned_reader(spark, p)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
            W._pinned_reader(spark, p)
            assert (p, "true") in W._SCHEMAS and (p, "false") in W._SCHEMAS
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)

    def test_load_still_fans_out_documents(self, spark):
        # the repartition decision must match the old .rdd-based one for
        # the real fixtures: a sub-128MB single file fans out to cores
        sf_dir = "/root/testdata/sf0.001"
        if not os.path.exists(f"{sf_dir}/documents.parquet"):
            pytest.skip("fixtures absent")
        df = W.load(spark, sf_dir, "documents")
        par = spark.sparkContext.defaultParallelism
        assert df.rdd.getNumPartitions() == par
