"""Bloom filter build/probe/audit (functions/bloom.py)."""

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.bloom import (
    BLOOM_MIX,
    BLOOM_MOD,
    BLOOM_STRIDE,
    bloom_bit_positions,
    bloom_build,
    bloom_probe_audit,
    bloom_prune,
)


def _positions(k, n_hashes, m_bits):
    km = k % BLOOM_MOD
    return [
        (km * (BLOOM_MIX + i * BLOOM_STRIDE) % BLOOM_MOD) % m_bits
        for i in range(n_hashes)
    ]


def test_bit_positions_match_python_twin(spark):
    df = spark.createDataFrame([(7,), (123456789,), (0,)], "k long")
    got = {
        r.k: r.pos
        for r in df.select(
            "k", bloom_bit_positions(F.col("k"), 3, 512).alias("pos")
        ).collect()
    }
    for k in (7, 123456789, 0):
        assert got[k] == _positions(k, 3, 512)


def test_build_is_distinct_and_bounded(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(100)], "k long")
    bits = bloom_build(df, "k", n_hashes=3, m_bits=64).collect()
    vals = [r.bit for r in bits]
    assert len(vals) == len(set(vals)) <= 15  # <= 5 keys * 3 bits
    assert all(0 <= v < 64 for v in vals)


class TestProbeAudit:
    def test_no_false_negatives_and_exact_counts(self, spark):
        build = spark.createDataFrame([(i,) for i in range(50)], "k long")
        probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
        row = bloom_probe_audit(build, probe, "k", "k", 3, 4096).collect()[0]
        assert row.n_probe == 100 and row.n_true == 50
        assert row.n_maybe >= row.n_true          # no false negatives
        assert row.false_positives == row.n_maybe - row.n_true
        # python twin for n_maybe
        bits = set()
        for i in range(50):
            bits.update(_positions(i, 3, 4096))
        maybe = sum(
            1 for i in range(100)
            if all(p in bits for p in _positions(i, 3, 4096))
        )
        assert row.n_maybe == maybe
        assert row.bits_set == len(bits)
        assert row.fill_ratio == round(len(bits) / 4096, 4)

    def test_saturated_filter_passes_everything(self, spark):
        build = spark.createDataFrame([(i,) for i in range(500)], "k long")
        probe = spark.createDataFrame(
            [(i,) for i in range(500, 600)], "k long"
        )
        # m=8 saturates: every probe key false-positives
        row = bloom_probe_audit(build, probe, "k", "k", 2, 8).collect()[0]
        assert row.fill_ratio == 1.0
        assert row.n_maybe == 100 and row.n_true == 0
        assert row.fp_rate == 1.0


def test_prune_keeps_all_true_members(spark):
    build = spark.createDataFrame([(i,) for i in range(0, 40, 2)], "k long")
    big = spark.createDataFrame(
        [(i, f"row{i}") for i in range(40)], "k long, payload string"
    )
    pruned = bloom_prune(big, build, "k", "k", 3, 1024)
    kept = {r.k for r in pruned.collect()}
    assert set(range(0, 40, 2)) <= kept          # no false negatives
    assert len(kept) <= 40
    # survivors are exactly the maybe-set of the audit arithmetic
    bits = set()
    for i in range(0, 40, 2):
        bits.update(_positions(i, 3, 1024))
    expect = {
        i for i in range(40)
        if all(p in bits for p in _positions(i, 3, 1024))
    }
    assert kept == expect


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_hashes=0)
    with pytest.raises(ValueError):
        bloom_build(df, "k", m_bits=0)
