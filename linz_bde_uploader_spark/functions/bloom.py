"""Bloom-filter build/probe with a measured false-positive audit — the
runtime-filter primitive behind semi-join pruning at scale.

A 100-TB join's cheapest optimization is not joining: build a compact
membership filter over the small side's keys, ship it to the big side's
scan, and drop probe rows whose keys cannot be present before any
shuffle (Spark's own `spark.sql.optimizer.runtimeFilter.bloomFilter` /
Iceberg's bloom columns do exactly this). This module makes the filter
an AUDITABLE artifact instead of an engine internal:

- :func:`bloom_bit_positions` — the k deterministic bit positions of a
  key (pure integer mixing, identical in any engine — no engine-private
  hash, so the oracle replays it bit-for-bit);
- :func:`bloom_build` — the set-bit table of the build side (a Bloom
  filter materialized RELATIONALLY: one row per set bit, bounded by
  ``m_bits`` — the form that broadcasts);
- :func:`bloom_probe_audit` — probes a key set and scores the filter
  against exact membership: fill ratio, false-positive rate, and the
  rows a bloom-pruned scan would still read. The FP rate decides
  whether ``m_bits``/``n_hashes`` are worth their broadcast bytes
  BEFORE the 100-TB run.

Scale: build = one map-side explode of k positions + a distinct
bounded by ``m_bits``. Probe = dictionary-first (distinct probe keys
only), one explode + broadcast equi-join on bit position + a per-key
count — no BNLJ, nothing quadratic; the exact-membership check used
for scoring is a semi-join of the two key dictionaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: same modulus the engine's other deterministic hashes use (< 2^31 so
#: the mix product stays below 2^63 — no silent wrap, no ANSI overflow).
BLOOM_MOD = 2_147_483_647
#: base multiplier (Knuth) and per-hash odd stride for the k hash family.
BLOOM_MIX = 2_654_435_761
BLOOM_STRIDE = 40_503


def bloom_bit_positions(key: Column, n_hashes: int, m_bits: int) -> Column:
    """Array of the ``n_hashes`` bit positions of an integer key:
    ``h_i(k) = ((k mod M) · (MIX + i·STRIDE) mod M) mod m_bits`` —
    pure integer Column arithmetic, map-only, engine-portable."""
    k = F.pmod(key.cast("long"), F.lit(BLOOM_MOD))
    return F.array(
        *[
            F.pmod(
                F.pmod(k * F.lit(BLOOM_MIX + i * BLOOM_STRIDE),
                       F.lit(BLOOM_MOD)),
                F.lit(m_bits),
            )
            for i in range(n_hashes)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str, n_hashes: int = 3, m_bits: int = 4096
) -> DataFrame:
    """The set-bit table ``(bit,)`` of a Bloom filter over ``df``'s
    keys — at most ``m_bits`` rows regardless of build cardinality,
    the broadcastable relational form of the filter."""
    if n_hashes <= 0 or m_bits <= 0:
        raise ValueError("n_hashes and m_bits must be positive")
    return (
        df.select(
            F.explode(
                bloom_bit_positions(F.col(key_col), n_hashes, m_bits)
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe_audit(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
    n_hashes: int = 3,
    m_bits: int = 4096,
) -> DataFrame:
    """Score the Bloom filter of ``build``'s keys against a probe key
    set. One row:

    ``(m_bits, n_hashes, bits_set, fill_ratio, n_probe, n_true,
    n_maybe, false_positives, fp_rate)``

    where ``n_maybe`` counts probe keys whose every bit is set (the
    keys a bloom-pruned scan still reads), ``n_true`` the exactly-
    present keys, ``false_positives = n_maybe - n_true`` and
    ``fp_rate = false_positives / max(n_probe - n_true, 1)`` (the FP
    rate over keys that COULD false-positive), both at 4 dp. A Bloom
    filter has no false negatives — the audit's invariant
    ``n_maybe >= n_true`` holds by construction.
    """
    bits = bloom_build(build, build_key, n_hashes, m_bits)
    pkeys = probe.select(F.col(probe_key).alias("_k")).distinct()
    bkeys = build.select(F.col(build_key).alias("_k")).distinct()
    probed = pkeys.select(
        "_k",
        F.explode(
            F.array_distinct(
                bloom_bit_positions(F.col("_k"), n_hashes, m_bits)
            )
        ).alias("bit"),
        F.size(
            F.array_distinct(
                bloom_bit_positions(F.col("_k"), n_hashes, m_bits)
            )
        ).alias("_need"),
    )
    hits = (
        probed.join(F.broadcast(bits.withColumn("_hit", F.lit(1))), "bit",
                    "left")
        .groupBy("_k", "_need")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("_got"))
        .withColumn("_maybe", (F.col("_got") == F.col("_need")).cast("long"))
    )
    truth = hits.join(
        bkeys.withColumn("_true", F.lit(1)), "_k", "left"
    ).withColumn("_true", F.coalesce(F.col("_true"), F.lit(0)).cast("long"))
    # one aggregate over the tagged union of probe rows and set-bit
    # rows — folds bits_set into the same pass instead of cross-joining
    # two one-row aggregates (which would compile to a BNLJ)
    u = truth.select(
        "_true", "_maybe", F.lit(0).cast("long").alias("_isbit")
    ).unionByName(
        bits.select(
            F.lit(0).cast("long").alias("_true"),
            F.lit(0).cast("long").alias("_maybe"),
            F.lit(1).cast("long").alias("_isbit"),
        )
    )
    agg = u.agg(
        F.sum(F.lit(1) - F.col("_isbit")).cast("long").alias("n_probe"),
        F.sum("_true").cast("long").alias("n_true"),
        F.sum("_maybe").cast("long").alias("n_maybe"),
        F.sum("_isbit").cast("long").alias("bits_set"),
    )
    return (
        agg
        .select(
            F.lit(m_bits).cast("long").alias("m_bits"),
            F.lit(n_hashes).cast("long").alias("n_hashes"),
            "bits_set",
            F.round(F.col("bits_set") / F.lit(float(m_bits)), 4).alias(
                "fill_ratio"
            ),
            "n_probe",
            "n_true",
            "n_maybe",
            (F.col("n_maybe") - F.col("n_true")).alias("false_positives"),
            F.round(
                (F.col("n_maybe") - F.col("n_true"))
                / F.greatest(F.col("n_probe") - F.col("n_true"), F.lit(1)),
                4,
            ).alias("fp_rate"),
        )
    )


def bloom_prune(
    big: DataFrame,
    build: DataFrame,
    big_key: str,
    build_key: str,
    n_hashes: int = 3,
    m_bits: int = 4096,
) -> DataFrame:
    """Pre-filter ``big`` to rows whose key MIGHT be in ``build`` — the
    runtime-filter application: every surviving row's key has all k
    bits set (false positives pass, true members never drop), so a
    following exact join sees a fraction of the input. One map-side
    position explode + a broadcast bit join + a per-row count."""
    bits = bloom_build(build, build_key, n_hashes, m_bits)
    pos = big.select(
        F.col(big_key).alias("_k"),
        F.array_distinct(
            bloom_bit_positions(F.col(big_key), n_hashes, m_bits)
        ).alias("_pos"),
    ).distinct()
    need = pos.select(
        "_k", F.explode("_pos").alias("bit"), F.size("_pos").alias("_need")
    )
    keep = (
        need.join(F.broadcast(bits), "bit")
        .groupBy("_k", "_need")
        .agg(F.count(F.lit(1)).alias("_got"))
        .filter(F.col("_got") == F.col("_need"))
        .select(F.col("_k").alias(big_key))
    )
    return big.join(keep, [big_key], "left_semi")
