"""Property-based checks of the round-8 operators (hypothesis) — the
diff-kernel strategy (tests/test_diff_property.py) applied to the new
surfaces: random inputs, a small Python model computes the expected
answer, any divergence is a real bug. Few, larger examples (Spark jobs
are slow per example; the value is randomized structure)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linz_bde_uploader_spark.functions.bloom import (
    BLOOM_MIX,
    BLOOM_MOD,
    BLOOM_STRIDE,
    bloom_probe_audit,
    bloom_prune,
)
from linz_bde_uploader_spark.functions.layout import skipping_audit
from linz_bde_uploader_spark.functions.linkage import (
    fuzzy_name_pairs,
    name_dictionary,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _positions(k, n_hashes, m_bits):
    km = k % BLOOM_MOD
    return [
        (km * (BLOOM_MIX + i * BLOOM_STRIDE) % BLOOM_MOD) % m_bits
        for i in range(n_hashes)
    ]


KEYSETS = st.sets(st.integers(min_value=0, max_value=5000), max_size=40)


@SLOW
@given(build=KEYSETS, probe=KEYSETS)
def test_bloom_never_false_negative_and_audit_consistent(
    spark, build, probe
):
    if not build or not probe:
        return
    b = spark.createDataFrame([(k,) for k in build], "k long")
    p = spark.createDataFrame([(k,) for k in probe], "k long")
    row = bloom_probe_audit(b, p, "k", "k", 3, 256).collect()[0]
    # model
    bits = set()
    for k in build:
        bits.update(_positions(k, 3, 256))
    maybe = {
        k for k in probe if all(x in bits for x in _positions(k, 3, 256))
    }
    true = probe & build
    assert true <= maybe                       # no false negatives, ever
    assert row.n_probe == len(probe)
    assert row.n_true == len(true)
    assert row.n_maybe == len(maybe)
    assert row.bits_set == len(bits)
    # prune keeps exactly the maybe-set
    kept = {
        r.k for r in bloom_prune(p, b, "k", "k", 3, 256).collect()
    }
    assert kept == maybe


NAME_TOKENS = st.lists(
    st.sampled_from(["red", "blue", "bolt", "gear", "ring", "ringo",
                     "bol", "gea", "redd"]),
    min_size=2, max_size=3,
)
NAMES = st.sets(st.builds(lambda ts: " ".join(ts), NAME_TOKENS),
                min_size=1, max_size=12)


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


@SLOW
@given(names=NAMES, max_dist=st.integers(min_value=0, max_value=3))
def test_fuzzy_pairs_match_blocked_brute_force(spark, names, max_dist):
    df = name_dictionary(
        spark.createDataFrame([(n,) for n in names], "name string"), "name"
    )
    got = {
        (r.name_a, r.name_b): r.dist
        for r in fuzzy_name_pairs(df, max_dist=max_dist).collect()
    }

    def blocks(n):
        t = n.split(" ")
        return {t[0], t[-1]}

    expect = {}
    ns = sorted(names)
    for i, a in enumerate(ns):
        for b in ns[i + 1:]:
            if blocks(a) & blocks(b) and _lev(a, b) <= max_dist:
                expect[(a, b)] = _lev(a, b)
    assert got == expect


VALUES = st.lists(
    st.floats(min_value=-1000, max_value=1000, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=2, max_size=60,
)


@SLOW
@given(vals=VALUES, nb=st.integers(min_value=1, max_value=16))
def test_zonemap_audit_sound_and_complete(spark, vals, nb):
    """Soundness: a pruned unit can contain no matching row (scanned
    rows of the range layout always cover the true matches); the
    out-of-domain predicate prunes everything."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "k long, v double"
    )
    lo, hi = min(vals), max(vals)
    width = (hi - lo) / 3 if hi > lo else 1.0
    preds = [
        (lo, lo + width),
        (hi - width, hi),
        (hi + 1000.0, hi + 2000.0),   # out of domain
    ]
    out = {r.pred_id: r for r in
           skipping_audit(df, "v", "k", preds, n_buckets=nb).collect()}
    for pid, (plo, phi) in enumerate(preds):
        truth = sum(1 for v in vals if plo <= v <= phi)
        r = out[pid]
        assert r.scanned_rows_range >= truth
        assert r.scanned_rows_hash >= truth
    assert out[2].pruned_range == 1.0 and out[2].scanned_rows_range == 0
