"""Property-based checks (hypothesis) for the round-6 operators: the
classifier weight model, the shuffle-key permutation, negative-sampling
invariants, BM25 monotonicity, and trigram-LM probability bounds. Pure
Python twins of the Column arithmetic run per example (the Spark side is
pinned to these twins by the unit/oracle tests)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linz_bde_uploader_spark.functions.text import HASH_MIX, HASH_MOD, QC_DIM

IDS = st.integers(min_value=-(2**62), max_value=2**62)
TOK = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1, max_size=12,
)


def _shuffle_key(i: int, salt: int = 0) -> int:
    return ((i + salt) % HASH_MOD) * HASH_MIX % HASH_MOD


@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
@given(IDS, st.integers(min_value=0, max_value=1000))
def test_shuffle_key_always_valid_bucket(i, salt):
    # Python % on negatives is already pmod-like (sign of divisor), the
    # semantics the Spark side reproduces with F.pmod
    k = _shuffle_key(i, salt)
    assert 0 <= k < HASH_MOD


@settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(min_value=2, max_value=10_000),
       st.integers(min_value=0, max_value=2**40),
       st.integers(min_value=0, max_value=7),
       st.integers(min_value=0, max_value=100))
def test_negative_sample_never_self_in_range(n, base_id, j, salt):
    i = base_id % n
    mix = ((i + salt + j * 131) % HASH_MOD) * HASH_MIX % HASH_MOD
    neg = (i + 1 + mix % (n - 1)) % n
    assert 0 <= neg < n
    assert neg != i


@settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(TOK, min_size=1, max_size=50))
def test_classifier_weight_model_bounds(toks):
    # per-token weights in [-0.5, 0.5); doc logit = 4 * mean is in
    # [-2, 2); sigmoid therefore in (0.12, 0.88) — the gate can always
    # be thresholded from both sides
    ws = []
    for t in toks:
        tv = (len(t) * 17 + ord(t[0]) * 31) % HASH_MOD
        j = tv % QC_DIM
        w = ((j + 1) * HASH_MIX % HASH_MOD) / HASH_MOD - 0.5
        assert -0.5 <= w < 0.5
        ws.append(w)
    logit = 4.0 * (sum(ws) / len(ws))
    prob = 1.0 / (1.0 + math.exp(-logit))
    assert -2.0 <= logit < 2.0
    assert 0.11 < prob < 0.89


def _bm25_term(tf: int, dl: int, avgdl: float, n: int, df: int,
               k1: float = 1.2, b: float = 0.75) -> float:
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)
                  / (tf + k1 * (1 - b + b * dl / avgdl)))


@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(min_value=0, max_value=500),
       st.integers(min_value=1, max_value=1000),
       st.integers(min_value=1, max_value=10_000))
def test_bm25_monotone_in_tf_and_bounded(tf, dl, n):
    df = max(1, n // 10)
    avgdl = 100.0
    s = _bm25_term(tf, dl, avgdl, n, df)
    s_more = _bm25_term(tf + 1, dl, avgdl, n, df)
    assert s >= 0
    assert s_more > s  # strictly increasing in tf
    # saturation: never exceeds idf * (k1 + 1)
    assert s <= math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 2.2 + 1e-12


@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(min_value=0, max_value=100),
       st.integers(min_value=0, max_value=100),
       st.integers(min_value=0, max_value=1000),
       st.integers(min_value=0, max_value=1000),
       st.integers(min_value=1, max_value=10**6),
       st.integers(min_value=1, max_value=10**5))
def test_trigram_interpolated_p_in_unit_interval(tri, bi12, bi23, uni2,
                                                 total, vocab):
    # counts constrained to be consistent: tri <= bi12, bi23 <= uni2
    bi12 = max(bi12, tri)
    uni2 = max(uni2, bi23)
    uni3 = min(vocab, total)
    ml3 = tri / bi12 if bi12 > 0 else 0.0
    ml2 = bi23 / uni2 if uni2 > 0 else 0.0
    p = 0.6 * ml3 + 0.3 * ml2 + 0.1 * ((uni3 + 1.0) / (total + vocab))
    assert 0.0 < p <= 1.0 + 1e-12


@settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=200, unique=True))
def test_shuffle_is_permutation_over_arbitrary_ids(ids):
    # the (shard, rank-in-shard by (key, id)) pairs are unique and
    # contiguous per shard — a total order, even with collisions,
    # negative ids, or non-dense id spaces
    n_shards = 8
    keyed = sorted(((_shuffle_key(i) % n_shards, _shuffle_key(i), i)
                    for i in ids))
    pos, seen = {}, {}
    for shard, key, i in keyed:
        pos[i] = (shard, seen.get(shard, 0))
        seen[shard] = seen.get(shard, 0) + 1
    assert len(pos) == len(ids)
    assert len(set(pos.values())) == len(ids)


@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=1, max_value=500),
                min_size=1, max_size=40))
def test_entropy_identity_matches_direct_form(counts):
    # token_entropy computes H = ln n - (1/n) sum c ln c (the
    # aggregation-friendly form); it must equal -sum p ln p exactly
    n = sum(counts)
    viaid = math.log(n) - sum(c * math.log(c) for c in counts) / n
    direct = -sum((c / n) * math.log(c / n) for c in counts)
    assert abs(viaid - direct) < 1e-9
    assert -1e-12 <= viaid <= math.log(len(counts)) + 1e-9


@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(TOK, min_size=1, max_size=30), st.integers(0, 3))
def test_dsir_bucket_and_fixed_point_bounds(toks, dim_pow):
    # the DSIR feature bucket is always in [0, dim); the fixed-point
    # log-ratio stays well inside int64 for any count split
    dim = 64 << dim_pow
    for t in toks:
        tv = (len(t) * 17 + ord(t[0]) * 31) % HASH_MOD
        assert 0 <= tv % dim < dim
    # extreme smoothed ratio: 1 target hit among huge raw mass
    lam = (math.log((1 + 1.0) / (1 + dim))
           - math.log((10**12 + 1.0) / (10**12 + dim))) * 1_000_000
    assert abs(lam) < 2**62


@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(min_value=1, max_value=1000),
       st.integers(min_value=1, max_value=1000),
       st.integers(min_value=1, max_value=200))
def test_rrf_contribution_monotone_and_bounded(r1, r2, k):
    # a better (smaller) rank must contribute strictly more, and any
    # single-ranker score is bounded by 1/(k+1)
    c1, c2 = 1.0 / (k + r1), 1.0 / (k + r2)
    if r1 < r2:
        assert c1 > c2
    assert 0 < c1 <= 1.0 / (k + 1)


@settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.floats(min_value=0.0, max_value=1.0,
                          allow_nan=False), min_size=1, max_size=50))
def test_overlap_fixed_point_mean_is_order_free_and_bounded(js):
    # source_overlap_matrix's 1e-6 fixed-point mean: permutation-proof
    # (integer sum) and within the jaccard bounds
    import random

    fixed = sum(round(j * 1_000_000) for j in js)
    mean = round((fixed / 1_000_000.0) / len(js), 6)
    shuffled = js[:]
    random.Random(0).shuffle(shuffled)
    fixed2 = sum(round(j * 1_000_000) for j in shuffled)
    assert fixed == fixed2
    assert -1e-6 <= mean <= 1.0 + 1e-6
