"""Property-based checks (hypothesis) for the round-5 numeric operators:
int8 quantization error bounds and the driver/Spark twin agreement, ES
weighted-sampling determinism, and BPE encode monotonicity. Pure-Python
models run per example; one Spark cross-check runs on a fixed corpus
(per-example Spark jobs would swamp the suite)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linz_bde_uploader_spark.functions.similarity import quantize_vector

FINITE = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
VEC = st.lists(FINITE, min_size=1, max_size=32)


@settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])
@given(VEC)
def test_quantize_vector_error_bound_and_range(v):
    q = quantize_vector(v)
    assert len(q) == len(v)
    s = max(abs(float(x)) for x in v) / 127.0
    if s == 0.0:
        assert q == [0] * len(v)
        return
    for x, qi in zip(v, q):
        # int8 range and round-half-away reconstruction bound
        assert -127 <= qi <= 127
        assert abs(qi * s - float(x)) <= s / 2 + 1e-9 * abs(x)


@settings(max_examples=100, suppress_health_check=[HealthCheck.too_slow])
@given(VEC)
def test_quantize_vector_scale_invariant_direction(v):
    # quantization commutes with positive scaling (cosine relies on it)
    if max(abs(float(x)) for x in v) == 0.0:
        return
    assert quantize_vector(v) == quantize_vector([x * 3.0 for x in v])


@settings(max_examples=100, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=1000),
        st.integers(min_value=1, max_value=1000),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=10),
)
def test_es_key_model_total_order(weights, n):
    # pure-Python model of sampling.es_key: deterministic, and scaling
    # every weight by a constant preserves the selection (exact keys —
    # the production 6-dp rounding only exists to absorb engine ulps)
    def key(i, w):
        u = ((i * 2654435761) % 2147483647 + 1) / 2147483648.0
        return math.log(u) / w

    ranked = sorted(weights, key=lambda i: (-key(i, weights[i]), i))
    ranked2 = sorted(weights, key=lambda i: (-key(i, weights[i] * 8), i))
    assert ranked[:n] == ranked2[:n]


def test_bpe_encode_monotone_under_merges(spark):
    # each applied merge can only reduce (or keep) every doc's symbol
    # count, and 0 merges == character count
    from linz_bde_uploader_spark.functions.text import bpe_encode, bpe_train

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["abab", "aabb", "banana", "xyzzy", "aaaa"]
        )],
        "doc_id long, text string",
    )
    table = bpe_train(d, "text", n_merges=3)
    merges = [(r["lhs"], r["rhs"]) for r in table.orderBy("step").collect()]
    prev = {r.doc_id: r.n_syms for r in bpe_encode(d, []).collect()}
    assert prev == {0: 4, 1: 4, 2: 6, 3: 5, 4: 4}
    for upto in range(1, len(merges) + 1):
        cur = {r.doc_id: r.n_syms
               for r in bpe_encode(d, merges[:upto]).collect()}
        assert all(cur[k] <= prev[k] for k in prev)
        prev = cur
