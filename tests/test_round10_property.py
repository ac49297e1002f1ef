"""Property-based checks of the round-10 ExactSubstr family
(hypothesis): random documents with an INJECTED shared span — the
operator must (a) be SOUND: every reported span occurs verbatim at
BOTH claimed offsets, and (b) RECALL the injected span between its two
host documents; and the apply face must remove exactly the reported
later-occurrence positions. Few, larger examples (Spark jobs are slow
per example; the value is randomized structure)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linz_bde_uploader_spark.functions.dedup import (
    cross_doc_exact_spans,
    scrub_cross_doc_spans,
)

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

#: vocabulary with pairwise-distinct (length, first char) — the
#: token_value feature pair — so no two tokens hash-collide and the
#: only shared n-grams are genuinely shared text
VOCAB = [
    c * (i + 1)
    for i, c in enumerate("abcdefghijklmnopqrst")
]


def _doc(rng_ints, lo, hi):
    return [VOCAB[i % len(VOCAB)] for i in rng_ints[lo:hi]]


DOCS = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=len(VOCAB) - 1),
        min_size=10,
        max_size=24,
    ),
    min_size=3,
    max_size=5,
)
# the injected span draws DISTINCT tokens: the recall guarantee is for
# real prose, which carries >= min_shared distinct rare shingles — a
# span that is one token repeated has a single distinct 3-gram and is
# below the nomination contract by design (hypothesis found exactly
# that boundary with an all-'a' corpus)
SPAN = st.lists(
    st.integers(min_value=0, max_value=len(VOCAB) - 1),
    min_size=6,
    max_size=10,
    unique=True,
)
OFFS = st.tuples(
    st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=8)
)


@SLOW
@given(docs=DOCS, span=SPAN, offs=OFFS)
def test_exact_spans_sound_and_recall_injected(spark, docs, span, offs):
    toks = [[VOCAB[i] for i in d] for d in docs]
    sp = [VOCAB[i] for i in span]
    # inject the span into docs 0 and 1 at the drawn offsets
    o0 = min(offs[0], len(toks[0]))
    o1 = min(offs[1], len(toks[1]))
    toks[0] = toks[0][:o0] + sp + toks[0][o0:]
    toks[1] = toks[1][:o1] + sp + toks[1][o1:]
    texts = {i: " ".join(t) for i, t in enumerate(toks)}
    df = spark.createDataFrame(
        [(i, texts[i]) for i in texts], "doc_id long, text string"
    )
    rows = cross_doc_exact_spans(df, min_span_tokens=6).collect()

    # SOUNDNESS: every reported span occurs verbatim at both offsets
    for r in rows:
        ta = texts[r.id_a].split(" ")
        tb = texts[r.id_b].split(" ")
        assert (
            " ".join(ta[r.start_a - 1 : r.start_a - 1 + r.span_len])
            == r.span_text
        )
        assert (
            " ".join(tb[r.start_b - 1 : r.start_b - 1 + r.span_len])
            == r.span_text
        )
        assert r.span_len >= 6

    # RECALL: the injected span surfaces between docs 0 and 1 as (or
    # inside) some reported span covering its full injected extent
    hit = [
        r
        for r in rows
        if r.id_a == 0
        and r.id_b == 1
        and r.start_a <= o0 + 1
        and r.start_a + r.span_len >= o0 + 1 + len(sp)
        and r.start_b <= o1 + 1
        and r.start_b + r.span_len >= o1 + 1 + len(sp)
    ]
    assert hit, f"injected span not recalled: {rows}"

    # APPLY consistency: the scrubbed corpus removes exactly the
    # union of later-occurrence (id_b-side) covered positions
    covered = {}
    for r in rows:
        covered.setdefault(r.id_b, set()).update(
            range(r.start_b, r.start_b + r.span_len)
        )
    got = {
        r.doc_id: (r.n_removed, r.clean_text)
        for r in scrub_cross_doc_spans(df, min_span_tokens=6).collect()
    }
    for i, t in texts.items():
        tl = t.split(" ")
        dead = covered.get(i, set())
        kept = [w for p, w in enumerate(tl, start=1) if p not in dead]
        assert got[i] == (len(tl) - len(kept), " ".join(kept))


#: vocabulary of DELIBERATE token_value collisions: every token is
#: length 2 starting with 'x', so ALL tokens share the (length,
#: first-char) feature pair and every shingle-hash equi-join match is
#: a potential fabrication — only the token-level verify stands
#: between a colliding position and a fake/extended span (r10 advice)
COLLIDE_VOCAB = ["x" + c for c in "abcdefghij"]

CDOCS = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=len(COLLIDE_VOCAB) - 1),
        min_size=10,
        max_size=24,
    ),
    min_size=3,
    max_size=5,
)
CSPAN = st.lists(
    st.integers(min_value=0, max_value=len(COLLIDE_VOCAB) - 1),
    min_size=6,
    max_size=10,
    unique=True,
)


@SLOW
@given(docs=CDOCS, span=CSPAN, offs=OFFS)
def test_exact_spans_sound_under_hash_collisions(spark, docs, span, offs):
    # same soundness + recall contract as above, but under a fully
    # colliding vocabulary: pre-verify, the hash-only pipeline
    # reported spans of text that differs token-for-token (fabricated
    # via token_value's (length, first-char) features); the verify
    # stage must keep every reported span verbatim-true at BOTH
    # offsets while still recalling the genuinely injected span.
    toks = [[COLLIDE_VOCAB[i] for i in d] for d in docs]
    sp = [COLLIDE_VOCAB[i] for i in span]
    o0 = min(offs[0], len(toks[0]))
    o1 = min(offs[1], len(toks[1]))
    toks[0] = toks[0][:o0] + sp + toks[0][o0:]
    toks[1] = toks[1][:o1] + sp + toks[1][o1:]
    texts = {i: " ".join(t) for i, t in enumerate(toks)}
    df = spark.createDataFrame(
        [(i, texts[i]) for i in texts], "doc_id long, text string"
    )
    rows = cross_doc_exact_spans(df, min_span_tokens=6).collect()
    for r in rows:
        ta = texts[r.id_a].split(" ")
        tb = texts[r.id_b].split(" ")
        assert (
            " ".join(ta[r.start_a - 1 : r.start_a - 1 + r.span_len])
            == r.span_text
        ), "span not verbatim on side a"
        assert (
            " ".join(tb[r.start_b - 1 : r.start_b - 1 + r.span_len])
            == r.span_text
        ), "span not verbatim on side b"
    # recall is CONTRACT-BOUNDED by nomination, which operates on the
    # (colliding) hash values: under full collision the whole corpus
    # can present a single distinct shingle value, and a pair sharing
    # < min_shared distinct values is out of contract (the documented
    # all-'a' boundary). Replicate the nomination predicate and assert
    # recall exactly when the pipeline nominates (0, 1).
    def _sv(ts, i):
        acc = 0
        nn = len(ts)
        for j in range(3):
            t = ts[min(i + j, nn - 1)]
            acc = (acc * 961 + (len(t) * 17 + ord(t[0]) * 31) % (2**31 - 1)) % (
                2**31 - 1
            )
        return acc

    svs = {
        i: {_sv(tl, p) for p in range(max(len(tl) - 2, 1))}
        for i, tl in ((j, texts[j].split(" ")) for j in texts)
    }
    dfreq = {}
    for vals in svs.values():
        for v in vals:
            dfreq[v] = dfreq.get(v, 0) + 1
    shared_rare = {
        v for v in svs[0] & svs[1] if dfreq[v] <= 8
    }
    if len(shared_rare) >= 2:
        full = [
            r
            for r in rows
            if r.id_a == 0
            and r.id_b == 1
            and r.start_a <= o0 + 1
            and r.start_a + r.span_len >= o0 + 1 + len(sp)
            and r.start_b <= o1 + 1
            and r.start_b + r.span_len >= o1 + 1 + len(sp)
        ]
        assert full, f"nominated but not recalled under collisions: {rows}"
