"""Tests for sequence packing, benchmark decontamination, and stratified
sampling — the training-pipeline operators added in round 3."""

import pandas as pd
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions import decontaminate as DX
from linz_bde_uploader_spark.functions import packing as PK
from linz_bde_uploader_spark.functions import sampling as SP


# ---------------------------------------------------------------- packing

def _packed(spark, rows, capacity, n_shards=1):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = PK.pack_sequences(df, "doc_id", "n_tokens", capacity, n_shards)
    return {r["doc_id"]: (r["pack_id"], r["pack_offset"], r["clamped_tokens"])
            for r in out.collect()}


def test_pack_greedy_boundaries(spark):
    # capacity 10: [4, 5] fill pack 0; 3 would overflow -> pack 1; 10 is
    # an exact fit but 3 is already in pack 1 with 7 free? no — 10 > 7
    # so it starts pack 2 and fills it exactly; 1 then opens pack 3.
    rows = [(1, 4), (2, 5), (3, 3), (4, 10), (5, 1)]
    got = _packed(spark, rows, capacity=10)
    assert got == {
        1: (0, 0, 4),
        2: (0, 4, 5),
        3: (1, 0, 3),
        4: (2, 0, 10),
        5: (3, 0, 1),
    }


def test_pack_clamps_overlength(spark):
    got = _packed(spark, [(1, 25), (2, 2)], capacity=10)
    # 25 is clamped to a full pack of 10; the next doc starts pack 1
    assert got[1] == (0, 0, 10)
    assert got[2] == (1, 0, 2)


def test_pack_zero_token_docs_take_no_space(spark):
    got = _packed(spark, [(1, 0), (2, 10), (3, 0)], capacity=10)
    assert got[1] == (0, 0, 0)
    assert got[2] == (0, 0, 10)
    # a zero-token doc after a full pack still "fits" (used + 0 == cap)
    assert got[3] == (0, 10, 0)


def test_pack_null_token_counts_pack_as_zero(spark):
    # a null n_tokens must not kill the shard's task (NaN astype raises);
    # it packs as 0 tokens, matching token_count's blank-text convention
    df = spark.createDataFrame(
        [(1, 4), (2, None), (3, 6)], "doc_id long, n_tokens long"
    )
    out = PK.pack_sequences(df, "doc_id", "n_tokens", 10, n_shards=1)
    got = {r["doc_id"]: (r["pack_id"], r["pack_offset"], r["clamped_tokens"])
           for r in out.collect()}
    assert got == {1: (0, 0, 4), 2: (0, 4, 0), 3: (0, 4, 6)}


def test_pack_shards_are_independent_and_deterministic(spark):
    rows = [(i, 7) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = PK.pack_sequences(df, "doc_id", "n_tokens", 21, n_shards=4)
    b = PK.pack_sequences(
        df.repartition(7), "doc_id", "n_tokens", 21, n_shards=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every shard packs exactly 3 docs of 7 tokens per 21-token pack
    fills = (
        a.groupBy("shard", "pack_id")
        .agg(F.sum("clamped_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["fill"] <= 21 for r in fills)


def test_pack_utilization_shape(spark):
    df = spark.createDataFrame([(i, 8) for i in range(32)],
                               "doc_id long, n_tokens long")
    packed = PK.pack_sequences(df, "doc_id", "n_tokens", 16, n_shards=2)
    util = PK.pack_utilization(packed, 16).collect()
    assert {r["shard"] for r in util} <= {0, 1}
    for r in util:
        assert 0.0 < r["mean_fill"] <= 1.0


# ----------------------------------------------------------- decontaminate

def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_ngrams_short_doc_is_empty(spark):
    df = _docs(spark, ["a b", "a b c d"])
    got = {r["doc_id"]: r["g"] for r in df.select(
        "doc_id", DX.word_ngrams("text", 3).alias("g")).collect()}
    assert got[0] == []
    assert got[1] == ["a b c", "b c d"]


def test_contamination_hits_counts_distinct_shared_grams(spark):
    bench = _docs(spark, ["the quick brown fox jumps"])
    corpus = spark.createDataFrame(
        [
            (10, "xx the quick brown fox yy the quick brown fox"),  # 2 shared grams, each twice
            (11, "totally clean document here"),
            (12, "fox jumps high quick brown fox jumps"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"]
           for r in DX.contamination_hits(corpus, bench, n=4).collect()}
    # doc 10 shares 'the quick brown fox' + 'quick brown fox yy'? no —
    # bench grams are only from the bench text: {'the quick brown fox',
    # 'quick brown fox jumps'}. doc 10 matches the first (deduped to 1
    # hit despite appearing twice); doc 12 matches 'quick brown fox jumps'.
    assert got == {10: 1, 12: 1}


def test_decontaminate_drops_only_contaminated(spark):
    bench = _docs(spark, ["one two three four"])
    corpus = spark.createDataFrame(
        [(20, "zz one two three four zz"), (21, "five six seven eight nine")],
        "doc_id long, text string",
    )
    kept = DX.decontaminate(corpus, bench, n=4).select("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [21]


def test_contamination_plan_broadcasts_bench(spark):
    bench = _docs(spark, ["a b c d e"])
    corpus = _docs(spark, ["c d e f g"])
    plan = DX.contamination_hits(corpus, bench, n=4)
    explained = plan._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in explained


# ------------------------------------------------------ stratified sample

def test_stratified_sample_rates_and_nesting(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    s30 = SP.stratified_sample(df, "doc_id", "lang", {"en": 30, "fr": 80})
    kept = s30.groupBy("lang").count().collect()
    frac = {r["lang"]: r["count"] / 1000 for r in kept}
    assert 0.2 < frac["en"] < 0.4
    assert 0.7 < frac["fr"] < 0.9
    # nesting: the 10% English sample is a subset of the 30% one
    s10 = SP.stratified_sample(df, "doc_id", "lang", {"en": 10, "fr": 80})
    ids30 = {r["doc_id"] for r in s30.filter("lang='en'").collect()}
    ids10 = {r["doc_id"] for r in s10.filter("lang='en'").collect()}
    assert ids10 <= ids30


def test_stratified_sample_default_rate_and_validation(spark):
    df = spark.createDataFrame([(1, "zz")], "doc_id long, lang string")
    assert SP.stratified_sample(df, "doc_id", "lang", {}, 100).count() == 1
    assert SP.stratified_sample(df, "doc_id", "lang", {}, 0).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        SP.stratified_sample(df, "doc_id", "lang", {"en": 101})


def test_mixture_weights_copy_counts_and_epochs(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = SP.mixture_weights(df, "doc_id", "lang", {"en": 2.5, "fr": 0.5})
    per = {(r["doc_id"]): r["n"] for r in
           out.groupBy("doc_id").count().withColumnRenamed("count", "n")
           .collect()}
    # every English doc appears 2 or 3 times; French 0 or 1
    en_counts = {per.get(i, 0) for i in range(0, 2000, 2)}
    fr_counts = {per.get(i, 0) for i in range(1, 2000, 2)}
    assert en_counts == {2, 3}
    assert fr_counts == {0, 1}
    # the fractional gates hit ~50% of each stratum
    n3 = sum(1 for i in range(0, 2000, 2) if per.get(i, 0) == 3)
    n1 = sum(1 for i in range(1, 2000, 2) if per.get(i, 0) == 1)
    assert 400 < n3 < 600 and 400 < n1 < 600
    # epochs number 1..n with no gaps
    eps = sorted(r["epoch"] for r in out.filter("doc_id = 0").collect())
    assert eps == list(range(1, per[0] + 1))
    # the upsampled extra-copy set coincides with the 50% sample
    # (same hash gate) — deterministic, not partition-dependent
    extra = {r["doc_id"] for r in out.filter("epoch = 3").collect()}
    half = {r["doc_id"] for r in
            SP.deterministic_sample(df.filter("lang='en'"), "doc_id", 50)
            .collect()}
    assert extra == half


def test_mixture_weights_integer_weight_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, lang string"
    )
    # integral weights: exact copy counts, no fractional gate involved
    out = SP.mixture_weights(df, "doc_id", "lang", {"a": 3}, default_weight=0)
    got = [(r["doc_id"], r["epoch"]) for r in out.collect()]
    assert sorted(got) == [(1, 1), (1, 2), (1, 3)]
    import pytest as _pt
    with _pt.raises(ValueError):
        SP.mixture_weights(df, "doc_id", "lang", {"a": -0.5})


def test_mixture_weights_empty_string_stratum_is_weightable(spark):
    # "" is a legitimate stratum name, not the default's key: an explicit
    # weight for it must win over default_weight.
    df = spark.createDataFrame(
        [(1, ""), (2, "b")], "doc_id long, lang string"
    )
    out = SP.mixture_weights(df, "doc_id", "lang", {"": 2}, default_weight=0)
    got = sorted((r["doc_id"], r["epoch"]) for r in out.collect())
    assert got == [(1, 1), (1, 2)]


def test_mixture_weights_null_id_keeps_integral_copies(spark):
    # A NULL id can't hash into the fractional extra-copy set, but its
    # stratum's floor(w) copies must survive (the gate coalesces to 0).
    df = spark.createDataFrame(
        [(None, "a"), (7, "a")], "doc_id long, lang string"
    )
    out = SP.mixture_weights(df, "doc_id", "lang", {"a": 2.5})
    counts = {r["doc_id"]: r["n"] for r in
              out.groupBy("doc_id").count().withColumnRenamed("count", "n")
              .collect()}
    assert counts[None] == 2       # floor(2.5), no fractional copy
    assert counts[7] in (2, 3)


# ------------------------------------------------------- boilerplate

def test_boilerplate_lines_removed_and_order_kept(spark):
    from linz_bde_uploader_spark.functions import boilerplate as BP

    docs = spark.createDataFrame(
        [
            (1, "unique alpha\ncookie banner\nunique beta"),
            (2, "cookie banner\nown content two"),
            (3, "own content three\ncookie banner"),
            (4, "cookie banner\n\n  \ncookie banner"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["cleaned"]
           for r in BP.remove_boilerplate_lines(docs, max_df=2).collect()}
    # 'cookie banner' appears in 3 distinct docs -> boilerplate (df>2)
    assert out[1] == "unique alpha\nunique beta"
    assert out[2] == "own content two"
    assert out[3] == "own content three"
    # doc 4 was ALL boilerplate/blank -> stable row with empty text
    assert out[4] == ""


def test_boilerplate_df_counts_distinct_docs_not_occurrences(spark):
    from linz_bde_uploader_spark.functions import boilerplate as BP

    docs = spark.createDataFrame(
        [(1, "x\nx\nx\nkeep me"), (2, "other")],
        "doc_id long, text string",
    )
    # 'x' occurs 3 times but only in ONE doc -> df=1, not boilerplate
    out = {r["doc_id"]: r["cleaned"]
           for r in BP.remove_boilerplate_lines(docs, max_df=2).collect()}
    assert out[1] == "x\nx\nx\nkeep me"


def test_boilerplate_probe_is_broadcast(spark):
    from linz_bde_uploader_spark.functions import boilerplate as BP

    docs = spark.createDataFrame(
        [(i, f"line {i}\nshared") for i in range(10)],
        "doc_id long, text string",
    )
    plan = BP.remove_boilerplate_lines(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pack_invariants_property(spark):
    """Property test: for random token-count streams, greedy packing
    never overflows capacity, offsets tile each pack contiguously, and
    pack ids are dense from 0 per shard."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
        st.integers(min_value=5, max_value=30),
    )
    def check(token_counts, capacity):
        rows = [(i, t) for i, t in enumerate(token_counts)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = PK.pack_sequences(df, "doc_id", "n_tokens", capacity, n_shards=2)
        by_shard = {}
        for r in sorted(out.collect(), key=lambda r: (r["shard"], r["doc_id"])):
            by_shard.setdefault(r["shard"], []).append(r)
        for shard_rows in by_shard.values():
            fills = {}
            expected_offset = {}
            for r in shard_rows:
                assert r["clamped_tokens"] <= capacity
                # offset is the pack's fill so far (contiguous tiling)
                assert r["pack_offset"] == expected_offset.get(r["pack_id"], 0)
                expected_offset[r["pack_id"]] = r["pack_offset"] + r["clamped_tokens"]
                fills[r["pack_id"]] = r["pack_offset"] + r["clamped_tokens"]
                assert fills[r["pack_id"]] <= capacity
            # dense pack ids from 0, in visit order
            assert sorted(fills) == list(range(len(fills)))

    check()


# ------------------------------------------------- corpus curation caps

def test_per_group_cap_deterministic_and_bounded(spark):
    from linz_bde_uploader_spark.functions import sampling as SP

    rows = [(i, f"d{i % 3}", 100 - i) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, score long")
    out = SP.per_group_cap(df, "domain", "score", 4,
                           tiebreak_col="doc_id", ascending=False)
    got = {}
    for r in out.collect():
        got.setdefault(r.domain, []).append(r.doc_id)
    # highest score = lowest i within each residue class -> first 4 ids
    assert {k: sorted(v) for k, v in got.items()} == {
        "d0": [0, 3, 6, 9], "d1": [1, 4, 7, 10], "d2": [2, 5, 8, 11],
    }
    import pytest as _pt
    with _pt.raises(ValueError):
        SP.per_group_cap(df, "domain", "score", 0)


def test_quantile_filter_exact_per_stratum(spark):
    from linz_bde_uploader_spark.functions import sampling as SP

    # lang a: scores 0..9; lang b: scores 0..4 — per-stratum cut, not global
    rows = [(i, "a", i) for i in range(10)] + \
           [(100 + i, "b", i) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score long")
    out = SP.quantile_filter(df, "lang", "score", 0.5)
    kept = {r.doc_id for r in out.collect()}
    # percent_rank >= 0.5: a keeps scores 5..9 ((rank-1)/9 >= .5 -> rank>=5.5
    # -> scores >= 5... rank-1 >= 4.5 -> score >= 5), b keeps 2..4
    assert kept == {5, 6, 7, 8, 9, 102, 103, 104}
    # keep="bottom" is the complement plus the boundary row
    bot = {r.doc_id for r in
           SP.quantile_filter(df, "lang", "score", 0.5, keep="bottom")
           .collect()}
    assert bot == {0, 1, 2, 3, 4, 100, 101, 102}


def test_quantile_filter_approx_matches_exact_on_distinct_scores(spark):
    from linz_bde_uploader_spark.functions import sampling as SP

    rows = [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    exact = {r.doc_id for r in
             SP.quantile_filter(df, "lang", "score", 0.3).collect()}
    approx = {r.doc_id for r in
              SP.quantile_filter_approx(df, "lang", "score", 0.3).collect()}
    # high accuracy + distinct scores: the sets differ by at most the
    # boundary element per stratum
    assert len(exact.symmetric_difference(approx)) <= 2


def test_weighted_sample_deterministic_and_weighted(spark):
    from linz_bde_uploader_spark.functions.sampling import weighted_sample

    rows = [(i, 1 if i < 50 else 100) for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    a = [r.doc_id for r in weighted_sample(d, 20, "w").collect()]
    b = [r.doc_id for r in weighted_sample(d.repartition(7), 20, "w").collect()]
    assert a == b  # partition-invariant, same draw
    # heavy weights dominate the sample (100x mass on ids 50-99)
    heavy = sum(1 for i in a if i >= 50)
    assert heavy >= 15
    # a different salt is a different draw
    c = [r.doc_id for r in weighted_sample(d, 20, "w", salt=7).collect()]
    assert c != a
    # zero/NULL weights never selected
    d2 = spark.createDataFrame(
        [(1, 0), (2, None), (3, 5)], "doc_id long, w long"
    )
    assert [r.doc_id for r in weighted_sample(d2, 3, "w").collect()] == [3]


# ------------------------------------------------ best-fit-decreasing

def _bfd_reference(rows, capacity):
    """Plain-Python twin of pack_best_fit's per-shard policy."""
    out = {}
    rem = []
    for did, t in sorted(rows, key=lambda x: (-min(max(x[1] or 0, 0), capacity), x[0])):
        t = min(max(t or 0, 0), capacity)
        fits = [(r, i) for i, r in enumerate(rem) if r >= t]
        if fits:
            best, pos = min(fits)
            out[did] = (pos, capacity - rem[pos], t)
            rem[pos] -= t
        else:
            out[did] = (len(rem), 0, t)
            rem.append(capacity - t)
    return out


def _bfd(spark, rows, capacity, n_shards=1):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = PK.pack_best_fit(df, "doc_id", "n_tokens", capacity, n_shards)
    return {r["doc_id"]: (r["pack_id"], r["pack_offset"], r["clamped_tokens"])
            for r in out.collect()}


def test_bestfit_hand_example(spark):
    # capacity 10, visit longest-first: 10 fills pack 0; 5 opens pack 1;
    # 4 best-fits pack 1 (rem 5); 3 fits nothing (rems 0,1) -> pack 2;
    # 1 best-fits pack 1 (rem 1 < rem 7 of pack 2).
    got = _bfd(spark, [(1, 4), (2, 5), (3, 3), (4, 10), (5, 1)], 10)
    assert got == {
        4: (0, 0, 10),
        2: (1, 0, 5),
        1: (1, 5, 4),
        3: (2, 0, 3),
        5: (1, 9, 1),
    }


def test_bestfit_tie_picks_lowest_pack_id(spark):
    # two packs at remainder 4; the 4-token doc goes to pack 0
    got = _bfd(spark, [(1, 6), (2, 6), (3, 4)], 10)
    assert got[3] == (0, 6, 4)


def test_bestfit_matches_python_reference_and_beats_greedy(spark):
    rows = [(i, (i * 37) % 23) for i in range(80)] + [(900, None), (901, -3)]
    cap = 25
    got = _bfd(spark, rows, cap)
    assert got == _bfd_reference(rows, cap)
    greedy_packs = len(
        {v[0] for v in _packed(spark, [(i, t or 0) for i, t in rows], cap).values()}
    )
    bfd_packs = len({v[0] for v in got.values()})
    assert bfd_packs <= greedy_packs


def test_bestfit_invariants_property(spark):
    """Same invariants as greedy packing — no overflow, dense pack ids —
    plus best-fit's own: no document that could have fit an open pack
    ever opened a new one (checked via the reference twin)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
        st.integers(min_value=5, max_value=30),
    )
    def check(token_counts, capacity):
        rows = [(i, t) for i, t in enumerate(token_counts)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = PK.pack_best_fit(df, "doc_id", "n_tokens", capacity, n_shards=2)
        by_shard = {}
        for r in out.collect():
            by_shard.setdefault(r["shard"], []).append(
                (r["doc_id"], r["pack_id"], r["pack_offset"], r["clamped_tokens"])
            )
        for shard_rows in by_shard.values():
            fills = {}
            for _, pid, off, t in shard_rows:
                assert t <= capacity
                fills[pid] = fills.get(pid, 0) + t
                assert fills[pid] <= capacity
            assert sorted(fills) == list(range(len(fills)))
            ref = _bfd_reference(
                [(did, t) for did, _, _, t in shard_rows], capacity
            )
            assert {d: v for d, v in ref.items()} == {
                did: (pid, off, t) for did, pid, off, t in shard_rows
            }

    check()
