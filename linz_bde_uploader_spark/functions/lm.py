"""N-gram language-model quality filtering — the CCNet-style perplexity
gate a web-scale training-data pipeline runs after dedup: train a small
LM on the corpus (or a trusted reference corpus), score every document's
cross-entropy under it, and drop the tail whose perplexity marks it as
boilerplate, gibberish, or machine-generated spam.

The model here is an add-one-smoothed bigram LM — deliberately the
simplest member of the family whose arithmetic is exactly expressible in
ANSI SQL, so the correctness harness can hash-match every probability
against DuckDB. A KenLM/fastText scorer plugs in behind the same column
contract via mapInPandas without changing the surrounding plan.

Scale notes (100 TB): training is one shuffle (partial-agg bigram
counts); context counts re-aggregate the *aggregated* bigram table, not
the raw token stream; vocabulary size is a 1-row aggregate cross-joined
in (broadcast, no separate action — the TF-IDF corpus-size pattern).
Scoring joins raw doc-bigrams to the counted table on (prev, cur) — a
plain shuffle hash join AQE will broadcast whenever the trained LM is
small enough. Nothing is per-row Python and nothing is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.text import tokens


def doc_bigrams(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Explode each document into ``(id, prev, cur)`` adjacent-token
    pairs. Documents with fewer than two tokens yield no rows.
    ``extra_cols`` (e.g. a language/stratum column) pass through
    unchanged beside the id — the stratified trainers ride on this.

    The pair list is built by zipping the token array against itself
    shifted by one (two ``slice`` calls on a *staged* array attribute) —
    a pure map-side explode, no shuffle, no positional self-join.
    """
    toks = docs.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        tokens(F.trim(F.col(text_col))).alias("_toks"),
    ).filter(F.size("_toks") >= 2)
    sz = F.size("_toks")
    pairs = F.arrays_zip(
        F.slice(F.col("_toks"), 1, sz - 1).alias("prev"),
        F.slice(F.col("_toks"), 2, sz - 1).alias("cur"),
    )
    return toks.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.explode(pairs).alias("_p"),
    ).select(
        id_col, *extra_cols,
        F.col("_p.prev").alias("prev"), F.col("_p.cur").alias("cur"),
    )


def train_bigram_lm(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    _bi: DataFrame | None = None) -> DataFrame:
    """Train an add-one-smoothed bigram LM over the corpus.

    Returns ``(prev, cur, pair_cnt, ctx_cnt, vocab_size, logp)`` where
    ``logp = ln((pair_cnt + 1) / (ctx_cnt + vocab_size))``.

    One wide shuffle (bigram counts with map-side combine); context
    counts are a window-sum over the already-aggregated bigram table
    (bounded by |bigram vocab|, not corpus size); ``vocab_size`` counts
    distinct tokens via the same exploded pairs (prev ∪ cur ∪ the last
    token of every doc is approximated as prev ∪ cur — exact for any
    corpus where every token type occurs in some bigram, i.e. every
    document has ≥ 2 tokens; short-doc token types never receive
    probability mass anyway) and rides in as a broadcast 1-row
    cross join, so training is a single job with no separate action.

    ``_bi`` (perf plumbing, r16): a prebuilt ``doc_bigrams`` frame —
    a caller that trains AND scores off the same corpus (rho_select)
    passes one persisted explode so it is computed once instead of
    once per train/score pass. Must be exactly
    ``doc_bigrams(docs, id_col, text_col)``'s rows; results are
    identical by construction.
    """
    bi = _bi if _bi is not None else doc_bigrams(docs, id_col, text_col)
    pair_counts = bi.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("pair_cnt")
    )
    # context totals: re-aggregate the aggregated pairs (window keeps it
    # one shuffle on `prev` over the compact table)
    from pyspark.sql import Window

    ctx = Window.partitionBy("prev")
    with_ctx = pair_counts.withColumn(
        "ctx_cnt", F.sum("pair_cnt").over(ctx)
    )
    vocab = bi.select(
        F.explode(F.array("prev", "cur")).alias("tok")
    ).agg(F.count_distinct("tok").alias("vocab_size"))
    return with_ctx.crossJoin(F.broadcast(vocab)).withColumn(
        "logp",
        F.log(
            (F.col("pair_cnt") + F.lit(1).cast("double"))
            / (F.col("ctx_cnt") + F.col("vocab_size"))
        ),
    )


def score_documents(docs: DataFrame, lm: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    _bi: DataFrame | None = None) -> DataFrame:
    """Score each document's cross-entropy and perplexity under ``lm``
    (a ``train_bigram_lm`` result, possibly from a different corpus).

    Returns ``(id, n_bigrams, cross_entropy, perplexity)`` with
    ``cross_entropy = -mean(logp)`` over the document's bigrams and
    ``perplexity = exp(cross_entropy)``, both rounded to 4 dp so the
    value is stable across engines' fold orders. Bigrams unseen at
    training time back off to the smoothed floor
    ``ln(1 / (ctx_cnt + V))`` (or ``ln(1/V)`` for an unseen context).
    Documents with fewer than two tokens produce no row.
    """
    from linz_bde_uploader_spark.caching import track

    # The model table feeds THREE consumers (the (prev,cur) logp join,
    # the per-context floor, the vocab row) — untracked, Catalyst
    # re-evaluated the whole training subtree (explode + two aggs) per
    # consumer (r15 optimization pass, guide §2.4/§5). The table is
    # |bigram vocab|-bounded — model state, safe to persist at any
    # corpus size.
    lm = track(lm)
    # _bi: prebuilt doc_bigrams frame (see train_bigram_lm) — one
    # persisted explode shared across train+score passes.
    bi = _bi if _bi is not None else doc_bigrams(docs, id_col, text_col)
    # per-context floor for unseen `cur`: distinct (prev, ctx_cnt, V)
    ctx_tbl = lm.select("prev", "ctx_cnt", "vocab_size").distinct()
    vocab = lm.select(F.max("vocab_size").alias("_v")).limit(1)
    scored = (
        bi.join(lm.select("prev", "cur", "logp"), ["prev", "cur"], "left")
        .join(ctx_tbl, ["prev"], "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_logp",
            F.coalesce(
                F.col("logp"),
                F.log(
                    F.lit(1.0)
                    / (F.coalesce(F.col("ctx_cnt"), F.lit(0)) + F.col("_v"))
                ),
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("_logp"), 4).alias("cross_entropy"),
        F.round(F.exp(F.round(-F.avg("_logp"), 4)), 4).alias("perplexity"),
    )


def perplexity_filter(docs: DataFrame, max_perplexity: float,
                      id_col: str = "doc_id", text_col: str = "text",
                      lm: DataFrame | None = None) -> DataFrame:
    """Keep documents whose self-trained (or supplied) LM perplexity is
    at most ``max_perplexity`` — the CCNet head/middle cut. Documents
    too short to score (< 2 tokens) are dropped, matching the common
    pipeline's minimum-length gate."""
    model = lm if lm is not None else train_bigram_lm(docs, id_col, text_col)
    scores = score_documents(docs, model, id_col, text_col)
    keep = scores.filter(F.col("perplexity") <= max_perplexity).select(id_col)
    return docs.join(keep, [id_col], "left_semi")


#: absolute-discount mass moved to the continuation distribution —
#: Kneser-Ney's published default (Chen & Goodman 1999 use 0.75 as the
#: fixed-discount baseline).
KN_DISCOUNT = 0.75


def train_kn_bigram_lm(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       discount: float = KN_DISCOUNT) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    Goodman 1999's interpolated form) — the standard n-gram smoothing,
    and the one add-one smoothing approximates worst: probability mass
    freed by absolute discounting goes to the CONTINUATION distribution
    (how many distinct contexts a word follows), not raw frequency, so
    frequent-but-fixed collocation tails ("Francisco") stop stealing
    mass from genuinely versatile words:

        p(w|v) = max(c(v,w) - D, 0) / c(v)
                 + (D · N1+(v,·) / c(v)) · pcont(w)
        pcont(w) = (N1+(·,w) + 1) / (T + V)

    with ``N1+(v,·)`` the distinct continuations of context ``v``,
    ``N1+(·,w)`` the distinct contexts preceding ``w``, ``T`` the
    distinct-bigram count and ``V`` the vocabulary size. The +1/(T+V)
    floor on the continuation term keeps p > 0 for words unseen in any
    bigram, so the model scores out-of-corpus documents without NULLs
    (the trigram LM's add-one-floor convention).

    Returns ``(prev, cur, pair_cnt, ctx_cnt, n1f, n1b, T, V, logp)``.

    Scale: one bigram-count shuffle with map-side combine; the
    context/continuation statistics are two window passes over the
    already-aggregated pair table (bounded by |bigram vocab|); T and V
    ride in as broadcast ONE-ROW aggregates (the whitelisted
    scalar-subquery BNLJ shape shared with TF-IDF's N and the add-one
    LM's V)."""
    from pyspark.sql import Window

    bi = doc_bigrams(docs, id_col, text_col)
    pc = bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("pair_cnt"))
    wp, wc = Window.partitionBy("prev"), Window.partitionBy("cur")
    m = (
        pc.withColumn("ctx_cnt", F.sum("pair_cnt").over(wp))
        .withColumn("n1f", F.count(F.lit(1)).over(wp))
        .withColumn("n1b", F.count(F.lit(1)).over(wc))
    )
    totals = pc.agg(F.count(F.lit(1)).alias("T"))
    vocab = pc.select(
        F.explode(F.array("prev", "cur")).alias("tok")
    ).agg(F.count_distinct("tok").alias("V"))
    d = F.lit(float(discount))
    return (
        m.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log(
                F.greatest(F.col("pair_cnt") - d, F.lit(0.0))
                / F.col("ctx_cnt")
                + (d * F.col("n1f") / F.col("ctx_cnt"))
                * ((F.col("n1b") + F.lit(1.0)) / (F.col("T") + F.col("V")))
            ),
        )
    )


def kn_score_documents(docs: DataFrame, lm: DataFrame | None = None,
                       id_col: str = "doc_id", text_col: str = "text",
                       discount: float = KN_DISCOUNT) -> DataFrame:
    """Score documents under a Kneser-Ney bigram LM (self-trained when
    ``lm`` is None): ``(id, n_bigrams, cross_entropy, perplexity)``
    rounded to 4 dp (the :func:`score_documents` contract); documents
    with fewer than two tokens produce no row.

    Out-of-corpus back-off ladder, all derived from the model table so
    foreign documents score without NULLs: unseen (prev, cur) with a
    seen context scores the interpolation weight times the word's
    continuation probability; an unseen context backs off to the
    continuation probability alone; an unseen word bottoms out at the
    ``1/(T+V)`` continuation floor."""
    from linz_bde_uploader_spark.caching import track

    model = lm if lm is not None else train_kn_bigram_lm(
        docs, id_col, text_col, discount
    )
    # FOUR consumers of the model table (logp join, context floor,
    # continuation table, T/V row) — track() so the KN training
    # subtree evaluates once (model-sized, guide §2.4/§5).
    model = track(model)
    dbi = doc_bigrams(docs, id_col, text_col)
    ctx_tbl = model.select("prev", "ctx_cnt", "n1f").distinct()
    cont_tbl = model.select("cur", "n1b").distinct()
    tv = model.select("T", "V").limit(1)
    d = F.lit(float(discount))
    pcont = (F.coalesce(F.col("n1b"), F.lit(0)) + F.lit(1.0)) / (
        F.col("T") + F.col("V")
    )
    scored = (
        dbi.join(model.select("prev", "cur", "logp"), ["prev", "cur"], "left")
        .join(ctx_tbl, ["prev"], "left")
        .join(cont_tbl, ["cur"], "left")
        .crossJoin(F.broadcast(tv))
        .withColumn(
            "_logp",
            F.coalesce(
                F.col("logp"),
                F.when(
                    F.col("ctx_cnt").isNotNull(),
                    F.log((d * F.col("n1f") / F.col("ctx_cnt")) * pcont),
                ).otherwise(F.log(pcont)),
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("_logp"), 4).alias("cross_entropy"),
        F.round(F.exp(F.round(-F.avg("_logp"), 4)), 4).alias("perplexity"),
    )


def doc_trigrams(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Explode each document into ``(id, w1, w2, w3)`` adjacent-token
    triples — the :func:`doc_bigrams` pattern with a third shifted
    slice. Documents with fewer than three tokens yield no rows; the
    explode is map-side, no shuffle."""
    toks = docs.select(
        F.col(id_col), tokens(F.trim(F.col(text_col))).alias("_toks")
    ).filter(F.size("_toks") >= 3)
    sz = F.size("_toks")
    trips = F.arrays_zip(
        F.slice(F.col("_toks"), 1, sz - 2).alias("w1"),
        F.slice(F.col("_toks"), 2, sz - 2).alias("w2"),
        F.slice(F.col("_toks"), 3, sz - 2).alias("w3"),
    )
    return toks.select(
        F.col(id_col), F.explode(trips).alias("_t")
    ).select(
        id_col,
        F.col("_t.w1").alias("w1"),
        F.col("_t.w2").alias("w2"),
        F.col("_t.w3").alias("w3"),
    )


def train_trigram_lm(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> dict[str, DataFrame]:
    """Train the count tables of an interpolated trigram LM — the
    next-step quality gate past the add-one bigram model (the CCNet
    recipe's LM is a 5-gram; a trigram with interpolated backoff is the
    same counting pattern and stays exactly ANSI-SQL-expressible).

    Returns ``{"tri", "bi", "uni", "totals"}``:

    - ``tri``  — ``(w1, w2, w3, tri_cnt)`` trigram counts,
    - ``bi``   — ``(prev, cur, bi_cnt)`` bigram counts,
    - ``uni``  — ``(tok, uni_cnt)`` unigram counts over the FULL token
      stream (every document, any length),
    - ``totals`` — 1 row ``(total_tokens, vocab_size)``.

    Scale: three partial-agg count shuffles, each over the exploded
    n-gram stream with map-side combine; the totals row re-aggregates
    the compact unigram table. Nothing quadratic, nothing per-row
    Python."""
    uni_stream = docs.select(
        F.explode(tokens(F.trim(F.col(text_col)))).alias("tok")
    )
    uni = uni_stream.groupBy("tok").agg(F.count(F.lit(1)).alias("uni_cnt"))
    bi = doc_bigrams(docs, id_col, text_col).groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("bi_cnt")
    )
    tri = doc_trigrams(docs, id_col, text_col).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("tri_cnt")
    )
    totals = uni.agg(
        F.sum("uni_cnt").cast("double").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    return {"tri": tri, "bi": bi, "uni": uni, "totals": totals}


#: interpolation weights (trigram, bigram, unigram) — fixed, not EM-fit:
#: deterministic, oracle-expressible, and the standard quick-start
#: choice before deleted-interpolation tuning.
TRIGRAM_LAMBDAS = (0.6, 0.3, 0.1)


def trigram_score_documents(
    docs: DataFrame,
    lm: dict[str, DataFrame] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score each document under an interpolated trigram LM
    (self-trained when ``lm`` is None):

        p(w3 | w1 w2) = λ3·tri/bi(w1,w2) + λ2·bi(w2,w3)/uni(w2)
                        + λ1·(uni(w3)+1)/(T+V)

    Maximum-likelihood terms back off to 0 when their context was never
    seen; the add-one unigram floor keeps p > 0 for any token, so the
    model scores out-of-corpus documents without NULLs. Returns
    ``(id, n_trigrams, cross_entropy, perplexity)`` rounded to 4 dp
    (the :func:`score_documents` contract). Documents with fewer than
    three tokens produce no row.

    Scale: the doc-trigram stream joins the three counted tables on
    their n-gram keys (plain shuffle hash joins; AQE broadcasts any
    that are small) plus the 1-row totals broadcast — the whitelisted
    scalar-subquery shape. No collect, nothing quadratic."""
    l3, l2, l1 = TRIGRAM_LAMBDAS
    model = lm if lm is not None else train_trigram_lm(docs, id_col, text_col)
    # Measured and left UNtracked (r15 optimization pass): persisting
    # the bi/uni count tables here regressed sf0.1 wall 2.6 → 3.4 s —
    # the duplicated count subtrees are each one partial-agg shuffle
    # over a map-side explode, and the persist's materialization
    # barrier costs more than the duplicate aggregation it saves
    # (unlike the bigram scorers, whose model table fans out to 3-4
    # consumers of the SAME subtree).
    tri, bi, uni, totals = (
        model["tri"], model["bi"], model["uni"], model["totals"]
    )
    dt = doc_trigrams(docs, id_col, text_col)
    bi12 = bi.select(
        F.col("prev").alias("w1"), F.col("cur").alias("w2"),
        F.col("bi_cnt").alias("bi12_cnt"),
    )
    bi23 = bi.select(
        F.col("prev").alias("w2"), F.col("cur").alias("w3"),
        F.col("bi_cnt").alias("bi23_cnt"),
    )
    uni2 = uni.select(F.col("tok").alias("w2"), F.col("uni_cnt").alias("uni2_cnt"))
    uni3 = uni.select(F.col("tok").alias("w3"), F.col("uni_cnt").alias("uni3_cnt"))
    p = (
        F.lit(l3)
        * F.coalesce(
            F.col("tri_cnt").cast("double") / F.col("bi12_cnt"), F.lit(0.0)
        )
        + F.lit(l2)
        * F.coalesce(
            F.col("bi23_cnt").cast("double") / F.col("uni2_cnt"), F.lit(0.0)
        )
        + F.lit(l1)
        * (
            (F.coalesce(F.col("uni3_cnt"), F.lit(0)) + F.lit(1.0))
            / (F.col("total_tokens") + F.col("vocab_size"))
        )
    )
    scored = (
        dt.join(tri, ["w1", "w2", "w3"], "left")
        .join(bi12, ["w1", "w2"], "left")
        .join(bi23, ["w2", "w3"], "left")
        .join(uni2, ["w2"], "left")
        .join(uni3, ["w3"], "left")
        .crossJoin(F.broadcast(totals))
        .withColumn("_logp", F.log(p))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(-F.avg("_logp"), 4).alias("cross_entropy"),
        F.round(F.exp(F.round(-F.avg("_logp"), 4)), 4).alias("perplexity"),
    )


def collocations(docs: DataFrame, min_count: int = 5, k: int = 30,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) over adjacent-token pairs —
    the corpus-statistics pass that surfaces multiword expressions
    ("new york", "machine learning") worth protecting from tokenizers
    and shingle hashers.

    One bigram-count shuffle; unigram totals re-aggregate the counted
    pair table (prev-marginal as a window, cur-marginal as an equi-join
    AQE may broadcast), and the corpus total rides in as a 1-row
    broadcast — the TF-IDF/LM scalar pattern. ``min_count`` keeps
    noise pairs out
    (PMI is variance-maximal at count 1). PMI rounded to 4 dp;
    deterministic total order (pmi desc, prev, cur).
    """
    bi = doc_bigrams(docs, id_col, text_col)
    pairs = bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("pair_cnt"))
    from pyspark.sql import Window

    w_prev = Window.partitionBy("prev")
    with_marg = pairs.withColumn(
        "prev_cnt", F.sum("pair_cnt").over(w_prev)
    )
    # cur-marginal is VOCABULARY-sized — no broadcast hint (at web scale
    # that table is far past any broadcast limit; AQE broadcasts it
    # whenever it actually is small). Only the 1-row total is forced.
    cur_marg = pairs.groupBy("cur").agg(F.sum("pair_cnt").alias("cur_cnt"))
    total = pairs.agg(F.sum("pair_cnt").alias("total"))
    scored = (
        with_marg.join(cur_marg, ["cur"])
        .crossJoin(F.broadcast(total))
        .filter(F.col("pair_cnt") >= min_count)
        .select(
            "prev", "cur", "pair_cnt",
            F.round(
                F.log(
                    (F.col("pair_cnt").cast("double") * F.col("total"))
                    / (F.col("prev_cnt").cast("double") * F.col("cur_cnt"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "prev", "cur").limit(k)


def perplexity_buckets(
    docs: DataFrame,
    lm: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "lang",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document under a bigram LM, then split each stratum
    (language, by default) into head / middle / tail by perplexity
    percentile — PER STRATUM, so a high-resource language's score
    distribution doesn't define "fluent" for a low-resource one.

    Bucketing is rank arithmetic, not float quantile interpolation:
    ``percent_rank`` over a TOTAL order (perplexity asc, id asc — the
    id tiebreak makes the cut engine-independent even on tied 4-dp
    scores). Documents too short to score (< 2 tokens) are dropped,
    matching :func:`perplexity_filter`'s minimum-length gate.

    Returns ``docs``' scoreable rows plus ``(perplexity, ppl_bucket)``.

    Scale: LM train/score is the audited :func:`score_documents` plan;
    bucketing adds ONE hash-partition shuffle + per-stratum sort. A
    stratum is a language — tens of values, heavily skewed toward the
    head languages; for corpora where one language's sort dominates,
    cut on the two-pass histogram edges of
    :func:`~linz_bde_uploader_spark.functions.sampling.quantile_filter_approx`
    instead (same contract, no sort).
    """
    if not 0.0 < cuts[0] < cuts[1] < 1.0:
        raise ValueError("cuts must satisfy 0 < c1 < c2 < 1")
    model = lm if lm is not None else train_bigram_lm(docs, id_col, text_col)
    scores = score_documents(docs, model, id_col, text_col).select(
        id_col, "perplexity"
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(stratum_col).orderBy(
        F.col("perplexity").asc(), F.col(id_col).asc()
    )
    return (
        docs.join(scores, [id_col])
        .withColumn("_pr", F.percent_rank().over(w))
        .withColumn(
            "ppl_bucket",
            F.when(F.col("_pr") < F.lit(cuts[0]), F.lit(labels[0]))
            .when(F.col("_pr") < F.lit(cuts[1]), F.lit(labels[1]))
            .otherwise(F.lit(labels[2])),
        )
        .drop("_pr")
    )


def perplexity_mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    lm: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "lang",
) -> DataFrame:
    """The CCNet recipe's last step as a measured plan: bucket the
    corpus head/middle/tail by per-language perplexity
    (:func:`perplexity_buckets`), then budget tokens ACROSS the buckets
    (e.g. ``{"head": .5, "middle": .35, "tail": .15}`` — oversample
    fluent text without silently discarding the tail) via
    :func:`~linz_bde_uploader_spark.functions.sampling.mixture_plan`'s
    arithmetic. Returns one row per bucket: ``(bucket, n_docs, tokens,
    target_tokens, sample_fraction, epochs)`` — including a zero row
    for any weighted bucket the corpus can't supply.

    Scale: the bucketing plan above + one map-side token-count
    projection + one 3-row partial-agg shuffle.
    """
    from linz_bde_uploader_spark.functions.sampling import (  # noqa: PLC0415
        mixture_plan,
    )

    unknown = set(weights) - {"head", "middle", "tail"}
    if unknown:
        raise ValueError(f"weights must be keyed by bucket labels: {unknown}")
    bucketed = perplexity_buckets(docs, lm, id_col, text_col, stratum_col)
    plan = mixture_plan(
        bucketed, weights, budget_tokens,
        group_col="ppl_bucket", text_col=text_col,
    )
    return plan.withColumnRenamed("source", "bucket")


def train_stratified_bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "lang",
    _bi: DataFrame | None = None,
) -> DataFrame:
    """Train one add-one-smoothed bigram LM PER STRATUM (per language —
    the CCNet contract, Wenzek et al. 2020: each language is scored
    under its OWN model, so a high-resource language's n-gram
    distribution never defines "fluent" for a low-resource one; the
    global-LM variant is :func:`train_bigram_lm`).

    Returns ``(stratum, prev, cur, pair_cnt, ctx_cnt, vocab_size,
    logp)`` with ``logp = ln((pair_cnt + 1) / (ctx_cnt + vocab_size))``
    computed within each stratum.

    Scale: identical shape to :func:`train_bigram_lm` with the stratum
    prepended to every key — one bigram-count shuffle with map-side
    combine on ``(stratum, prev, cur)``, context counts as a window
    over the aggregated table, and the per-stratum vocabulary riding in
    as a broadcast |strata|-row join instead of the 1-row cross join.
    Training all languages is ONE job; no per-language driver loop.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    # _bi: prebuilt doc_bigrams frame WITH the stratum column (see
    # train_bigram_lm) — one persisted explode shared across passes.
    bi = (_bi if _bi is not None
          else doc_bigrams(docs, id_col, text_col,
                           extra_cols=(stratum_col,)))
    pair_counts = bi.groupBy(stratum_col, "prev", "cur").agg(
        F.count(F.lit(1)).alias("pair_cnt")
    )
    ctx = Window.partitionBy(stratum_col, "prev")
    with_ctx = pair_counts.withColumn(
        "ctx_cnt", F.sum("pair_cnt").over(ctx)
    )
    vocab = (
        bi.select(
            F.col(stratum_col),
            F.explode(F.array("prev", "cur")).alias("tok"),
        )
        .groupBy(stratum_col)
        .agg(F.count_distinct("tok").alias("vocab_size"))
    )
    return with_ctx.join(F.broadcast(vocab), [stratum_col]).withColumn(
        "logp",
        F.log(
            (F.col("pair_cnt") + F.lit(1).cast("double"))
            / (F.col("ctx_cnt") + F.col("vocab_size"))
        ),
    )


def score_documents_stratified(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "lang",
    _bi: DataFrame | None = None,
) -> DataFrame:
    """Score each document under ITS STRATUM's LM (a
    :func:`train_stratified_bigram_lm` result): ``(id, stratum,
    n_bigrams, cross_entropy, perplexity)`` with the
    :func:`score_documents` rounding contract (4 dp, stable across
    engine fold orders). Documents with fewer than two tokens produce
    no row; bigrams unseen by their stratum's model back off to the
    smoothed floor ``ln(1 / (ctx_cnt + V))`` / ``ln(1/V)`` exactly as
    the global scorer does. A document whose stratum trained no model
    at all scores NULL — score the strata you trained.

    Scale: the :func:`score_documents` join plan with the stratum
    prepended to every join key; the per-stratum vocab table is a
    broadcast |strata|-row join.
    """
    from linz_bde_uploader_spark.caching import track

    # THREE consumers of the stratified model table (logp join, context
    # floor, per-stratum vocab) — track() so the stratified training
    # subtree evaluates once (model-sized, guide §2.4/§5).
    lm = track(lm)
    # _bi: prebuilt doc_bigrams frame with the stratum column (see
    # train_stratified_bigram_lm) — shared across train+score passes.
    bi = (_bi if _bi is not None
          else doc_bigrams(docs, id_col, text_col,
                           extra_cols=(stratum_col,)))
    ctx_tbl = lm.select(stratum_col, "prev", "ctx_cnt", "vocab_size").distinct()
    vtbl = lm.select(stratum_col, "vocab_size").distinct()
    scored = (
        bi.join(
            lm.select(stratum_col, "prev", "cur", "logp"),
            [stratum_col, "prev", "cur"],
            "left",
        )
        .join(
            ctx_tbl.select(stratum_col, "prev", F.col("ctx_cnt").alias("_ctx")),
            [stratum_col, "prev"],
            "left",
        )
        .join(
            F.broadcast(vtbl.select(stratum_col, F.col("vocab_size").alias("_v"))),
            [stratum_col],
            "left",
        )
        .withColumn(
            "_logp",
            F.coalesce(
                F.col("logp"),
                F.log(
                    F.lit(1.0)
                    / (F.coalesce(F.col("_ctx"), F.lit(0)) + F.col("_v"))
                ),
            ),
        )
    )
    return scored.groupBy(id_col, stratum_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("_logp"), 4).alias("cross_entropy"),
        F.round(F.exp(F.round(-F.avg("_logp"), 4)), 4).alias("perplexity"),
    )


def ccnet_datasheet(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_stop_hits: int = 3,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """The CCNet pipeline (Wenzek et al. 2020) end-to-end as a
    per-language datasheet: language-id gate → per-language bigram-LM
    perplexity → head/middle/tail split per language → one funnel row
    per (language, bucket).

    Stage semantics, chaining the audited operators:

    1. **langid gate** — :func:`~linz_bde_uploader_spark.functions.
       text.lang_guess`'s stopword-density detector; a document whose
       detector output is 'other' (fewer than ``min_stop_hits``
       stopword hits) is an UNCONFIDENT identification and drops, the
       analog of CCNet's fastText-score < 0.5 cut. The per-language
       GRAIN is ``lang_col`` — the corpus's language label, the same
       stratum :func:`perplexity_buckets` owns (the binary heuristic
       gates confidence; a model-based multi-class detector would
       replace the label behind the same column contract).
    2. **per-language LM** — :func:`train_stratified_bigram_lm` over
       the gate survivors: ONE model per language, trained in one job.
    3. **bucket split** — within each language, ``percent_rank`` over
       the TOTAL order (perplexity asc, id asc) cut at ``cuts`` into
       head/middle/tail — rank arithmetic, engine-independent on tied
       4-dp scores (the :func:`perplexity_buckets` rule).
    4. **datasheet** — per (language, bucket): bucket doc/token
       counts, exact scaled-integer mean perplexity (sum of
       round(ppl·10⁴) longs, ONE double division at the end — no
       float fold-order can move the 4-dp mean), beside the language's
       funnel columns (ingested → langid survivors → LM-scoreable).
       Every observed language emits all three bucket rows, zeros
       when empty — a language the gate annihilates still surfaces
       (the mixture family's no-silent-drop rule).

    Returns ``(lang, bucket, n_ingest, n_langid, n_scored, n_docs,
    tokens, mean_ppl)`` ordered by (lang, bucket).

    Scale: the gate and token counts are map-only folds; LM train +
    score is the stratified plan above (keys widened by the language);
    the bucket split is ONE window per language partition; every
    rollup is a bounded |langs|- or |langs×3|-key aggregate. No
    driver loop, no collect, no per-row Python.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from linz_bde_uploader_spark.functions.text import (  # noqa: PLC0415
        lang_guess,
        token_count,
    )

    c1, c2 = cuts
    if not 0.0 < c1 < c2 < 1.0:
        raise ValueError("cuts must satisfy 0 < c1 < c2 < 1")
    base = docs.select(
        F.col(id_col),
        F.col(lang_col).cast("string").alias("lang"),
        F.col(text_col).alias("_text"),
        token_count(F.col(text_col)).cast("long").alias("_nt"),
        (lang_guess(F.col(text_col), min_stop_hits) == F.lit("en")).alias(
            "_conf"
        ),
    )
    ing = base.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_ingest")
    )
    g = base.filter(F.col("_conf"))
    gl = g.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_langid")
    )
    # ONE tracked bigram explode feeds train AND score (the rho_select
    # r16 fold), and the scored frame is tracked for its own two
    # consumers (the n_scored funnel count + the bucket window join) —
    # untracked, the whole score pipeline (explode + model joins + agg)
    # re-evaluated per consumer. sc is one row per scoreable doc
    # (id, lang, 3 numerics) — doc-bounded, narrower than the corpus.
    # Controlled alternating A/B at sf0.1 (two 5-rep laps, old module
    # loaded from git vs this, result-parity asserted each lap): mins
    # 4.64 -> 4.14 and 3.93 -> 3.37; medians 4.90 -> 5.35 on the
    # noisier lap, 4.60 -> 3.98 on the quieter — net win, sized like
    # rho_select's on the same shape.
    from linz_bde_uploader_spark.caching import track  # noqa: PLC0415

    bi_g = track(doc_bigrams(g, id_col, "_text", extra_cols=("lang",)))
    model = train_stratified_bigram_lm(g, id_col, "_text", "lang",
                                       _bi=bi_g)
    sc = track(
        score_documents_stratified(g, model, id_col, "_text", "lang",
                                   _bi=bi_g)
    )
    scl = sc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_scored")
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("perplexity").asc(), F.col(id_col).asc()
    )
    bk = (
        sc.join(g.select(id_col, "_nt"), [id_col])
        .withColumn("_pr", F.percent_rank().over(w))
        .withColumn(
            "bucket",
            F.when(F.col("_pr") < F.lit(c1), F.lit("head"))
            .when(F.col("_pr") < F.lit(c2), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
    )
    br = bk.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("tokens"),
        F.sum(F.round(F.col("perplexity") * 10000).cast("long")).alias("_sp"),
    )
    frame = ing.select(
        "lang",
        F.explode(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
        ).alias("bucket"),
    )
    return (
        frame.join(ing, ["lang"])
        .join(F.broadcast(gl), ["lang"], "left")
        .join(F.broadcast(scl), ["lang"], "left")
        .join(br, ["lang", "bucket"], "left")
        .select(
            "lang",
            "bucket",
            "n_ingest",
            F.coalesce(F.col("n_langid"), F.lit(0)).cast("long").alias(
                "n_langid"
            ),
            F.coalesce(F.col("n_scored"), F.lit(0)).cast("long").alias(
                "n_scored"
            ),
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce(F.col("tokens"), F.lit(0)).cast("long").alias("tokens"),
            F.when(
                F.coalesce(F.col("n_docs"), F.lit(0)) > 0,
                F.round(
                    F.col("_sp") / (F.lit(10000.0) * F.col("n_docs")), 4
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_ppl"),
        )
        .orderBy("lang", "bucket")
    )


def rho_select(
    docs: DataFrame,
    keep_num: int = 1,
    keep_den: int = 2,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RHO-loss selective data sampling at DOCUMENT grain (Mindermann
    et al. 2022, "Prioritized Training on Points that are Learnable,
    Worth Learning, and Not Yet Learnt"; Lin et al. 2024, "RHO-1: Not
    All Tokens Are What You Need" applies the same criterion at token
    grain) — the per-document counterpart of DoReMi's per-domain
    excess loss, and the selection face of the LM family: keep the
    documents a strong in-domain reference model finds EASY but the
    uniform-mixture model finds HARD (high reducible holdout loss —
    learnable, not yet learnt); drop the rest (noise the reference
    also can't compress, or content the uniform model already knows).

    The excess-loss signal is :func:`~linz_bde_uploader_spark.
    functions.sampling.doremi_plan`'s, re-used at doc grain (one
    implementation, two mixture drivers):

    - ``ce_uniform`` — the doc's cross-entropy under the GLOBAL
      add-one bigram LM (:func:`train_bigram_lm` over the whole
      corpus, the uniform-mixture proxy model);
    - ``ce_domain`` — the same doc under its OWN domain's model
      (:func:`train_stratified_bigram_lm`), the best-achievable
      in-domain reference standing in for the paper's holdout model;
    - ``excess = round(max(ce_uniform − ce_domain, 0), 4)`` — the
      clamped reducible loss (a difference of two 4-dp values,
      exact).

    Selection is per SOURCE (rank within the domain, the "select the
    top ρ of each domain" deployment): total order ``excess`` DESC,
    id ASC within each source; keep the top ``ceil(n_src ·
    keep_num / keep_den)`` by the ALL-INTEGER ceiling comparison
    ``(rank − 1) · keep_den < n_src · keep_num`` (the D4 exact-cut
    discipline — no float ratio can flip a boundary row). Every
    scoreable doc emits its audit row, both sides of the cut;
    documents with fewer than two tokens are outside the frame (the
    LM family's documented minimum-length gate).

    Returns ``(doc_id, source, ce_uniform, ce_domain, excess, rnk,
    n_src, keep)`` — ``keep`` an int flag.

    Scale: two LM train+score passes (count tables bounded by bigram
    vocab), one doc-grain equi-join, and ONE window per source
    partition (rank + count — |docs/source| rows per partition, the
    ccnet_datasheet / per-cluster-rank shape; a global-fraction
    variant at extreme skew would swap the exact rank for an
    approx-quantile threshold on ``excess``). No driver loop, no
    collect, no per-row Python.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if keep_num <= 0 or keep_den <= 0:
        raise ValueError("keep fraction must be positive")

    d2 = docs.select(
        F.col(id_col),
        F.col(group_col).cast("string").alias("source"),
        F.col(text_col).alias("_text"),
    )
    # ONE tracked bigram explode feeds all four passes (uniform train,
    # uniform score, stratified train, stratified score) — untracked,
    # each pass re-tokenized and re-exploded the corpus (r16, guide
    # §2.4/§5; VERDICT r15 item 4). The uniform passes read a projection
    # of the same persisted rows, so no second explode exists in the
    # plan. The frame is one row per bigram OCCURRENCE — corpus-sized,
    # not model-sized; at 100 TB prefer writing the explode to storage
    # once (same shape, durable) over a memory persist. Measured at
    # sf0.1: isolated 5.29 -> 4.51 s (min over repeats); controlled
    # alternating same-session A/B old-vs-new min 6.00 -> 5.01,
    # median 7.90 -> 5.80. (The analogous count-table fold in
    # ngram_order_ablation was A/B'd the same way and REGRESSED —
    # see the note there; this one shares a frame with FOUR consumers
    # across two train+score pipelines, which is past the barrier
    # break-even.)
    from linz_bde_uploader_spark.caching import track  # noqa: PLC0415

    bi_src = track(doc_bigrams(d2, id_col, "_text", extra_cols=("source",)))
    bi_uni = bi_src.select(id_col, "prev", "cur")
    ref = score_documents(
        d2, train_bigram_lm(d2, id_col, "_text", _bi=bi_uni),
        id_col, "_text", _bi=bi_uni,
    ).select(id_col, F.col("cross_entropy").alias("ce_uniform"))
    dom = score_documents_stratified(
        d2,
        train_stratified_bigram_lm(d2, id_col, "_text", "source",
                                   _bi=bi_src),
        id_col,
        "_text",
        "source",
        _bi=bi_src,
    ).select(id_col, "source", F.col("cross_entropy").alias("ce_domain"))
    scored = dom.join(ref, [id_col]).withColumn(
        "excess",
        F.round(
            F.greatest(F.col("ce_uniform") - F.col("ce_domain"), F.lit(0.0)), 4
        ),
    )
    w = Window.partitionBy("source")
    wo = w.orderBy(F.desc("excess"), F.col(id_col))
    return scored.select(
        id_col,
        "source",
        "ce_uniform",
        "ce_domain",
        "excess",
        F.row_number().over(wo).alias("rnk"),
        F.count(F.lit(1)).over(w).alias("n_src"),
    ).withColumn(
        "keep",
        (
            (F.col("rnk") - 1) * F.lit(int(keep_den))
            < F.col("n_src") * F.lit(int(keep_num))
        ).cast("int"),
    )


def unigram_score_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Add-one UNIGRAM LM perplexity per document — the order-1 member
    of the scorer family (:func:`score_documents` is order 2,
    :func:`trigram_score_documents` order 3): ``p(t) = (c(t) + 1) /
    (T + V)`` over the global token counts, the same add-one smoothing
    and 4-dp rounding contract as the bigram scorer. Every document
    with ≥ 1 token scores (no bigram minimum); the count table is
    bounded by the vocabulary and the ``(T, V)`` totals row is the
    family's ONE-ROW broadcast (the whitelisted scalar-subquery
    shape).

    Returns ``(id, n_grams, cross_entropy, perplexity)``."""
    t = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok"),
    )
    cnt = t.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    tot = cnt.agg(
        F.sum("_c").cast("double").alias("_tt"),
        F.count(F.lit(1)).cast("long").alias("_v"),
    )
    scored = (
        t.join(cnt, "tok")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_logp",
            F.log((F.col("_c") + F.lit(1.0)) / (F.col("_tt") + F.col("_v"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.round(-F.avg("_logp"), 4).alias("cross_entropy"),
        F.round(F.exp(F.round(-F.avg("_logp"), 4)), 4).alias("perplexity"),
    )


def ngram_order_ablation(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LM-ORDER ablation of the perplexity gate — the LM family's
    policy-knob datasheet beside the decontam-n and dedup-threshold
    ablations: CCNet ships a 5-gram KenLM, the engine's gate is a
    bigram, and "which order is worth its count table" is priced here
    by scoring the SAME document set under orders 1, 2 and 3 (each
    scorer runs VERBATIM — :func:`unigram_score_documents`,
    :func:`score_documents` over :func:`train_bigram_lm`,
    :func:`trigram_score_documents`).

    Comparison-set discipline: only documents with ≥ 3 tokens (every
    order scoreable) enter the means — a shorter doc would bias the
    lower orders' rows with documents the trigram cannot score. Each
    scorer still TRAINS on its own full frame, exactly as deployed.

    Per order: ``(ord, n_docs, n_grams, mean_ce, mean_ppl)`` — the
    means are exact scaled-integer folds of the scorers' 4-dp per-doc
    values (sum of round(x·10⁴) longs, ONE double division at the
    end — the ccnet_datasheet convention), so no float fold order can
    move them. Lower mean_ce at higher order = the paid-for context
    helps on THIS corpus; an inversion (trigram above bigram) is the
    sparse-counts signal that the bigger table is memorizing noise.

    Scale: the three measured scorer plans (count tables bounded by
    vocab / bigram / trigram type counts; the one-row totals
    broadcasts are the family's whitelisted shape), one ≥3-token id
    frame broadcast-joined into each score stream, three 1-row aggs
    union'd shuffle-free. No driver loop, no collect.
    """
    common = docs.filter(
        F.size(F.split(F.trim(F.col(text_col)), " ")) >= 3
    ).select(id_col)
    # Measured and left UNshared (r16 optimization pass): the unigram
    # count table is consumed by the order-1 scorer AND the trigram
    # model (uni2/uni3 + totals), the bigram pair-count table by the
    # order-2 LM AND the trigram's bi12/bi23 — tracking both and
    # injecting them into all consumers (the VERDICT r15 item-5 fold)
    # was A/B'd controlled, alternating, same session at sf0.1 and
    # REGRESSED: old 5.42 min / 5.59 median vs shared 5.90 / 5.94.
    # Each duplicated subtree is one map-side explode + partial-agg
    # shuffle, cheaper than the persist's materialization barrier —
    # the same measured tradeoff as the r15 trigram-table note below.
    uni = unigram_score_documents(docs, id_col, text_col)
    bi = score_documents(
        docs, train_bigram_lm(docs, id_col, text_col), id_col, text_col
    ).withColumnRenamed("n_bigrams", "n_grams")
    tri = trigram_score_documents(
        docs, id_col=id_col, text_col=text_col
    ).withColumnRenamed("n_trigrams", "n_grams")

    def _fold(scored: DataFrame, order: int) -> DataFrame:
        s = scored.join(common, [id_col], "left_semi")
        return s.agg(
            F.lit(int(order)).alias("ord"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.round(
                F.sum(F.round(F.col("cross_entropy") * 1e4).cast("long"))
                / (F.lit(1e4) * F.count(F.lit(1))),
                4,
            ).alias("mean_ce"),
            F.round(
                F.sum(F.round(F.col("perplexity") * 1e4).cast("long"))
                / (F.lit(1e4) * F.count(F.lit(1))),
                4,
            ).alias("mean_ppl"),
        )
    return (
        _fold(uni, 1)
        .unionByName(_fold(bi, 2))
        .unionByName(_fold(tri, 3))
        .orderBy("ord")
    )
