"""Benchmark decontamination — remove train/test n-gram overlap.

The standard guard against evaluation leakage in training corpora: any
document that shares a word n-gram with a benchmark/eval set is flagged
(and usually dropped). This is the n-gram-overlap decontamination
described publicly for GPT-3 (Brown et al. 2020, appendix C) and PaLM;
the reference engine has no analog (its surface stops at SQL scalar
functions, SURVEY §2.7) — this extends the engine for LLM-pipeline use.

Scale design (100 TB corpus, small benchmark set):

* n-grams are generated as pure array-Column arithmetic (whole-stage
  codegen, no Python in the row path) with the SAME tokenization as
  ``functions.text.tokens`` so fingerprints agree across operators.
* The benchmark gram set is tiny (eval suites are MBs, the corpus is
  TBs) — it is ``broadcast()`` so the membership probe is a MAP-ONLY
  broadcast left-semi join: the corpus never shuffles its text.
* The only shuffle is the final per-doc aggregation of hit counts over
  the (doc_id, gram) hit stream — narrow rows, partial-agg combined
  map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.text import tokens


def word_ngrams(col: Column | str, n: int) -> Column:
    """Array of space-joined word ``n``-grams; [] for docs shorter than
    ``n`` tokens. sequence() is clamped to >= 1 because Spark's
    sequence(1, 0) generates a DESCENDING [1, 0] (DuckDB's
    generate_series yields empty) — the short-doc branch owns that case.
    """
    toks = tokens(col)
    cnt = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(cnt <= 0, F.array().cast("array<string>")).otherwise(grams)


def benchmark_grams(
    bench: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-gram set of the benchmark corpus — one `gram` column.

    Distinct BEFORE broadcast keeps the broadcast payload minimal; at
    eval-suite sizes this is a few MB, far under the broadcast limit.
    """
    return (
        bench.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-document contamination evidence: (id_col, n_hits) for every
    corpus document sharing >= 1 word n-gram with ``bench``, where
    ``n_hits`` counts the DISTINCT shared grams.

    Plan shape: corpus explodes its grams (map-only), probes the
    broadcast benchmark set (map-only semi via inner broadcast join on
    the distinct gram set), then one narrow shuffle aggregates hit
    counts per document. Clean documents produce zero rows — they are
    never shuffled at all.
    """
    grams = F.broadcast(benchmark_grams(bench, text_col, n))
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("gram"),
    )
    return (
        corpus_grams.join(grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Corpus minus every document that shares an n-gram with ``bench``
    (left-anti join on the contaminated-id set). The anti join's right
    side is only the contaminated ids — tiny — so AQE turns it into a
    broadcast anti join; the surviving corpus never shuffles."""
    dirty = contamination_hits(corpus, bench, text_col, id_col, n).select(id_col)
    return corpus.join(dirty, id_col, "left_anti")


def _verified_bench_spans(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    min_span_tokens: int,
    n: int,
):
    """Shared span machinery of the corpus-vs-benchmark family: the
    ExactSubstr verify stage (positional n-gram tables equi-joined on
    the shingle hash AND filtered on the shingle STRING so a hash
    collision breaks a run; maximal runs per alignment diagonal via
    the islands window; length clamps to both sides) with the
    benchmark side's positional table broadcast — no nomination, the
    bounded-benchmark contract. Returns ``(sized, staged_c,
    staged_b)`` where ``sized`` is one row per maximal shared span
    ``(id_col, bench_id, start_c, start_b, span_len)`` at
    ``span_len >= min_span_tokens``, and the staged frames carry each
    side's token arrays for rebuilds/denominators."""
    from pyspark.sql import Window  # noqa: PLC0415

    from linz_bde_uploader_spark.functions.dedup import (  # noqa: PLC0415
        _positional_shingles,
        _staged_tokens,
    )

    staged_c = _staged_tokens(corpus, id_col, text_col)
    ex_c = _positional_shingles(staged_c, id_col, n)
    staged_b = _staged_tokens(bench, id_col, text_col)
    ex_b = _positional_shingles(staged_b, id_col, n)
    m = ex_c.select(
        F.col(id_col),
        F.col("_nt").alias("_ntc"),
        F.col("start").alias("_sc"),
        "sv",
        F.col("sh").alias("_shc"),
    ).join(
        F.broadcast(
            ex_b.select(
                F.col(id_col).alias("bench_id"),
                F.col("_nt").alias("_ntb"),
                F.col("start").alias("_sb"),
                "sv",
                F.col("sh").alias("_shb"),
            )
        ),
        "sv",
    ).filter(F.col("_shc") == F.col("_shb"))
    diag = F.col("_sc") - F.col("_sb")
    isl = F.col("_sc") - F.row_number().over(
        Window.partitionBy(id_col, "bench_id", diag).orderBy("_sc")
    )
    runs = m.select(
        id_col, "bench_id", "_sc", "_sb", "_ntc", "_ntb",
        diag.alias("_diag"), isl.alias("_isl"),
    )
    spans = runs.groupBy(id_col, "bench_id", "_diag", "_isl").agg(
        F.min("_sc").alias("start_c"),
        F.min("_sb").alias("start_b"),
        F.min("_ntc").alias("_ntc"),
        F.min("_ntb").alias("_ntb"),
        (F.count(F.lit(1)) + F.lit(n - 1)).alias("_raw"),
    )
    span_len = F.least(
        F.col("_raw"),
        F.col("_ntc") - F.col("start_c") + 1,
        F.col("_ntb") - F.col("start_b") + 1,
    )
    sized = spans.select(
        id_col,
        "bench_id",
        F.col("start_c").cast("long").alias("start_c"),
        F.col("start_b").cast("long").alias("start_b"),
        span_len.cast("long").alias("span_len"),
    ).filter(F.col("span_len") >= min_span_tokens)
    return sized, staged_c, staged_b


def _covered_positions(
    sized: DataFrame, key_col: str, start_col: str
) -> DataFrame:
    """DISTINCT (key, pos) token positions covered by any span in
    ``sized`` on the chosen side (``start_c`` = corpus doc positions,
    ``start_b`` = benchmark item positions) — the shared coverage
    explode of all three report grains, factored out so overlapping
    spans can never double-count differently between them. Consumers
    aggregate (count for mass, collect_set for the scrub rebuild)."""
    return sized.select(
        F.col(key_col),
        F.explode(
            F.sequence(
                F.col(start_col),
                F.col(start_col) + F.col("span_len") - F.lit(1),
            )
        ).alias("pos"),
    ).distinct()


def contamination_spans(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_span_tokens: int = 6,
    n: int = 3,
) -> DataFrame:
    """SPAN-grain benchmark decontamination — the published GPT-3/PaLM
    method proper (Brown et al. 2020 appendix C; Chowdhery et al.
    2022): locate every maximal token span shared verbatim between a
    training document and the eval benchmark and REMOVE THE SPAN,
    keeping the surrounding unique prose — where :func:`decontaminate`
    drops the whole document on a single 8-gram hit (high collateral
    on long documents that quote one eval item) and
    :func:`semantic_contamination` only flags. Per corpus document:

    - ``n_spans`` — maximal contaminated spans (>= ``min_span_tokens``)
    - ``n_bench`` — distinct benchmark items sharing a span
    - ``contaminated_tokens`` — DISTINCT corpus token positions inside
      any span (overlapping spans never double-count)
    - ``max_span`` — longest single span
    - ``contam_ratio`` — contaminated_tokens / doc tokens, 4 dp
    - ``clean_text`` — the document with contaminated positions
      removed token-for-token ('' when fully contaminated)

    Every corpus document emits a row (zeros + original text when
    clean): a decontamination pass must decide per document.

    Machinery: the ExactSubstr verify stage verbatim
    (:func:`~linz_bde_uploader_spark.functions.dedup.
    cross_doc_exact_spans` stage 2 — positional n-gram tables
    equi-joined on the shingle hash AND filtered on the shingle
    STRING so a hash collision breaks a run instead of extending it;
    maximal runs per alignment diagonal via the islands window;
    length clamps to both sides) plus the scrub rebuild of
    :func:`~linz_bde_uploader_spark.functions.dedup.
    scrub_cross_doc_spans`. The NOMINATION stage of the dedup family
    is deliberately ABSENT: rarity bounding exists to keep a
    corpus×corpus self-join tractable, but here the right side is the
    benchmark — a bounded artifact (eval suites are MBs against a
    100-TB corpus) — so its full positional table is ``broadcast()``
    and the probe is one map-side hash join; a rarity filter would
    only cost recall on common-phrase contamination, and a
    decontamination gate wants recall. Reference parity anchor: the
    reference applies per-column character/date FIXUPS to rows rather
    than dropping them (lib/LINZ/BdeUpload.pm clean path); span
    scrubbing is the same repair-not-reject contract at token grain.

    Scale: corpus-side positional explode is linear in corpus tokens
    and map-only; the probe joins against the broadcast benchmark
    table (no corpus shuffle); only MATCHED positions shuffle into
    the islands window (keyed by (doc, bench item, diagonal));
    coverage/stat aggs are keyed by contaminated docs only; the
    rebuild is one broadcast-size left join + map-only array
    arithmetic over the corpus scan."""
    sized, staged_c, _ = _verified_bench_spans(
        corpus, bench, id_col, text_col, min_span_tokens, n
    )
    dpos = (
        _covered_positions(sized, id_col, "start_c")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_dups"))
    )
    stats = sized.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.countDistinct("bench_id").cast("long").alias("n_bench"),
        F.max("span_len").cast("long").alias("max_span"),
    )
    joined = (
        staged_c.join(stats, [id_col], "left")
        .join(dpos, [id_col], "left")
        .withColumn(
            "_dups",
            F.coalesce(F.col("_dups"), F.array().cast("array<bigint>")),
        )
    )
    kept_pos = F.array_except(
        F.sequence(F.lit(1).cast("long"), F.col("_nt").cast("long")),
        F.col("_dups"),
    )
    kept = F.transform(
        kept_pos, lambda p: F.element_at(F.col("_toks"), p.cast("int"))
    )
    return joined.select(
        F.col(id_col),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("n_bench"), F.lit(0)).cast("long").alias("n_bench"),
        F.size("_dups").cast("long").alias("contaminated_tokens"),
        F.coalesce(F.col("max_span"), F.lit(0)).cast("long").alias(
            "max_span"
        ),
        F.round(
            F.size("_dups") / F.greatest(F.col("_nt"), F.lit(1)), 4
        ).alias("contam_ratio"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


def benchmark_leakage(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_span_tokens: int = 6,
    n: int = 3,
) -> DataFrame:
    """Per-BENCHMARK-ITEM leakage report — the reverse grain of
    :func:`contamination_spans` and the accounting the GPT-3 paper
    publishes as its "dirty" eval-item analysis (Brown et al. 2020
    appendix C reports per-benchmark clean/dirty splits): for each
    eval item, how many TRAINING documents share a verbatim span with
    it and how much of the item is covered. An item whose
    ``leak_ratio`` is high was effectively memorizable from the
    corpus — its eval score should be reported on the clean subset.

    Per benchmark document (every item emits; zeros = provably clean
    at this span grain):

    - ``n_docs`` — distinct training docs sharing >= 1 span
    - ``n_spans`` — maximal shared spans across all of them
    - ``leaked_tokens`` — DISTINCT item token positions inside any
      span (overlaps never double-count)
    - ``max_span`` — longest single shared span
    - ``leak_ratio`` — leaked_tokens / item tokens, 4 dp

    Same machinery and bounds as :func:`contamination_spans`
    (:func:`_verified_bench_spans` — broadcast benchmark, sh-verified
    islands, no nomination); only the aggregation side flips from the
    corpus document to the benchmark item, so the two reports are
    guaranteed to describe the SAME span set."""
    sized, _, staged_b = _verified_bench_spans(
        corpus, bench, id_col, text_col, min_span_tokens, n
    )
    bpos = (
        _covered_positions(sized, "bench_id", "start_b")
        .groupBy("bench_id")
        .agg(F.count(F.lit(1)).cast("long").alias("leaked_tokens"))
    )
    stats = sized.groupBy("bench_id").agg(
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.max("span_len").cast("long").alias("max_span"),
    )
    return (
        staged_b.select(F.col(id_col).alias("bench_id"), "_nt")
        .join(stats, ["bench_id"], "left")
        .join(bpos, ["bench_id"], "left")
        .select(
            "bench_id",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias(
                "n_docs"
            ),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias(
                "n_spans"
            ),
            F.coalesce(F.col("leaked_tokens"), F.lit(0))
            .cast("long")
            .alias("leaked_tokens"),
            F.coalesce(F.col("max_span"), F.lit(0)).cast("long").alias(
                "max_span"
            ),
            F.round(
                F.coalesce(F.col("leaked_tokens"), F.lit(0))
                / F.greatest(F.col("_nt"), F.lit(1)),
                4,
            ).alias("leak_ratio"),
        )
    )


def contamination_datasheet(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_span_tokens: int = 6,
    n: int = 3,
) -> DataFrame:
    """Per-SOURCE contamination datasheet — the third grain of the
    span family (doc grain :func:`contamination_spans`, eval-item
    grain :func:`benchmark_leakage`, source grain here) and the row a
    corpus card publishes per ingest source: a feed that keeps
    quoting the eval suite is a PROCUREMENT problem (drop or re-crawl
    the source), which neither per-doc scrubbing nor per-item eval
    accounting surfaces. Per source:

    - ``n_docs`` / ``n_contaminated`` / ``contaminated_frac`` (4 dp) —
      how widespread contamination is in the feed
    - ``n_spans`` — total maximal shared spans
    - ``contaminated_tokens`` / ``total_tokens`` / ``contam_ratio``
      (4 dp) — how much of the feed's token mass is verbatim
      benchmark text (distinct positions per doc, overlaps never
      double-count)
    - ``max_span`` — the worst single quotation

    Same machinery and bounds as the sibling grains
    (:func:`_verified_bench_spans` — broadcast benchmark, sh-verified
    islands, no nomination), so all three reports describe the SAME
    span set; only the aggregation key changes. Scale: adds one
    ``id → group`` join (corpus-keyed, column-pruned to two columns)
    and a |sources|-key rollup to the already-bounded span chain —
    the scrub rebuild is deliberately NOT run (the datasheet never
    touches token arrays)."""
    sized, staged_c, _ = _verified_bench_spans(
        corpus, bench, id_col, text_col, min_span_tokens, n
    )
    dcov = (
        _covered_positions(sized, id_col, "start_c")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_cov"))
    )
    stats = sized.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_ns"),
        F.max("span_len").cast("long").alias("_mx"),
    )
    per_doc = (
        staged_c.select(F.col(id_col), "_nt")
        .join(stats, [id_col], "left")
        .join(dcov, [id_col], "left")
        .join(corpus.select(F.col(id_col), F.col(group_col)), [id_col])
        .select(
            F.col(group_col).alias("source"),
            F.col("_nt").cast("long").alias("_nt"),
            F.coalesce(F.col("_ns"), F.lit(0)).alias("_ns"),
            F.coalesce(F.col("_cov"), F.lit(0)).alias("_cov"),
            F.coalesce(F.col("_mx"), F.lit(0)).alias("_mx"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("_cov") > 0).cast("long"))
        .cast("long")
        .alias("n_contaminated"),
        F.round(
            F.sum((F.col("_cov") > 0).cast("long"))
            / F.count(F.lit(1)),
            4,
        ).alias("contaminated_frac"),
        F.sum("_ns").cast("long").alias("n_spans"),
        F.sum("_cov").cast("long").alias("contaminated_tokens"),
        F.sum("_nt").cast("long").alias("total_tokens"),
        F.round(
            F.sum("_cov") / F.greatest(F.sum("_nt"), F.lit(1)), 4
        ).alias("contam_ratio"),
        F.max("_mx").cast("long").alias("max_span"),
    )


def semantic_contamination(
    corpus: DataFrame,
    bench_vectors: "list[tuple[int, list[float]]]",
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EMBEDDING-grain decontamination — the paraphrase-robust
    complement of the n-gram probe above: an eval item rewritten in
    different words shares no 8-gram but still sits next to its
    source in embedding space, so modern pipelines ALSO flag training
    documents whose nearest benchmark embedding exceeds a cosine
    threshold (the SemDeDup/embedding-dedup idea pointed at the
    train/test boundary instead of train/train).

    Edge contract: a zero-norm corpus vector has no defined cosine —
    under this engine's ANSI mode (the session default) the division
    RAISES ``DIVIDE_BY_ZERO`` at runtime, so such a row fails the
    job loudly rather than ever scoring as silently clean; filter
    zero vectors upstream if they are expected (the
    ``image_text_alignment`` gate shows the sentinel-guard
    alternative when per-row tolerance is wanted).

    ``bench_vectors`` is the BOUNDED benchmark artifact — a Python
    list of ``(bench_id, vector)`` collected once upstream (eval
    suites are KBs of vectors; same bounded-model-artifact class as
    k-means centroids and DSIR λ-tables). It is embedded as ONE
    literal array of structs and scored with ONE ``transform`` lambda
    (loop the data, not the plan — the unrolled-per-literal form is a
    codegen compile bomb), so the whole operator is MAP-ONLY: no
    join, no shuffle, no broadcast round-trip; the corpus is scanned
    exactly once at any scale.

    Per corpus row: ``(id, top_bench_id, top_score, contaminated)``
    where top_score is the max 6-dp-rounded cosine over the benchmark
    (ties: lowest bench id — encoded as struct max over
    ``(score, -bench_id)``) and ``contaminated = top_score >=
    threshold``. Every row emits (an audit needs the clean margin,
    not only the hits)."""
    import math  # noqa: PLC0415

    from linz_bde_uploader_spark.functions.similarity import (  # noqa: PLC0415
        dot,
        norm,
    )

    if not bench_vectors:
        raise ValueError("bench_vectors is empty: nothing to probe against")
    # benchmark norms are plan-build-time literals (same sequential
    # product fold + correctly-rounded sqrt as the engines, so the
    # doubles are identical); the row norm is STAGED once — a naive
    # cosine() inside the lambda would recompute it per bench entry,
    # |bench|× redundant work on the hot map.
    # Rendered as ONE F.expr string (r16, guide §5 / litexpr): the
    # per-element F.lit form paid one py4j round trip per literal —
    # |bench|·(dims+2) ≈ 1,700 calls ≈ seconds of pure driver time
    # per query build. Identical Literal nodes either way (litexpr's
    # bit-exactness contract, pinned by tests).
    from linz_bde_uploader_spark.functions.litexpr import (  # noqa: PLC0415
        sql_double,
        sql_double_array,
    )

    blit = F.expr(
        "array("
        + ", ".join(
            f"named_struct('bid', {int(bid)}L, "
            f"'bv', {sql_double_array(vec)}, "
            f"'bn', {sql_double(math.sqrt(sum(float(x) * float(x) for x in vec)))})"
            for bid, vec in bench_vectors
        )
        + ")"
    )
    staged = corpus.withColumn("_vn", norm(F.col(vec_col)))
    scored = F.transform(
        blit,
        lambda b: F.struct(
            F.round(
                dot(F.col(vec_col), b["bv"]) / (F.col("_vn") * b["bn"]),
                6,
            ).alias("score"),
            (-b["bid"]).alias("nid"),
        ),
    )
    top = F.array_max(scored)
    return staged.withColumn("_top", top).select(
        F.col(id_col),
        (-F.col("_top.nid")).cast("long").alias("top_bench_id"),
        F.col("_top.score").alias("top_score"),
        (F.col("_top.score") >= F.lit(float(threshold))).alias(
            "contaminated"
        ),
    )


def ngram_overlap_ablation(
    corpus: DataFrame,
    bench: DataFrame,
    ns: tuple = (2, 3, 4, 5),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """N-gram-SIZE ablation of the overlap decontamination gate — the
    decontam family's policy-knob datasheet beside the dedup family's
    threshold/snapshot/ordering ablations: the published recipes
    disagree on n (GPT-3 used 13-gram spans, PaLM 8, GPT-2's WebText
    analysis 8, the Pile 13, FineWeb 10; small n over-flags, large n
    under-flags), and this datasheet prices each candidate n on the
    actual corpus in ONE job.

    All sizes run in one plan by widening every grouping/join key
    with an ``n`` column (the ``train_stratified_bigram_lm`` trick):
    each side explodes a literal ``ns`` array (map-only — no join,
    no per-n driver loop), builds its n-grams with a column-length
    :func:`~pyspark.sql.functions.slice`, and the contamination
    probe is :func:`contamination_hits`'s broadcast-join plan with
    ``(n, gram)`` keys instead of ``(gram,)``. Per-doc hit counts
    fold to one |ns|-key datasheet row per size.

    Monotonicity contract (pinned by the pytest): a shared
    ``(n+1)``-gram contains shared ``n``-grams, so the contaminated
    set at ``n+1`` is a SUBSET of the set at ``n`` —
    ``contaminated_docs`` is non-increasing in ``n``. (Exactly the
    nesting the ANN radius ablation pins for probe sets.)

    Returns one row per ``n`` ordered by ``n``: ``(n, bench_grams,
    corpus_docs, contaminated_docs, contaminated_frac, total_hits,
    mean_hits)`` — fractions and the per-contaminated-doc mean at
    4 dp, each ONE double division of exact integer counts; a size
    with zero hits still emits its row (zeros; the no-silent-drop
    rule).

    Scale: the widened gram explode is |ns|× the single-size plan's
    rows through the same map-only shape; the benchmark side stays
    broadcast-bounded (|ns|·|bench grams|); the rollups are |docs|-
    then |ns|-key aggs. No collect, no driver loop, no per-row
    Python.
    """
    szs = sorted(int(x) for x in ns)
    n_arr = F.array(*[F.lit(x) for x in szs])

    def _widened_grams(df: DataFrame) -> DataFrame:
        staged = df.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_toks")
        )
        w = staged.select(id_col, F.explode(n_arr).alias("n"), "_toks")
        cnt = F.size("_toks") - (F.col("n") - F.lit(1))
        grams = F.when(
            cnt <= 0, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("_toks"), i, F.col("n"))
                ),
            )
        )
        return w.select(
            id_col, "n", F.explode(F.array_distinct(grams)).alias("gram")
        )

    cg = _widened_grams(corpus)
    bg = _widened_grams(bench).select("n", "gram").distinct()
    bc = bg.groupBy("n").agg(F.count(F.lit(1)).alias("bench_grams"))
    hits = (
        cg.join(F.broadcast(bg), ["n", "gram"])
        .groupBy("n", id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_h"))
    )
    agg = hits.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("contaminated_docs"),
        F.sum("_h").cast("long").alias("total_hits"),
    )
    tot = (
        corpus.select(F.explode(n_arr).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("corpus_docs"))
    )
    return (
        tot.join(F.broadcast(bc), ["n"], "left")
        .join(F.broadcast(agg), ["n"], "left")
        .select(
            "n",
            F.coalesce("bench_grams", F.lit(0)).cast("long").alias(
                "bench_grams"
            ),
            "corpus_docs",
            F.coalesce("contaminated_docs", F.lit(0)).cast("long").alias(
                "contaminated_docs"
            ),
            F.round(
                F.coalesce("contaminated_docs", F.lit(0)).cast("double")
                / F.col("corpus_docs"),
                4,
            ).alias("contaminated_frac"),
            F.coalesce("total_hits", F.lit(0)).cast("long").alias(
                "total_hits"
            ),
            F.round(
                F.coalesce("total_hits", F.lit(0)).cast("double")
                / F.greatest(
                    F.coalesce("contaminated_docs", F.lit(0)), F.lit(1)
                ),
                4,
            ).alias("mean_hits"),
        )
        .orderBy("n")
    )
