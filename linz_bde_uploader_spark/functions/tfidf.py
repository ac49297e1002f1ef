"""Corpus-level term weighting — TF-IDF keyword extraction.

Ranks each document's terms by how characteristic they are of THAT
document against the whole corpus: term frequency × inverse document
frequency. Used in pipelines for keyword tagging, near-dup explanation,
and cheap topic features before any model runs.

Determinism note: the IDF here is the exact rational ``(N + 1) /
(df + 1)`` (add-one smoothed), NOT its logarithm — ``ln`` is the one
place where two engines' libm implementations can disagree in the last
ulp and break cross-engine hash equality. The ranking is monotone in
either form, so top-k per document is identical; the reported weight is
the rational one rounded to 6 dp.

Scale design (100 TB corpus):
- one shuffle for (doc, term) counts with map-side partial aggregation;
- document frequency derives from that same aggregate (no second pass
  over raw text);
- the per-term df table is orders of magnitude smaller than the corpus
  (vocabulary vs. tokens) — the join back is a plain shuffle join that
  AQE will broadcast when the vocab fits;
- top-k per document is one window pass with a unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.text import tokens


def doc_term_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf) — whitespace terms, one shuffle, partial-agg
    combined map-side. Empty terms (from stray separators) are dropped."""
    return (
        docs.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("term")
        )
        .filter(F.length("term") > 0)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document: (id, rank, term,
    weight) where ``weight = tf * (N + 1) / (df + 1)`` rounded to 6 dp.
    Ties break on the term string, so the ranking is total and
    engine-independent.

    The corpus size N is folded into the SAME plan as a broadcast
    one-row aggregate joined on a constant key (a BroadcastHashJoin, not
    a nested loop): no separate ``count()`` action, so the whole query
    is ONE job. N counts every document (including empty ones), matching
    the previous driver-side ``distinct().count()`` semantics."""
    dtc = doc_term_counts(docs, id_col, text_col)
    df_by_term = dtc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_df = F.broadcast(
        docs.select(id_col).distinct()
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_k", F.lit(1))
    )
    scored = (
        dtc.join(df_by_term, "term")
        .withColumn("_k", F.lit(1))
        .join(n_df, "_k")
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                F.col("tf").cast("double")
                * (F.col("_n") + F.lit(1)).cast("double")
                / (F.col("df") + F.lit(1)).cast("double"),
                6,
            ).alias("weight"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("weight").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "weight")
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Search-index build: ``(term, df, postings)`` with a SORTED posting
    list of distinct document ids per term — the batch product a
    retrieval layer consumes. ``min_df``/``max_df`` drop rare/stopword
    terms at the aggregate (the classic vocabulary pruning pass).

    Scale: one shuffle keyed by term with map-side partial
    ``collect_set``; posting lists are per-term, so the reduce state for
    a term is its df, not the corpus. A stopword-dense term's giant
    posting list is exactly what ``max_df`` exists to drop — set it, or
    cap retained lists downstream; the sort is per-list (inside the
    agg'd array), never a global sort."""
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    exploded = docs.select(
        F.col(id_col).alias("_doc"), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    agg = exploded.groupBy("term").agg(
        F.sort_array(F.collect_set("_doc")).alias("postings")
    )
    out = agg.select(
        "term",
        F.size("postings").cast("long").alias("df"),
        "postings",
    ).filter(F.col("df") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 retrieval: the ``k`` best documents for a bag of query
    terms — the lexical ranking half of every hybrid (BM25 + dense)
    retrieval stack, and the standard hard-negative miner for embedding
    training data.

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·len/avgdl))
        idf(t)   = ln(1 + (N - df + 0.5)/(df + 0.5))

    Determinism: idf's argument is an exact rational of integers; the
    one ln call is shared by both engines and the final score rounds to
    6 dp; the per-document term-score sum runs over the FIXED query
    term order (a left-to-right chain, not a fold over data).

    Scale: tf counts are FILTERED to the query terms before the
    aggregate (predicate pushdown: the shuffle carries only matching
    postings, a tiny fraction of the corpus); df/N/avgdl are one
    corpus-stats pass whose 1-row result broadcasts (the TF-IDF
    scalar-subquery shape); final ranking is TakeOrderedAndProject."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qlits = [F.lit(t) for t in query_terms]
    toks = docs.select(
        F.col(id_col), tokens(F.trim(F.col(text_col))).alias("_toks")
    )
    # one corpus pass: doc length + per-query-term tf (pure map side).
    # NB the closure factory: a `lambda t, q=q:` default-arg binding
    # would give the lambda TWO parameters, which PySpark's HOF layer
    # interprets as the (element, index) form — q would silently become
    # the array INDEX column.
    def _eq(qcol):
        return lambda t: t == qcol

    per_doc = toks.select(
        F.col(id_col),
        F.size("_toks").alias("_len"),
        *[
            F.size(F.filter("_toks", _eq(q))).alias(f"_tf{i}")
            for i, q in enumerate(qlits)
        ],
    )
    # corpus stats: N, avgdl, df per query term — ONE 1-row aggregate
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("_n"),
        (F.sum("_len").cast("double") / F.count(F.lit(1))).alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        term = idf * (
            tf * (k1 + 1.0)
            / (
                tf
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("_len") / F.col("_avgdl")
                )
            )
        )
        score = term if score is None else score + term
    return (
        scored.select(
            F.col(id_col), F.round(score, 6).alias("bm25")
        )
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )


def with_rank(
    df: DataFrame, order_col: str, id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """1-based dense ranking of an ALREADY-BOUNDED result (a top-k
    list), ties broken by id. The single-partition window is fine by
    construction — rank only what you already limited."""
    order = [
        F.desc(order_col) if descending else F.asc(order_col),
        F.col(id_col),
    ]
    return df.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
    )


def rrf_fuse(
    ranked: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard way
    hybrid retrieval merges a lexical (BM25) and a dense (embedding)
    ranking without score calibration:

        rrf(d) = Σ_r 1 / (k + rank_r(d))      (absent → contributes 0)

    ``ranked`` is ``[(name, df)]`` where each df carries ``(id, rank)``
    (see :func:`with_rank`); the output keeps each input rank as
    ``<name>_rank`` (NULL where a ranker missed the document) plus the
    fused ``rrf`` at 6 dp, top-``top_n`` by (rrf DESC, id).

    Determinism: ranks are exact integers; the fused sum is a FIXED
    left-to-right chain over the (small, ordered) ranker list, not a
    fold over data — bit-identical on any engine.

    Scale: every input is already a k-row top list, so the full-outer
    join chain and the final TakeOrderedAndProject touch O(Σ k) rows —
    never the corpus. The expensive part is the upstream rankers, which
    carry their own scale designs."""
    if not ranked:
        raise ValueError("ranked must be non-empty")
    out = None
    for name, df in ranked:
        r = df.select(F.col(id_col), F.col("rank").alias(f"{name}_rank"))
        out = r if out is None else out.join(r, id_col, "full_outer")
    score = None
    for name, _ in ranked:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"{name}_rank")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return (
        out.withColumn("rrf", F.round(score, 6))
        .orderBy(F.desc("rrf"), F.col(id_col))
        .limit(top_n)
    )
