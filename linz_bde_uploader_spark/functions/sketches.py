"""Count-min sketch — the bounded-memory frequency estimator a 100-TB
token/URL/entity pipeline uses where an exact groupBy's key space is
unbounded: the sketch's state is depth x width cells regardless of
cardinality, every update is a partial-agg increment (one shuffle whose
key space IS the sketch), and point estimates read ``depth`` cells.

All hashing is the engine's deterministic integer-mixing family
(``text.token_value`` composed with fixed affine permutations — the
MinHash parameter style), so the sketch table is exactly reproducible
in ANSI SQL and across engines: the correctness harness hash-matches
the full estimator output against DuckDB.

Estimates are upper bounds: est >= true count always (only hash
collisions inflate, never deflate) — the property the verified
heavy-hitters query pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.text import token_value, tokens

#: affine permutation parameters for the depth hash rows (prime
#: multipliers, fixed — deterministic, engine-independent).
CMS_PARAMS = [
    (1000003, 17),
    (1000033, 257),
    (1000037, 5),
    (1000039, 65537),
]

HASH_MOD = 2147483647


def _bucket(val, a: int, b: int, width: int):
    return ((val * a + b) % HASH_MOD) % width


def countmin_table(
    df: DataFrame,
    text_col: str = "text",
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` — depth·width cells at
    most, regardless of token cardinality. One explode + one partial-agg
    shuffle whose key space is the sketch itself (map-side combine does
    almost all the work; reducers see ≤ depth·width keys)."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("tok")).select(
        token_value(F.col("tok")).alias("_tv")
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _bucket(F.col("_tv"), a, b, width).alias("bucket"),
            )
            for i, (a, b) in enumerate(CMS_PARAMS[:depth])
        ]
    )
    return (
        toks.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str = "tok",
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point estimates for every row of ``keys``: min over the depth
    cells each key hashes to. The sketch is broadcast (≤ depth·width
    rows by construction), so estimation is map-only over the keys."""
    kv = keys.withColumn("_tv", token_value(F.col(key_col)))
    out = kv
    for i, (a, b) in enumerate(CMS_PARAMS[:depth]):
        cell = cms.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"_b{i}"), F.col("cnt").alias(f"_c{i}")
        )
        out = out.join(
            F.broadcast(cell),
            _bucket(F.col("_tv"), a, b, width) == F.col(f"_b{i}"),
            "left",
        ).drop(f"_b{i}")
    est = F.least(*[F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(depth)])
    return out.withColumn("cms_est", est).drop(
        "_tv", *[f"_c{i}" for i in range(depth)]
    )


def heavy_hitters_verified(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Top-k tokens by EXACT count, annotated with their count-min
    estimate — the sketch-accuracy audit a pipeline runs before trusting
    the sketch on keys too numerous to count exactly. Output
    ``(tok, exact_cnt, cms_est)``; the est >= exact invariant holds by
    construction."""
    exact = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.col("tok"))
        .limit(k)
    )
    cms = countmin_table(df, text_col, width, depth)
    return countmin_estimate(cms, exact, "tok", width, depth).select(
        "tok", "exact_cnt", "cms_est"
    )


def _bin_of(score, lo: float, hi: float, n_bins: int):
    """Histogram bin of a score: clamped floor((x-lo)/w) — out-of-range
    values land in the edge bins (documented clamp, never dropped)."""
    w = (hi - lo) / n_bins
    raw = F.floor((score - F.lit(float(lo))) / F.lit(w)).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def histogram_sketch(
    df: DataFrame,
    score_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
    stratum_col: str | None = None,
) -> DataFrame:
    """Fixed-bin histogram sketch — the mergeable quantile estimator for
    score distributions whose range is known up front (lengths, quality
    probabilities, perplexities): state is ``n_bins`` counters per
    stratum regardless of row count, merges are counter adds (so the
    batch and streamed faces are exactly equal over the same rows), and
    any quantile reads as a cumulative-sum scan with error bounded by
    one bin width. The GK/t-digest trade (adaptive bins, no range
    assumption) buys accuracy the pipeline's bounded, pre-rounded
    scores don't need — and costs the cross-engine exactness every
    estimator here keeps.

    Returns ``(stratum?, bin, cnt)``; NULL scores are dropped (no rank).

    Scale: one map-side bin projection + one partial-agg shuffle whose
    key space IS the sketch (≤ |strata|·n_bins keys — reducers see the
    sketch, not the data)."""
    if not hi > lo:
        raise ValueError("hi must exceed lo")
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    keys = ([stratum_col] if stratum_col else []) + ["bin"]
    return (
        df.filter(F.col(score_col).isNotNull())
        .select(
            *([stratum_col] if stratum_col else []),
            _bin_of(F.col(score_col), lo, hi, n_bins).alias("bin"),
        )
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sketch_quantiles(
    sketch: DataFrame,
    qs: "list[float] | tuple[float, ...]",
    lo: float,
    hi: float,
    n_bins: int,
    stratum_col: str | None = None,
) -> DataFrame:
    """Quantile estimates from a :func:`histogram_sketch`: for each q,
    the UPPER EDGE of the first bin whose cumulative count reaches rank
    ``ceil(q·N)`` — a deterministic, engine-exact read (no float
    interpolation), over-estimating by at most one bin width.

    Returns ``(stratum?, q, est)``.

    Scale: the input is already ≤ |strata|·n_bins rows; one window
    cumsum + one bounded agg over it — driver-free and constant-cost
    at any corpus size."""
    from pyspark.sql import Window  # noqa: PLC0415

    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError("each q must be in (0, 1]")
    w = (hi - lo) / n_bins
    part = [stratum_col] if stratum_col else []
    win = Window.partitionBy(*part).orderBy("bin")
    tot = Window.partitionBy(*part)
    cum = sketch.select(
        *part,
        "bin",
        F.sum("cnt").over(win).alias("_cum"),
        F.sum("cnt").over(tot).alias("_n"),
    )
    qlit = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    per_q = cum.select(*part, "bin", "_cum", "_n", qlit)
    hit = F.when(
        F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")), F.col("bin")
    )
    return (
        per_q.groupBy(*part, "q")
        .agg(
            (F.lit(float(lo)) + F.lit(w) * (F.min(hit) + F.lit(1)))
            .alias("est")
        )
    )
