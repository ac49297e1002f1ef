"""Structured-Streaming replacement for the reference's polling loop.

The reference polls a repository per run: scan → compute pending → apply →
exit (bin/linz_bde_uploader.pl:242-248). Spark's file-source streaming
subsumes that loop: the source tracks which files it has seen (checkpointed
offsets = the watermark), ``trigger(availableNow=True)`` processes
everything new then stops (the cron-driven shape), and ``foreachBatch``
applies each micro-batch through the SAME merge kernel the batch path uses
— one implementation, two drivers.

Beyond the reference (which has no streaming semantics), the module adds
the standard late-data machinery a 100-TB event pipeline needs: watermarked
tumbling/sliding-window aggregation, and a custom stateful operator via
``applyInPandasWithState`` (running per-key counters that survive across
micro-batches).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from linz_bde_uploader_spark.sinks.target import ParquetTarget


def stream_staged_increments(
    spark: SparkSession, staging_dir: str, schema: T.StructType
) -> DataFrame:
    """The streaming source: staged increment files appearing under
    ``staging_dir``. File-source offsets give exactly-once per file — the
    streaming analog of the dataset watermark."""
    return spark.readStream.schema(schema).parquet(staging_dir)


def run_incremental_merge_stream(
    spark: SparkSession,
    staging_dir: str,
    schema: T.StructType,
    target: ParquetTarget,
    change_keys_of: Callable[[DataFrame], DataFrame],
    checkpoint_dir: str,
    unique_cols: list[str] | None = None,
):
    """Apply every new staged increment to the target via the batch merge
    kernel, exactly once.

    ``foreachBatch`` hands each micro-batch to ``ParquetTarget.
    apply_incremental`` — identical semantics to the batch path; the
    checkpoint guarantees a file is merged at most once even across
    restarts (re-running after completion is a no-op). ``availableNow``
    drains everything pending and stops, which is the reference's
    poll-and-exit contract."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        target.apply_incremental(
            spark, batch_df, change_keys_of(batch_df), unique_cols=unique_cols
        )

    return (
        stream_staged_increments(spark, staging_dir, schema)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation — the late-data pattern.

    Events later than ``watermark`` behind the max seen event time are
    dropped; closed windows emit finalized counts. Works identically on a
    static DataFrame (for oracle checks) and a stream."""
    w = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return src.groupBy(w.alias("win"), F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        key_col,
        "n",
    )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    within: str | None = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the ingest-time guard of the dedup suite
    (the batch side is ``functions.dedup.exact_dedup``): drop every record
    whose key set was already seen.

    On a stream with ``within`` set, uses ``dropDuplicatesWithinWatermark``
    so the key-tracking state is EVICTED once a key is older than the
    watermark — bounded state, the only shape that survives an unbounded
    100-TB feed (plain ``dropDuplicates`` on a stream retains every key
    forever). Duplicates arriving later than the watermark window are a
    documented miss — route them to the batch dedup pass. On a static
    frame it degrades to ``dropDuplicates(keys)`` for oracle checks."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    if within is None:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(keys)


RUNNING_STATE_SCHEMA = "n long"
RUNNING_OUTPUT_SCHEMA = "key string, total long"


def running_counts_stateful(grouped, state_timeout: str = "NoTimeout"):
    """Custom stateful operator via ``applyInPandasWithState``: a running
    per-key event counter that persists across micro-batches — the
    minimal template for reference-style accumulating state (e.g. running
    I/U/D totals per table). ``grouped`` is ``df.groupBy(key)``."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def update(key, pdfs, state: GroupState):
        n = sum(len(pdf) for pdf in pdfs)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame({"key": [key[0]], "total": [total]})

    return grouped.applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=state_timeout,
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "lts",
    right_ts: str = "rts",
    watermark: str = "10 minutes",
    max_gap: str = "5 minutes",
):
    """Watermarked stream-stream interval join — the streaming analog of
    the batch range join: match right-side events to left-side events on
    ``key`` when the right timestamp falls within [left_ts, left_ts +
    max_gap]. Both sides carry watermarks, so Spark bounds the join
    state: a buffered left row is dropped once the right watermark
    passes its interval's end — the condition every production
    stream-stream join needs to avoid unbounded state (reference has no
    streaming; this extends §2.8's watermark machinery to joins).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"l.{key} = r.{key} AND "
            f"r.{right_ts} >= l.{left_ts} AND "
            f"r.{right_ts} <= l.{left_ts} + interval {max_gap}"
        ),
    )


def quality_gate_stream(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming face of the hashed-feature quality classifier
    (``functions.text.quality_classifier``): score each arriving
    document and pass only those with ``prob >= threshold`` — the
    ingest-time quality gate of a continuous crawl pipeline.

    The classifier is pure stateless Column arithmetic (map-only, no
    aggregation), so it attaches to a stream UNCHANGED: no watermark,
    no state store, every micro-batch independent. Identical scores to
    the batch operator by construction — the parity test feeds the same
    rows both ways."""
    from linz_bde_uploader_spark.functions.text import quality_classifier

    scored = quality_classifier(
        df, id_col=id_col, text_col=text_col, threshold=threshold
    )
    return scored.filter(F.col("keep"))


CMS_STREAM_STATE_SCHEMA = "counts array<long>"
CMS_STREAM_OUTPUT_SCHEMA = "row int, bucket int, cnt long"


def countmin_stream(
    df: DataFrame,
    text_col: str = "text",
    width: int = 64,
    depth: int = 4,
    state_timeout: str = "NoTimeout",
):
    """Streaming count-min sketch via ``applyInPandasWithState`` — the
    bounded-state frequency estimator maintained ACROSS micro-batches
    (the batch face is ``functions.sketches.countmin_table``; the hash
    family and additivity are identical, so a streamed sketch equals
    the batch sketch over the same rows — the parity test pins it).

    Sharding: each sketch ROW is one state group (depth groups), its
    state the row's ``width`` counters — state is depth·width longs
    total at ANY key cardinality, the property that makes a sketch the
    only frequency story an unbounded stream supports. Updates are
    vectorized per batch (token hash → bucket bincount), emitted in
    ``update`` mode as the row's nonzero cells."""
    import numpy as np
    import pandas as pd

    from linz_bde_uploader_spark.functions.sketches import (
        CMS_PARAMS, HASH_MOD,
    )
    from linz_bde_uploader_spark.functions.text import tokens

    params = CMS_PARAMS[:depth]
    # Tokenize EXACTLY like the batch face (sketches.countmin_table):
    # plain single-space split, NO trim — on padded text the split's
    # empty edge tokens must hash into both sketches identically or the
    # claimed stream==batch parity breaks.
    tv = F.explode(tokens(F.col(text_col))).alias("tok")
    hashed = df.select(tv).select(
        (
            (F.length("tok").cast("long") * 17
             + F.ascii("tok").cast("long") * 31) % HASH_MOD
        ).alias("_tv")
    )
    exploded = hashed.select(
        F.explode(
            F.array(*[F.lit(i) for i in range(depth)])
        ).alias("row"),
        F.col("_tv"),
    )

    def update(key, pdfs, state):
        row = int(key[0])
        a, b = params[row]
        counts = (
            np.asarray(state.get[0], dtype=np.int64)
            if state.exists
            else np.zeros(width, dtype=np.int64)
        )
        for pdf in pdfs:
            tvs = pdf["_tv"].to_numpy(dtype=np.int64)
            buckets = ((tvs * a + b) % HASH_MOD) % width
            counts += np.bincount(buckets, minlength=width)
        state.update((counts.tolist(),))
        nz = np.nonzero(counts)[0]
        yield pd.DataFrame(
            {"row": row, "bucket": nz.astype("int32"),
             "cnt": counts[nz]}
        )

    return exploded.groupBy("row").applyInPandasWithState(
        update,
        outputStructType=CMS_STREAM_OUTPUT_SCHEMA,
        stateStructType=CMS_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=state_timeout,
    )


def langid_confusion_stream(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    min_hits: int = 3,
) -> DataFrame:
    """Streaming face of the langid confusion-matrix audit
    (``functions.text.langid_confusion``): running per-(label,
    prediction) document counts over an ingest stream — the live DRIFT
    monitor for a classifier that gates a continuous crawl (a feed
    whose 'en'→'other' cell starts growing is changing under the gate).

    The prediction is stateless Column arithmetic; the running
    aggregation's key space is |langs| × |preds| — BOUNDED, so the
    state store stays a handful of rows at any stream length and no
    watermark is required for the all-time monitor (compose with a
    time window upstream for windowed drift). Emit in update/complete
    mode. The per-language fraction column of the batch operator is a
    window function (not streamable); compute it over the emitted
    cells — they are tiny by construction."""
    from linz_bde_uploader_spark.functions.text import lang_guess

    return df.groupBy(
        F.col(label_col).alias("lang"),
        lang_guess(F.col(text_col), min_hits).alias("pred"),
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def dsir_gate_stream(
    df: DataFrame,
    lam: list[int],
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Streaming face of DSIR: score arriving documents against a
    FROZEN importance model (``functions.dsir.logratio_model``, fit
    offline on the corpus) and pass those with ``logw >= threshold`` —
    the train-offline/serve-online shape of an importance-gated ingest
    pipeline. The λ table is a literal array folded into codegen
    (``score_with_model``): map-only, no join, no state, no watermark —
    every micro-batch independent, append mode. Identical scores to
    the batch scorer by construction; re-fit the model periodically and
    restart the query to pick up drift."""
    from linz_bde_uploader_spark.functions.dsir import score_with_model

    scored = score_with_model(df, lam, id_col, text_col, ngram)
    return scored.filter(F.col("logw") >= threshold)


def dedup_gate_stream(
    df: DataFrame,
    index_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Streaming face of the incremental MinHash ingestion gate
    (``dedup.incremental_minhash_filter``): drop arriving documents
    whose ANY MinHash band key collides with the already-deduplicated
    corpus index — the ingest-time near-dup gate of a continuous crawl.

    The batch operator's shape (explode → semi-join → distinct →
    anti-join) is not streamable (the distinct is stateful, stream-
    static LEFT ANTI is unsupported), so the stream face re-expresses
    it as ``bands`` STREAM-STATIC LEFT OUTER joins — one per band
    position, each against that band's DISTINCT static key set (at
    most one match per key, so no row duplication and no state) — and
    keeps rows where every band missed. Exactly the batch survivor set
    (the parity test pins it); no watermark, append mode.

    Scale: the static band-key sets are O(corpus·bands) longs — the
    artifact a 100-TB pipeline persists instead of re-hashing the
    corpus (broadcast when they fit, shuffled stream-static join
    otherwise); the stream side is map-only signature arithmetic."""
    from linz_bde_uploader_spark.functions.dedup import (
        minhash_band_keys, with_minhash_signature,
    )

    # The gate's internal columns would silently OVERWRITE same-named
    # input columns (withColumn/join replace, not error), corrupting
    # the final select(*df.columns) — refuse loudly instead.
    reserved = {"_sig", "_bk"} | {
        f"_{p}{b}" for b in range(bands) for p in ("h", "k")
    }
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            "dedup_gate_stream reserves internal column names "
            f"{sorted(reserved)}; rename input columns {sorted(clash)}"
        )

    n_sig = bands * rows_per_band
    idx = (
        with_minhash_signature(index_docs, text_col, "_sig", n_sig)
        .select(
            F.posexplode(
                minhash_band_keys(F.col("_sig"), bands, rows_per_band)
            ).alias("_band", "_key")
        )
        .distinct()
    )
    out = with_minhash_signature(df, text_col, "_sig", n_sig).withColumn(
        "_bk", minhash_band_keys(F.col("_sig"), bands, rows_per_band)
    )
    for b in range(bands):
        kb = idx.filter(F.col("_band") == b).select(
            F.col("_key").alias(f"_k{b}"), F.lit(1).alias(f"_h{b}")
        )
        out = out.join(
            kb, F.element_at(F.col("_bk"), b + 1) == F.col(f"_k{b}"), "left"
        ).drop(f"_k{b}")
    survive = F.lit(True)
    for b in range(bands):
        survive = survive & F.col(f"_h{b}").isNull()
    return out.filter(survive).select(*df.columns)


def ingest_gate_stream(
    df: DataFrame,
    lam: list[int],
    dsir_threshold: float = 0.0,
    quality_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """The COMPOSED online serving path a training-data pipeline
    actually runs on a live crawl feed: hashed-feature quality gate
    first (the cheaper reject — most junk dies before the importance
    model looks at it), then the frozen-DSIR importance gate, in ONE
    streamed plan. Both stages are pure Column arithmetic over literal
    model state (the classifier weights are bucket arithmetic, the λ
    table a folded literal array), so the whole chain is map-only —
    no join, no state store, no watermark; every micro-batch
    independent, append mode.

    Returns ``(id, prob, n_tokens, logw)`` for the survivors —
    identical rows to running the two batch operators in sequence over
    the same input (the parity test pins it). Re-fit ``lam``
    periodically offline and restart the query to track drift."""
    from linz_bde_uploader_spark.functions.dsir import score_with_model
    from linz_bde_uploader_spark.functions.text import quality_classifier

    q = quality_classifier(
        df,
        id_col=id_col,
        text_col=text_col,
        threshold=quality_threshold,
        passthrough=(text_col,),
    )
    passed = q.filter(F.col("keep")).select(id_col, text_col, "prob")
    s = score_with_model(
        passed, lam, id_col, text_col, ngram, passthrough=("prob",)
    )
    return s.filter(F.col("logw") >= dsir_threshold).select(
        id_col, "prob", "n_tokens", "logw"
    )


def crawl_gate_stream(
    df: DataFrame,
    blocked_hosts: "list[str]",
    robots_rules: "list[tuple[str, str, str]]",
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """The crawl-frontier gate as ONE streamed map-only plan — the
    filter chain a live web crawl runs on every arriving page, in
    gate-cost order:

    1. host blocklist (``urls.blocklist_filter`` list path — a
       constant-folded boolean chain; the cheapest reject first),
    2. robots compliance (``urls.robots_gate_local`` — the rules list
       compiled to a precedence-sorted CASE chain, the stream-safe
       form of the RFC 9309 longest-prefix match),
    3. PII scrub on the survivors (``text.scrub_pii`` — chained
       regexp_replace, the standard pre-training redaction).

    Everything is per-row Column arithmetic: no join, no state store,
    no watermark; every micro-batch independent, append mode. Rows
    identical to running the three batch operators in sequence (the
    parity test pins it, including against the DataFrame-path robots
    gate). Returns the surviving rows with ``canon_url``, ``host``,
    and the scrubbed ``text``."""
    from linz_bde_uploader_spark.functions.text import scrub_pii
    from linz_bde_uploader_spark.functions.urls import (
        blocklist_filter, robots_gate_local,
    )

    gated = blocklist_filter(df, blocked_hosts, (), url_col).filter(
        F.col("block_reason") == "ok"
    ).drop("block_reason", "canon_url", "host")
    compliant = robots_gate_local(gated, robots_rules, url_col).filter(
        F.col("robots_allowed")
    ).drop("robots_allowed", "matched_rule", "path")
    return compliant.withColumn(text_col, scrub_pii(F.col(text_col)))


#: stage names of the streaming corpus-build funnel — identical to the
#: batch composite's (the parity contract keys on them).
CORPUS_STAGES = [
    (0, "ingest"),
    (1, "blocklist"),
    (2, "robots"),
    (3, "quality"),
    (4, "exact_dedup"),
    (5, "near_dedup"),
    (6, "decontaminate"),
]


def _state_read(
    spark: SparkSession, path: str, before_batch: int | None = None
) -> DataFrame | None:
    """Read a batch-partitioned parquet state directory if it has any
    committed batches yet (None before the first write). Local-path
    probe — this face runs against a directory tree; a production
    deployment points the same layout at object storage and swaps this
    probe for a catalog lookup.

    ``before_batch`` restricts the read to partitions with
    ``batch_id < before_batch`` — the replay guard: foreachBatch is
    at-least-once, so a micro-batch that crashed AFTER its state
    writes but BEFORE the checkpoint commit is re-run, and without
    the filter the replay would read its own previous writes as
    "standing" state (every doc anti-joins against its own
    fingerprint, LSH-collides with itself at the near gate, drops at
    stage 4, and the state partitions are overwritten empty — silent
    loss of the whole batch). Filtering to strictly-prior batches
    makes a replay see exactly the state the original run saw, so
    the overwrite-per-partition write stays idempotent."""
    import os  # noqa: PLC0415

    if not os.path.isdir(path) or not any(
        e.startswith("batch_id=") for e in os.listdir(path)
    ):
        return None
    df = spark.read.parquet(path)
    if before_batch is not None:
        df = df.filter(F.col("batch_id") < F.lit(int(before_batch)))
    return df


def _state_write(df: DataFrame, path: str, batch_id: int) -> None:
    """Overwrite this batch's partition of a state directory —
    OVERWRITE, not append, so a retried micro-batch (foreachBatch is
    at-least-once) rewrites the same partition instead of doubling
    rows: the write is idempotent per batch_id, which together with
    the checkpointed source offsets gives the exactly-once state the
    batch path gets from its manifest protocol."""
    df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")


def _state_read_latest(
    spark: SparkSession, path: str, before_batch: int
) -> DataFrame | None:
    """Read ONLY the newest committed partition with
    ``batch_id < before_batch`` (None if there is none) — for state
    where the latest snapshot dominates every earlier one (the
    weighted reservoir: its minimum is non-decreasing, so top-n over
    (latest ∪ batch) equals top-n over everything arrived). Reading
    the single partition keeps per-batch work O(n + batch) instead of
    growing linearly with stream age; the full-union read stays in
    the finalizer, where the snapshot union is the recovery basis.
    Same replay guard as ``_state_read``: strictly-prior batches only,
    so a replayed micro-batch sees exactly the state the original run
    saw."""
    import os  # noqa: PLC0415

    if not os.path.isdir(path):
        return None
    eligible = [
        int(e.split("=", 1)[1])
        for e in os.listdir(path)
        if e.startswith("batch_id=")
        and int(e.split("=", 1)[1]) < before_batch
    ]
    if not eligible:
        return None
    return spark.read.parquet(f"{path}/batch_id={max(eligible)}")


def corpus_build_stream(
    spark: SparkSession,
    staging_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    state_dir: str,
    blocked_hosts: "list[str]",
    blocked_patterns: "list[str]",
    robots_rules: "list[tuple[str, str, str]]",
    bench_docs: DataFrame,
    is_eval: "Callable[[F.Column], F.Column] | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str = "url",
    quality_threshold: float = 0.5,
    jaccard_threshold: float = 0.5,
    bands: int = 4,
    rows_per_band: int = 2,
    decontam_n: int = 4,
    max_files_per_trigger: int | None = None,
):
    """The streaming face of the WHOLE corpus-build funnel — the
    availableNow analog of the batch composite (``q_corpus_build_e2e``)
    and of the reference's polling lifecycle, which chains its entire
    discovery→load→clean→merge pipeline per poll
    (bin/linz_bde_uploader.pl:242-248, lib/LINZ/BdeUpload.pm:559-610):
    each micro-batch of newly arrived documents runs

        blocklist → robots → quality (Gopher AND classifier)
        → incremental exact dedup → incremental near dedup
        → decontaminate

    inside ``foreachBatch`` using the SAME audited batch operators —
    one implementation, two drivers — with the cross-batch state the
    incremental dedup gates need persisted under ``state_dir``:

    - ``index``    — (id, text, _fp) of every exact-dedup survivor:
      the fingerprint set for the exact gate and the verify-side texts
      for the near gate;
    - ``bandkeys`` — their exploded MinHash band keys (the O(corpus×
      bands) artifact :func:`~linz_bde_uploader_spark.functions.dedup.
      incremental_minhash_filter` says to persist instead of re-hashing
      the corpus per batch);
    - ``corpus``   — the fully-gated survivor documents (the growing
      training corpus);
    - ``funnel``   — one (stage_no, stage, n_docs, n_tokens) row per
      stage PER MICRO-BATCH (the per-poll audit row).

    EXACT batch parity (pinned by the parity test): with documents
    arriving in ascending-id order, every stage's survivor set equals
    the batch composite's —

    - gates 1-3 are per-document, order-free;
    - the exact gate keeps a doc iff no LOWER-id doc shares its
      fingerprint (earlier batch ⇒ in the index; same batch ⇒ the
      keep-first window), exactly the batch min-id rule;
    - the near gate drops a doc iff it LSH-collides AND verifies at
      ``jaccard_threshold`` against some lower-id EXACT-DEDUP SURVIVOR
      — the index side is ALL stage-4 survivors, not just near-dup
      survivors, because the batch rule drops ``id_b`` of every
      verified pair even when ``id_a`` was itself dropped by an
      earlier pair;
    - decontamination probes a STATIC benchmark frame (the real
      contract: the eval suite is a fixed artifact, never a function
      of the stream).

    Mixture and packing (batch stages 7-8) are corpus-WIDE budget
    decisions, not ingest gates — run :func:`corpus_build_finalize`
    over the accumulated state to get the full 9-row funnel.

    Scale: every per-doc gate is map-only Column arithmetic; the
    exact gate is one broadcast-size semi join on fingerprints; the
    near gate's probe shuffles O(batch×bands) keys and verifies only
    candidate pairs; state grows as the survivor corpus, never
    rescanned (the index reads are column-pruned: fingerprints for
    the fp gate, band keys for the probe, candidate texts only for
    the verify join)."""
    apply_batch = corpus_build_batch_fn(
        spark,
        state_dir,
        blocked_hosts,
        blocked_patterns,
        robots_rules,
        bench_docs,
        is_eval=is_eval,
        id_col=id_col,
        text_col=text_col,
        url_col=url_col,
        quality_threshold=quality_threshold,
        jaccard_threshold=jaccard_threshold,
        bands=bands,
        rows_per_band=rows_per_band,
        decontam_n=decontam_n,
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(staging_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def corpus_build_batch_fn(
    spark: SparkSession,
    state_dir: str,
    blocked_hosts: "list[str]",
    blocked_patterns: "list[str]",
    robots_rules: "list[tuple[str, str, str]]",
    bench_docs: DataFrame,
    is_eval: "Callable[[F.Column], F.Column] | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str = "url",
    quality_threshold: float = 0.5,
    jaccard_threshold: float = 0.5,
    bands: int = 4,
    rows_per_band: int = 2,
    decontam_n: int = 4,
):
    """Build the per-micro-batch closure :func:`corpus_build_stream`
    hands to ``foreachBatch`` — factored out so the at-least-once
    replay contract is testable directly: calling the returned
    function twice with the same ``batch_id`` (a crash between the
    state writes and the checkpoint commit makes the engine re-run
    the batch) must produce the same state partitions, which holds
    because every cross-batch state read filters to strictly-prior
    batches (``_state_read(..., before_batch=batch_id)``) and every
    state write overwrites its own partition."""
    from pyspark.sql import Window  # noqa: PLC0415

    from linz_bde_uploader_spark.functions import (  # noqa: PLC0415
        decontaminate as DX,
    )
    from linz_bde_uploader_spark.functions import text as X  # noqa: PLC0415
    from linz_bde_uploader_spark.functions.dedup import (  # noqa: PLC0415
        candidate_jaccard_verify,
        minhash_band_keys,
        ngram_jaccard_from_tokens,
        with_minhash_signature,
    )
    from linz_bde_uploader_spark.functions.text import (  # noqa: PLC0415
        fingerprint,
        token_count,
        tokens,
    )
    from linz_bde_uploader_spark.functions.urls import (  # noqa: PLC0415
        blocklist_filter,
        robots_gate_local,
    )

    n_sig = bands * rows_per_band
    bench_static = bench_docs

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # per-poll audit contract: an empty poll still writes its
            # zeroed funnel row, so a missing funnel batch_id always
            # means a LOST write rather than an empty poll; no
            # survivors, so no index/bandkeys/corpus partitions
            _state_write(
                spark.createDataFrame(
                    [(i, s, 0, 0) for i, s in CORPUS_STAGES],
                    "stage_no int, stage string, n_docs long, "
                    "n_tokens long",
                ),
                f"{state_dir}/funnel",
                batch_id,
            )
            return
        bl = blocklist_filter(
            batch_df, blocked_hosts, blocked_patterns, url_col
        )
        rb = robots_gate_local(
            bl.select(id_col, text_col, url_col, "block_reason"), url_col=url_col,
            rules=robots_rules,
        )
        sig = rb.select(
            id_col,
            text_col,
            (F.col("block_reason") == "ok").alias("_f1"),
            F.col("robots_allowed").alias("_f2"),
            X.gopher_pass(text_col).alias("_fg"),
            token_count(text_col).cast("long").alias("_nt"),
            fingerprint(text_col).alias("_fp"),
        )
        flags = X.quality_classifier(
            sig,
            id_col=id_col,
            text_col=text_col,
            threshold=quality_threshold,
            passthrough=("_f1", "_f2", "_fg", "_nt", "_fp"),
        ).select(
            id_col,
            "_nt",
            "_fp",
            "_f1",
            "_f2",
            (F.col("_fg") & (F.col("prob") >= quality_threshold)).alias(
                "_f3"
            ),
        ).persist()
        try:
            s3 = flags.filter(F.col("_f1") & F.col("_f2") & F.col("_f3"))
            # exact gate: standing fingerprints first, then in-batch
            # keep-first among the fresh ones (batch min-id rule)
            idx = _state_read(
                spark, f"{state_dir}/index", before_batch=batch_id
            )
            fresh = s3
            if idx is not None:
                fresh = s3.join(
                    idx.select("_fp").distinct(), "_fp", "left_anti"
                )
            keep4 = (
                fresh.withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("_fp").orderBy(id_col)
                    ),
                )
                .filter(F.col("_rn") == 1)
                .select(id_col, F.lit(True).alias("_f4"))
            )
            s4docs = (
                batch_df.select(id_col, text_col)
                .join(keep4.select(id_col), id_col, "left_semi")
                .persist()
            )
            # near gate, in-batch half: the batch operator verbatim
            drop_in = (
                candidate_jaccard_verify(
                    s4docs, id_col, text_col,
                    threshold=jaccard_threshold,
                    bands=bands, rows_per_band=rows_per_band,
                )
                .select(F.col("id_b").alias(id_col))
                .distinct()
            )
            # near gate, cross-batch half: probe standing band keys,
            # verify only the candidates (texts fetched from the index
            # by id — bounded by candidate volume)
            bk = _state_read(
                spark, f"{state_dir}/bandkeys", before_batch=batch_id
            )
            new_keys = with_minhash_signature(
                s4docs, text_col, "_sig", n_sig
            ).select(
                F.col(id_col),
                F.posexplode(
                    minhash_band_keys(F.col("_sig"), bands, rows_per_band)
                ).alias("_band", "_key"),
            )
            if bk is not None:
                cand = (
                    new_keys.join(
                        bk.select(
                            F.col(id_col).alias("_old"), "_band", "_key"
                        ),
                        ["_band", "_key"],
                    )
                    .select(id_col, "_old")
                    .distinct()
                )
                old_toks = idx.select(
                    F.col(id_col).alias("_old"),
                    tokens(F.col(text_col)).alias("_tkb"),
                )
                new_toks = s4docs.select(
                    F.col(id_col), tokens(F.col(text_col)).alias("_tka")
                )
                drop_x = (
                    cand.join(new_toks, id_col)
                    .join(old_toks, "_old")
                    .filter(
                        ngram_jaccard_from_tokens(
                            F.col("_tka"), F.col("_tkb")
                        )
                        >= jaccard_threshold
                    )
                    .select(id_col)
                    .distinct()
                )
                drops5 = drop_in.unionByName(drop_x).distinct()
            else:
                drops5 = drop_in
            s5docs = s4docs.join(drops5, id_col, "left_anti")
            # decontaminate vs the static benchmark
            ev = (
                is_eval(F.col(id_col))
                if is_eval is not None
                else F.lit(False)
            )
            hits = (
                DX.contamination_hits(
                    s5docs.filter(~ev), bench_static, text_col, id_col,
                    n=decontam_n,
                )
                .select(id_col)
                .withColumn("_contam", F.lit(True))
            )
            lv = (
                flags.join(keep4, id_col, "left")
                .join(
                    drops5.withColumn("_near_drop", F.lit(True)),
                    id_col,
                    "left",
                )
                .join(hits, id_col, "left")
                .select(
                    id_col,
                    "_nt",
                    F.when(~F.col("_f1"), 0)
                    .when(~F.col("_f2"), 1)
                    .when(~F.col("_f3"), 2)
                    .when(~F.coalesce(F.col("_f4"), F.lit(False)), 3)
                    .when(F.coalesce(F.col("_near_drop"), F.lit(False)), 4)
                    .when(ev | F.coalesce(F.col("_contam"), F.lit(False)), 5)
                    .otherwise(6)
                    .alias("_level"),
                )
                .persist()
            )
            try:
                stage_tbl = spark.createDataFrame(
                    CORPUS_STAGES, "stage_no int, stage string"
                )
                agg = (
                    lv.select(
                        F.explode(F.sequence(F.lit(0), F.lit(6))).alias(
                            "stage_no"
                        ),
                        "_level",
                        "_nt",
                    )
                    .filter(F.col("_level") >= F.col("stage_no"))
                    .groupBy(F.col("stage_no").cast("int").alias("stage_no"))
                    .agg(
                        F.count(F.lit(1)).cast("long").alias("_nd"),
                        F.sum("_nt").cast("long").alias("_ntk"),
                    )
                )
                funnel = stage_tbl.join(agg, "stage_no", "left").select(
                    "stage_no",
                    "stage",
                    F.coalesce(F.col("_nd"), F.lit(0))
                    .cast("long")
                    .alias("n_docs"),
                    F.coalesce(F.col("_ntk"), F.lit(0))
                    .cast("long")
                    .alias("n_tokens"),
                )
                _state_write(funnel, f"{state_dir}/funnel", batch_id)
                s4ids = lv.filter(F.col("_level") >= 4).select(id_col)
                s4out = batch_df.select(id_col, text_col).join(
                    s4ids, id_col, "left_semi"
                )
                _state_write(
                    s4out.withColumn("_fp", fingerprint(text_col)),
                    f"{state_dir}/index",
                    batch_id,
                )
                _state_write(
                    with_minhash_signature(
                        s4out, text_col, "_sig", n_sig
                    ).select(
                        F.col(id_col),
                        F.posexplode(
                            minhash_band_keys(
                                F.col("_sig"), bands, rows_per_band
                            )
                        ).alias("_band", "_key"),
                    ),
                    f"{state_dir}/bandkeys",
                    batch_id,
                )
                s6ids = lv.filter(F.col("_level") >= 6).select(id_col)
                _state_write(
                    batch_df.join(s6ids, id_col, "left_semi"),
                    f"{state_dir}/corpus",
                    batch_id,
                )
            finally:
                lv.unpersist()
        finally:
            flags.unpersist()
            try:
                s4docs.unpersist()
            except NameError:
                pass

    return apply_batch


def corpus_build_finalize(
    spark: SparkSession,
    state_dir: str,
    alpha: float = 0.3,
    budget_tokens: int = 100_000,
    capacity: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus-WIDE tail of the funnel — α-mixture budgeting and
    sequence packing over the ACCUMULATED streaming survivor corpus —
    plus the per-batch funnel rows summed per stage: returns the same
    9-row ``(stage_no, stage, n_docs, n_tokens)`` datasheet as the
    batch composite, which the parity test pins row-for-row. These two
    stages are offline batch decisions by nature (a token budget and a
    pack layout are functions of the WHOLE corpus, not of any batch),
    which is exactly why the streaming face ends at stage 6."""
    from linz_bde_uploader_spark.functions import packing as PK  # noqa: PLC0415
    from linz_bde_uploader_spark.functions.sampling import (  # noqa: PLC0415
        alpha_mixture_plan,
    )
    from linz_bde_uploader_spark.functions.text import token_count  # noqa: PLC0415

    fun = _state_read(spark, f"{state_dir}/funnel")
    if fun is None:
        raise ValueError(f"no funnel state under {state_dir}")
    f06 = fun.groupBy("stage_no", "stage").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    corpus = _state_read(spark, f"{state_dir}/corpus")
    if corpus is None:
        corpus = spark.createDataFrame(
            [], f"{id_col} long, source string, {text_col} string"
        )
    corpus = corpus.drop("batch_id")
    mix = (
        alpha_mixture_plan(corpus, alpha, budget_tokens, text_col=text_col)
        .agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("target_tokens"), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
        )
        .select(
            F.lit(7).cast("int").alias("stage_no"),
            F.lit("alpha_mixture").alias("stage"),
            "n_docs",
            "n_tokens",
        )
    )
    pk = PK.pack_sequences(
        corpus.select(
            id_col, token_count(text_col).cast("long").alias("_nt")
        ),
        id_col,
        "_nt",
        capacity=capacity,
        n_shards=n_shards,
    )
    packrow = (
        pk.agg(
            F.coalesce(F.countDistinct("shard", "pack_id"), F.lit(0))
            .cast("long")
            .alias("n_docs"),
            F.coalesce(F.sum("clamped_tokens"), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
        )
        .select(
            F.lit(8).cast("int").alias("stage_no"),
            F.lit("pack").alias("stage"),
            "n_docs",
            "n_tokens",
        )
    )
    return f06.unionByName(mix).unionByName(packrow).orderBy("stage_no")


GK_STREAM_OUTPUT_SCHEMA = "key string, q double, n long, est double"
GK_STREAM_STATE_SCHEMA = (
    "vs array<double>, gs array<long>, ds array<long>, n long"
)


def gk_quantile_stream(
    grouped,
    qs: "tuple[float, ...]" = (0.5, 0.9, 0.99),
    eps: float = 0.02,
    value_col: str = "v",
    order_col: str | None = None,
    state_timeout: str = "NoTimeout",
):
    """Streaming face of the Greenwald-Khanna quantile summary
    (``functions.sketches.gk_build``/``gk_query``): a per-key GK
    ε-summary carried across micro-batches via
    ``applyInPandasWithState``, emitting RUNNING quantile estimates
    after every batch — the DOMAIN-FREE sibling of
    :func:`quantile_sketch_stream` (which needs a fixed [lo, hi)
    range up front; GK does not, the reason it exists).

    The state IS the summary — O((1/ε)·log(εn)) tuples per key at any
    stream length — and each batch continues it through the exact
    batch insert/compress arithmetic (``gk_insert_all``), so after
    any batch the emitted estimates equal ``gk_query(gk_build(all
    rows so far))`` PROVIDED the arrival order matches the batch
    build order (pass ``order_col`` to pin in-batch order; ascending
    arrival across batches is the caller's contract, same as the
    corpus-build stream's). Out-of-order arrival keeps the ε-bound —
    GK's guarantee is order-independent — and only forfeits
    bit-parity with a specific batch build. NULL values are dropped;
    a key with no values yet emits nothing. ``grouped`` is
    ``df.groupBy(key)``."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupState  # noqa: PLC0415

    from linz_bde_uploader_spark.functions.sketches import (  # noqa: PLC0415
        gk_insert_all,
        gk_query,
    )

    if not 0.0 < eps < 0.5:
        raise ValueError("eps must be in (0, 0.5)")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError("each q must be in (0, 1]")

    def update(key, pdfs, state: GroupState):
        if state.exists:
            vs, gs, ds, n = state.get
            summary = list(zip(vs, gs, ds))
        else:
            summary, n = [], 0
        for pdf in pdfs:
            if order_col is not None:
                pdf = pdf.sort_values(order_col, kind="mergesort")
            vals = pdf[value_col].to_numpy(dtype=float)
            vals = vals[~(vals != vals)]  # drop NaN/NULL
            summary, n = gk_insert_all(summary, n, vals, eps)
        if n == 0:
            return
        state.update(
            (
                [t[0] for t in summary],
                [int(t[1]) for t in summary],
                [int(t[2]) for t in summary],
                int(n),
            )
        )
        rows = [
            (key[0], float(q), int(n), float(gk_query(summary, q, n, eps)))
            for q in qs
        ]
        yield pd.DataFrame(rows, columns=["key", "q", "n", "est"])

    return grouped.applyInPandasWithState(
        update,
        outputStructType=GK_STREAM_OUTPUT_SCHEMA,
        stateStructType=GK_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=state_timeout,
    )


QSKETCH_OUTPUT_SCHEMA = "key string, q double, n long, est double"


def quantile_sketch_stream(
    grouped,
    lo: float,
    hi: float,
    n_bins: int = 128,
    qs: "tuple[float, ...]" = (0.5, 0.9, 0.99),
    value_col: str = "v",
    state_timeout: str = "NoTimeout",
):
    """Streaming face of the histogram quantile sketch
    (``functions.sketches.histogram_sketch`` / ``sketch_quantiles``):
    a per-key ``n_bins``-counter histogram carried across micro-batches
    via ``applyInPandasWithState``, emitting RUNNING quantile estimates
    after every batch — the live latency/score/length percentiles a
    pipeline dashboard reads while the feed flows.

    The sketch is exactly the batch operator's: merges are counter
    adds, so after any batch the emitted estimates equal
    ``sketch_quantiles(histogram_sketch(all rows so far))`` — the
    parity test pins it (same clamped binning, same
    first-bin-reaching-rank read, same upper-edge arithmetic; an
    empty key emits nothing). ``grouped`` is ``df.groupBy(key)``.

    Scale: state is ``n_bins`` longs per key — bounded regardless of
    row count (the whole point of a sketch); per batch each worker does
    one numpy bincount over its Arrow batch."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    if not hi > lo:
        raise ValueError("hi must exceed lo")
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError("each q must be in (0, 1]")
    w = (hi - lo) / n_bins

    def update(key, pdfs, state: GroupState):
        counts = (
            np.array(state.get[0], dtype=np.int64)
            if state.exists
            else np.zeros(n_bins, dtype=np.int64)
        )
        for pdf in pdfs:
            v = pdf[value_col].to_numpy(dtype=float)
            v = v[~np.isnan(v)]
            if len(v):
                b = np.clip(
                    np.floor((v - lo) / w).astype(np.int64), 0, n_bins - 1
                )
                counts += np.bincount(b, minlength=n_bins)
        state.update((counts.tolist(),))
        n = int(counts.sum())
        if n == 0:
            return
        cum = np.cumsum(counts)
        rows = []
        for q in qs:
            rank = math.ceil(q * n)
            # first bin whose cumulative count reaches the rank — the
            # batch reader's min(hit); upper-edge estimate lo + w*(b+1)
            b = int(np.searchsorted(cum, rank, side="left"))
            rows.append((key[0], float(q), n, float(lo) + w * (b + 1)))
        yield pd.DataFrame(rows, columns=["key", "q", "n", "est"])

    return grouped.applyInPandasWithState(
        update,
        outputStructType=QSKETCH_OUTPUT_SCHEMA,
        stateStructType="counts array<long>",
        outputMode="update",
        timeoutConf=state_timeout,
    )


URL_DEDUP_STREAM_STATE_SCHEMA = "best_id long, best_len long, n long"


def url_dedup_stream(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
    state_timeout: str = "NoTimeout",
):
    """Streaming face of canonical-URL dedup
    (``functions.urls.url_dedup`` — C4/RefinedWeb stage 1) as an
    INGESTION stream: canonicalize each arriving document's URL
    map-side, then carry a keep-best record per canonical URL across
    micro-batches via ``applyInPandasWithState``, emitting the
    CURRENT winner ``(id, canon_url, n_copies)`` for every key the
    batch touched (update mode — a later, fuller capture of the same
    page supersedes the earlier emission, exactly how a continuous
    crawl revises its survivor set).

    Batch parity: keep-best under (longest text, ties lowest id) is a
    per-key MAX over an order-free semilattice, so after any drain the
    LAST emission per key equals the batch operator over all rows seen
    so far — under ANY split of the input into micro-batches and any
    arrival order (a strictly stronger contract than the corpus-build
    face's ascending-id requirement; the parity test shuffles rows
    across batches to pin it). ``n_copies`` accumulates the raw
    capture count per canonical URL.

    Scale: state is THREE scalars per distinct canonical URL — the
    winner id, its text length, and the copy count; text itself never
    enters the state store. Canonicalization is the map-only regexp
    chain; the only shuffle is the groupBy on canonical URL, the same
    key the batch window shuffles on."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupState  # noqa: PLC0415

    from linz_bde_uploader_spark.functions.urls import (  # noqa: PLC0415
        canonicalize_url,
    )

    keyed = df.select(
        F.col(id_col),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
        F.length(F.col(text_col)).cast("long").alias("_len"),
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            best_id, best_len, n = state.get
        else:
            best_id, best_len, n = None, -1, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            top = pdf.sort_values(
                ["_len", id_col], ascending=[False, True], kind="mergesort"
            ).iloc[0]
            tid, tlen = int(top[id_col]), int(top["_len"])
            if tlen > best_len or (tlen == best_len and (
                best_id is None or tid < best_id
            )):
                best_id, best_len = tid, tlen
        if n == 0:
            return
        state.update((int(best_id), int(best_len), int(n)))
        yield pd.DataFrame(
            {id_col: [best_id], "canon_url": [key[0]], "n_copies": [n]}
        )

    return keyed.groupBy("canon_url").applyInPandasWithState(
        update,
        outputStructType=f"{id_col} long, canon_url string, n_copies long",
        stateStructType=URL_DEDUP_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=state_timeout,
    )


def decontam_spans_batch_fn(
    bench_docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_span_tokens: int = 6,
    n: int = 3,
):
    """Build the per-micro-batch closure :func:`decontam_spans_stream`
    hands to ``foreachBatch`` — factored out (the
    ``corpus_build_batch_fn`` precedent) so the at-least-once replay
    contract is testable directly: re-invoking the returned function
    with an already-committed ``batch_id`` must leave the output
    unchanged, which holds because the gate is STATELESS (it never
    reads prior batches' output) and the write overwrites its own
    ``batch_id=`` partition."""
    from linz_bde_uploader_spark import caching  # noqa: PLC0415
    from linz_bde_uploader_spark.functions.decontaminate import (  # noqa: PLC0415
        contamination_spans,
    )

    # The benchmark is a FIXED artifact probed by every micro-batch:
    # cache its ROWS once so each batch's positional derivation
    # (tokenize → posexplode → hash, bounded by the benchmark's size)
    # starts from memory instead of re-scanning the source. Registered
    # via caching.track — release_intermediates() between jobs
    # reclaims it, and a later drain simply recomputes from lineage
    # (at 100 TB, persist the derived positional table itself and
    # pass it in — the standing-artifact shape the batch operator's
    # docstring prescribes).
    bench_static = caching.track(bench_docs)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = contamination_spans(
            batch_df,
            bench_static,
            id_col=id_col,
            text_col=text_col,
            min_span_tokens=min_span_tokens,
            n=n,
        )
        _state_write(out, out_dir, batch_id)

    return apply_batch


def decontam_spans_stream(
    spark: SparkSession,
    staging_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    out_dir: str,
    bench_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_span_tokens: int = 6,
    n: int = 3,
    max_files_per_trigger: int | None = None,
):
    """Streaming face of SPAN-grain benchmark decontamination — the
    ingestion-time twin of the batch ``contamination_spans``
    (``functions/decontaminate.py``, the GPT-3/PaLM span method): each
    micro-batch of newly arrived documents is probed against the FIXED
    eval-benchmark span table inside ``foreachBatch`` and the per-doc
    span-mass row (n_spans, n_bench, contaminated_tokens, max_span,
    contam_ratio, clean_text) lands under ``out_dir/batch_id=N``.
    With this face beside the exact/near/URL dedup gates, every
    arrival-time corpus gate the batch registry publishes is also
    available at ingestion time.

    STATELESS by construction — the benchmark is a fixed artifact
    (an eval suite never grows with the stream) and the report is
    per-document, so unlike the dedup faces there is no cross-batch
    state to read: batch parity holds under ANY split of the input
    into micro-batches and any arrival order (strictly stronger than
    the corpus-build face's ascending-id contract), and the
    at-least-once replay hole the r11 advice found in the corpus face
    cannot exist here. The per-``batch_id`` overwrite write keeps a
    replayed batch idempotent, so the checkpointed source offsets
    give exactly-once output rows.

    Reference parity anchor: the reference's polling loop applies its
    per-row clean fixups to each poll's arrivals the same way
    (bin/linz_bde_uploader.pl:242-248 → lib/LINZ/BdeUpload.pm clean
    path) — span scrubbing is that repair-not-reject contract at
    token grain, applied per micro-batch.

    Scale: identical to the batch operator per batch — the corpus
    side is linear map-only positional explode, the probe joins the
    broadcast benchmark table, only matched positions shuffle into
    the islands window; nothing accumulates across batches."""
    apply_batch = decontam_spans_batch_fn(
        bench_docs,
        out_dir,
        id_col=id_col,
        text_col=text_col,
        min_span_tokens=min_span_tokens,
        n=n,
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(staging_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


#: multimodal ingest funnel stages (per micro-batch). "payload" is a
#: dedicated stage so a NULL-payload pair's drop is attributed to its
#: actual cause (missing payload), never miscounted as a fingerprint
#: duplicate.
MEDIA_STAGES = [
    (0, "ingest"),
    (1, "alignment"),
    (2, "payload"),
    (3, "fp_dedup"),
]


def media_ingest_batch_fn(
    spark: SparkSession,
    state_dir: str,
    id_col: str = "media_id",
    content_col: str = "content",
    img_col: str = "img",
    txt_col: str = "txt",
    threshold: float = 0.28,
):
    """Build the per-micro-batch closure :func:`media_ingest_stream`
    hands to ``foreachBatch``. Replay-safe by the corpus-build face's
    contract: the standing fingerprint index is read with
    ``_state_read(..., before_batch=batch_id)`` (a replayed batch sees
    exactly the state the original run saw, never its own writes) and
    every write overwrites its own ``batch_id=`` partition."""
    from pyspark.sql import Window  # noqa: PLC0415

    from linz_bde_uploader_spark.functions.multimodal import (  # noqa: PLC0415
        _alignment_score,
        byte_fingerprint,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # the per-poll audit contract still holds: an empty poll
            # writes its zeroed funnel row (so a missing batch_id in
            # the funnel always means a LOST write, never an empty
            # poll); there are no admissions, so no index/corpus
            # partitions
            _state_write(
                spark.createDataFrame(
                    [(i, s, 0, 0) for i, s in MEDIA_STAGES],
                    "stage_no int, stage string, n_pairs long, "
                    "n_bytes long",
                ),
                f"{state_dir}/funnel",
                batch_id,
            )
            return
        flags = batch_df.select(
            id_col,
            F.length(content_col).cast("long").alias("_nb"),
            byte_fingerprint(F.col(content_col)).alias("_fp"),
            (
                _alignment_score(img_col, txt_col)
                >= F.lit(float(threshold))
            ).alias("_f1"),
        ).persist()
        try:
            # NULL payload ⇒ NULL fingerprint ⇒ never admitted — the
            # batch rule exactly (fingerprint_dedup's keep join on
            # [_fp, id] can never match a NULL key, so batch drops
            # every NULL-fp row); without this filter the left_anti
            # below would KEEP NULL keys and admit one per batch
            aligned = flags.filter(
                F.col("_f1") & F.col("_fp").isNotNull()
            )
            idx = _state_read(
                spark, f"{state_dir}/fpindex", before_batch=batch_id
            )
            fresh = aligned
            if idx is not None:
                fresh = aligned.join(
                    idx.select("_fp").distinct(), "_fp", "left_anti"
                )
            keep2 = (
                fresh.withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("_fp").orderBy(id_col)
                    ),
                )
                .filter(F.col("_rn") == 1)
                .select(id_col, F.lit(True).alias("_f2"))
            )
            # level = first drop: 0 failed alignment, 1 NULL payload
            # (the dedicated "payload" stage — its drop cause is a
            # missing payload, not a duplicate fingerprint), 2 dup
            # fingerprint, 3 admitted
            lv = flags.join(keep2, id_col, "left").select(
                id_col,
                "_nb",
                "_fp",
                F.when(~F.col("_f1"), 0)
                .when(F.col("_fp").isNull(), 1)
                .when(~F.coalesce(F.col("_f2"), F.lit(False)), 2)
                .otherwise(3)
                .alias("_level"),
            )
            stage_tbl = spark.createDataFrame(
                MEDIA_STAGES, "stage_no int, stage string"
            )
            agg = (
                lv.select(
                    F.explode(F.sequence(F.lit(0), F.lit(3))).alias(
                        "stage_no"
                    ),
                    "_level",
                    "_nb",
                )
                .filter(F.col("_level") >= F.col("stage_no"))
                .groupBy(F.col("stage_no").cast("int").alias("stage_no"))
                .agg(
                    F.count(F.lit(1)).cast("long").alias("_np"),
                    F.sum("_nb").cast("long").alias("_nby"),
                )
            )
            funnel = stage_tbl.join(agg, "stage_no", "left").select(
                "stage_no",
                "stage",
                F.coalesce(F.col("_np"), F.lit(0))
                .cast("long")
                .alias("n_pairs"),
                F.coalesce(F.col("_nby"), F.lit(0))
                .cast("long")
                .alias("n_bytes"),
            )
            _state_write(funnel, f"{state_dir}/funnel", batch_id)
            surv = lv.filter(F.col("_level") >= 3)
            _state_write(
                surv.select(id_col, "_fp"),
                f"{state_dir}/fpindex",
                batch_id,
            )
            _state_write(
                batch_df.join(
                    surv.select(id_col), id_col, "left_semi"
                ),
                f"{state_dir}/corpus",
                batch_id,
            )
        finally:
            flags.unpersist()

    return apply_batch


def media_ingest_stream(
    spark: SparkSession,
    staging_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    state_dir: str,
    id_col: str = "media_id",
    content_col: str = "content",
    img_col: str = "img",
    txt_col: str = "txt",
    threshold: float = 0.28,
    max_files_per_trigger: int | None = None,
):
    """Streaming multimodal ingestion gate — the arrival-time face of
    the admission stages of the multimodal corpus-build composite
    (``__spark_entry__._mm_corpus_level_frame``): each micro-batch of
    newly arrived (image, caption) pairs runs

        alignment gate (CLIP-score cut, map-only, stateless)
        → payload guard (NULL payload ⇒ dropped, its own funnel
          stage so the drop is attributed to the missing payload,
          never miscounted as a fingerprint duplicate)
        → incremental payload-fingerprint dedup (standing index)

    inside ``foreachBatch`` with the SAME audited operators
    (``multimodal._alignment_score``, ``multimodal.byte_fingerprint``)
    — one implementation, two drivers — writing under ``state_dir``:

    - ``fpindex`` — (id, fingerprint) of every admitted pair: the
      standing payload-dedup index (two scalars per survivor; the
      payload itself never enters state);
    - ``corpus``  — the admitted pairs (the growing training corpus);
    - ``funnel``  — one (stage_no, stage, n_pairs, n_bytes) row per
      stage PER MICRO-BATCH (the per-poll audit row).

    EXACT batch parity under ascending-id arrival (pinned by the
    parity test): the alignment gate is per-pair and order-free; the
    fingerprint gate admits a pair iff no LOWER-id aligned pair shares
    its fingerprint (earlier batch ⇒ in the index; same batch ⇒ the
    keep-first window) — exactly the batch keep-min-id rule, and
    exactly stages 2-3 of the batch composite. The composite's URL
    stage is deliberately NOT an admission gate here: its keep-BEST
    winner (longest capture) is not prefix-monotone — a later, fuller
    capture must SUPERSEDE an earlier admission, which is
    :func:`url_dedup_stream`'s update-mode contract, not an
    append-mode gate's.

    Scale: the alignment score and payload length are whole-stage-
    codegen Column folds; the fingerprint is the Arrow-batched pandas
    UDF; the exact gate is one anti join against the fingerprint
    index (AQE broadcasts it while it fits) plus a batch-local window;
    state grows as the admitted corpus, two longs per row."""
    apply_batch = media_ingest_batch_fn(
        spark,
        state_dir,
        id_col=id_col,
        content_col=content_col,
        img_col=img_col,
        txt_col=txt_col,
        threshold=threshold,
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(staging_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def media_ingest_finalize(spark: SparkSession, state_dir: str) -> DataFrame:
    """The cross-batch rollup of the media face's per-poll funnel rows
    — the ``corpus_build_finalize`` analog: sums every micro-batch's
    ``(stage_no, stage, n_pairs, n_bytes)`` rows per stage. Under the
    face's ascending-id parity contract the result equals the batch
    admission funnel over everything arrived (stage 0 and the
    alignment stage are per-pair and order-free; fingerprint
    admissions partition across batches by the keep-min-id rule, so
    their per-batch counts sum exactly)."""
    fun = _state_read(spark, f"{state_dir}/funnel")
    if fun is None:
        raise ValueError(f"no funnel state under {state_dir}")
    return (
        fun.groupBy("stage_no", "stage")
        .agg(
            F.sum("n_pairs").cast("long").alias("n_pairs"),
            F.sum("n_bytes").cast("long").alias("n_bytes"),
        )
        .orderBy("stage_no")
    )


def media_corpus_datasheet(
    spark: SparkSession,
    state_dir: str,
    img_col: str = "img",
    txt_col: str = "txt",
    source_col: str = "source",
    threshold: float = 0.28,
) -> DataFrame:
    """Per-source alignment datasheet over the ACCUMULATED admitted
    media corpus — the corpus-WIDE audit decision the streaming gate
    deliberately does not make per batch (quantiles and per-source
    means are functions of the whole corpus, exactly why
    ``corpus_build_finalize`` owns mixture/packing on the text side):
    runs the audited batch operator
    (``multimodal.alignment_datasheet``) over the corpus state
    unchanged — one implementation, two drivers."""
    from linz_bde_uploader_spark.functions.multimodal import (  # noqa: PLC0415
        alignment_datasheet,
    )

    corpus = _state_read(spark, f"{state_dir}/corpus")
    if corpus is None:
        raise ValueError(f"no corpus state under {state_dir}")
    return alignment_datasheet(
        corpus.drop("batch_id"),
        img_col=img_col,
        txt_col=txt_col,
        group_col=source_col,
        threshold=threshold,
    ).orderBy("source")


def weighted_reservoir_batch_fn(
    spark: SparkSession,
    state_dir: str,
    n: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: int = 0,
):
    """Build the per-micro-batch closure :func:`weighted_reservoir_stream`
    hands to ``foreachBatch`` — the arrival-time face of
    :func:`~linz_bde_uploader_spark.functions.sampling.weighted_sample`
    (Efraimidis–Spirakis A-ES, which IS a reservoir algorithm: keep the
    n largest ``ln(u)/w`` keys). Because the key is a pure function of
    ``(id, weight, salt)`` and top-n is order-free, this face has EXACT
    batch parity under ANY arrival order — strictly stronger than the
    dedup faces' ascending-id contract, and pinned by the parity test
    on two different interleavings.

    State under ``state_dir``:

    - ``reservoir`` — one n-row snapshot per micro-batch (id, weight,
      skey). The reservoir minimum is non-decreasing, so a row rejected
      at arrival can never belong to a later top-n — which makes the
      UNION of snapshots a lossless recovery basis: top-n over
      (prior snapshots ∪ batch) is exactly top-n over everything
      arrived (the invariant the replay guard leans on; snapshots
      overlap across batches, so the pool is distinct-ed first).
    - ``audit`` — one row per micro-batch: arrivals, sampling-mass
      candidates (positive finite weights), admissions into the
      snapshot, snapshot size (the per-poll audit row; a missing
      batch_id always means a lost write, never an empty poll).

    Replay-safe by the standing contract: state is read with
    ``before_batch=batch_id`` and every write overwrites its own
    partition.

    Scale: the candidate filter and key are map-only; the snapshot is
    a TakeOrderedAndProject over (n + batch) rows — the pool reads
    ONLY the latest prior snapshot (it dominates every earlier one by
    the non-decreasing-minimum invariant), so per-batch work does not
    grow with stream age; the full snapshot union is read only in the
    finalizer, where it serves as the recovery basis. Model-sized
    state (n rows per snapshot), never the stream's payload."""
    from linz_bde_uploader_spark.functions.sampling import (  # noqa: PLC0415
        es_key,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Latest snapshot only: it dominates every earlier one (the
        # non-decreasing-minimum invariant), so the pool is O(n+batch)
        # rows instead of n·batches; the finalizer keeps the full
        # snapshot union as the recovery basis.
        prev = _state_read_latest(
            spark, f"{state_dir}/reservoir", before_batch=batch_id
        )
        cand = batch_df.filter(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        ).select(
            F.col(id_col),
            F.col(weight_col).cast("double").alias("weight"),
            es_key(id_col, weight_col, salt).alias("skey"),
        )
        pool = cand if prev is None else cand.unionByName(
            prev.select(id_col, "weight", "skey")
        )
        top = (
            pool.distinct()
            .orderBy(F.desc("skey"), F.col(id_col))
            .limit(n)
            .persist()
        )
        try:
            _state_write(top, f"{state_dir}/reservoir", batch_id)
            audit = (
                batch_df.agg(
                    F.count(F.lit(1)).cast("long").alias("n_arrived")
                )
                .crossJoin(
                    cand.agg(
                        F.count(F.lit(1)).cast("long").alias("n_candidates")
                    )
                )
                .crossJoin(
                    top.join(cand.select(id_col), [id_col], "left_semi").agg(
                        F.count(F.lit(1)).cast("long").alias("n_admitted")
                    )
                )
                .crossJoin(
                    top.agg(
                        F.count(F.lit(1)).cast("long").alias("reservoir_size")
                    )
                )
            )
            _state_write(audit, f"{state_dir}/audit", batch_id)
        finally:
            top.unpersist()

    return apply_batch


def weighted_reservoir_stream(
    spark: SparkSession,
    staging_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    state_dir: str,
    n: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: int = 0,
    max_files_per_trigger: int | None = None,
):
    """Streaming weighted reservoir — maintain a deterministic A-ES
    weighted sample (without replacement) of everything that has ever
    arrived, e.g. the standing eval/metrics sample a continuous
    ingestion pipeline keeps beside the corpus. Same audited key as the
    batch operator (``sampling.es_key`` — one implementation, two
    drivers); see :func:`weighted_reservoir_batch_fn` for the state
    layout, the exact any-order parity contract, and the replay guard.
    """
    apply_batch = weighted_reservoir_batch_fn(
        spark, state_dir, n, weight_col=weight_col, id_col=id_col,
        salt=salt,
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(staging_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def weighted_reservoir_finalize(
    spark: SparkSession, state_dir: str, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """The standing sample: top-n over the union of every snapshot —
    by the non-decreasing-minimum invariant this equals the batch
    :func:`~linz_bde_uploader_spark.functions.sampling.weighted_sample`
    over everything arrived (the parity test pins it under two
    different arrival orders). Returns (id, weight, skey)."""
    res = _state_read(spark, f"{state_dir}/reservoir")
    if res is None:
        raise ValueError(f"no reservoir state under {state_dir}")
    return (
        res.select(id_col, "weight", "skey")
        .distinct()
        .orderBy(F.desc("skey"), F.col(id_col))
        .limit(n)
    )


def mixture_realize_batch_fn(
    spark: SparkSession,
    state_dir: str,
    plan_rows: "list[tuple]",
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Build the per-micro-batch closure :func:`mixture_realize_stream`
    hands to ``foreachBatch`` — the arrival-time face of
    :func:`~linz_bde_uploader_spark.functions.sampling.
    mixture_realization_audit`: a production pipeline plans the
    mixture on YESTERDAY's measurement and materializes TODAY's ingest
    against that fixed plan, keeping a standing realized-vs-target
    account beside the corpus. ``plan_rows`` is the bounded
    ``(source, n_docs, tokens, alloc_tokens)`` model artifact (collect the
    planner's frame once — the bpe_encode merge-list shape); each
    batch rebuilds the tiny plan frame and runs the audited
    :func:`~linz_bde_uploader_spark.functions.sampling.
    mixture_materialize` VERBATIM (one epoch machinery, two drivers).

    Because per-doc materialization is a pure function of (id, source,
    tokens-in-doc) under a FIXED plan, per-batch counters are ADDITIVE
    and the face has EXACT any-order batch parity (the
    weighted-reservoir contract class, stronger than the dedup faces'
    ascending-id one).

    State under ``state_dir`` — model-sized, never the payload:

    - ``counters`` — per batch, per (source, epoch): rows and token
      mass materialized from THAT batch alone (≤ |sources|·(max
      epochs+1) rows per batch).
    - ``audit`` — one row per micro-batch: arrivals, rows matching a
      planned source, materialized copies, sources touched (a missing
      batch_id always means a lost write, never an empty poll).

    Replay-safe STATELESSLY (the decontam-spans class): counters
    derive only from the batch itself — no prior-state read exists to
    race — and every write overwrites its own ``batch_id=`` partition,
    so a replayed micro-batch rewrites identical rows."""
    from linz_bde_uploader_spark.functions.sampling import (  # noqa: PLC0415
        mixture_materialize,
    )
    from linz_bde_uploader_spark.functions.text import (  # noqa: PLC0415
        token_count,
    )

    plan_schema = ("source string, n_docs long, tokens long,"
                   " alloc_tokens long")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        plan = spark.createDataFrame(list(plan_rows), plan_schema)
        mat = mixture_materialize(
            batch_df, plan, group_col=group_col, text_col=text_col,
            id_col=id_col,
        )
        counters = (
            mat.select(
                F.col(group_col).cast("string").alias("_s"),
                F.col("epoch"),
                token_count(F.col(text_col)).cast("long").alias("_t"),
            )
            .groupBy("_s", "epoch")
            .agg(
                F.count(F.lit(1)).cast("long").alias("_n"),
                F.sum("_t").cast("long").alias("_tok"),
            )
        )
        counters = counters.persist()
        try:
            _state_write(counters, f"{state_dir}/counters", batch_id)
            planned = [str(r[0]) for r in plan_rows]
            audit = (
                batch_df.agg(
                    F.count(F.lit(1)).cast("long").alias("n_arrived"),
                    # coalesce: sum over an EMPTY poll is NULL, and the
                    # audit contract is zeros, never NULLs
                    F.coalesce(
                        F.sum(
                            F.col(group_col).cast("string").isin(planned)
                            .cast("long")
                        ),
                        F.lit(0),
                    ).cast("long").alias("n_planned_source"),
                )
                .crossJoin(
                    counters.agg(
                        F.coalesce(F.sum("_n"), F.lit(0)).cast("long")
                        .alias("n_materialized"),
                        F.count_distinct(F.col("_s")).cast("long")
                        .alias("n_sources"),
                    )
                )
            )
            _state_write(audit, f"{state_dir}/audit", batch_id)
        finally:
            counters.unpersist()

    return apply_batch


def mixture_realize_stream(
    spark: SparkSession,
    staging_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    state_dir: str,
    plan_rows: "list[tuple]",
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
):
    """Streaming mixture materialization with a standing realization
    account — ingest documents as they land, up/down-sample each
    against a FIXED mixture plan, and keep per-(source, epoch)
    realized counters the finalizer turns into the batch-identical
    datasheet. See :func:`mixture_realize_batch_fn` for the parity
    contract, state layout, and replay guard."""
    apply_batch = mixture_realize_batch_fn(
        spark, state_dir, plan_rows, group_col=group_col,
        text_col=text_col, id_col=id_col,
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(staging_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def mixture_realize_finalize(
    spark: SparkSession, state_dir: str, plan_rows: "list[tuple]"
) -> DataFrame:
    """The standing realization datasheet: sum the additive
    per-(source, epoch) counters across every micro-batch and assemble
    the SAME datasheet as the batch audit
    (:func:`~linz_bde_uploader_spark.functions.sampling.
    realization_datasheet_from_counters` — one implementation, two
    drivers). Equals ``mixture_realization_audit`` over everything
    arrived, under ANY arrival order (pinned by the parity test)."""
    from linz_bde_uploader_spark.functions.sampling import (  # noqa: PLC0415
        realization_datasheet_from_counters,
    )

    cnt = _state_read(spark, f"{state_dir}/counters")
    if cnt is None:
        raise ValueError(f"no counters state under {state_dir}")
    per_epoch = cnt.groupBy("_s", "epoch").agg(
        F.sum("_n").cast("long").alias("_n"),
        F.sum("_tok").cast("long").alias("_tok"),
    )
    plan = spark.createDataFrame(
        list(plan_rows),
        "source string, n_docs long, tokens long, alloc_tokens long",
    )
    return realization_datasheet_from_counters(plan, per_epoch)


def soft_dedup_batch_fn(
    spark: SparkSession,
    state_dir: str,
    prefix_tokens: int = 8,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Build the per-micro-batch closure :func:`soft_dedup_stream`
    hands to ``foreachBatch`` — the arrival-time face of
    :func:`~linz_bde_uploader_spark.functions.dedup.soft_dedup`
    (SoftDeDup duplicate REWEIGHTING): maintain the standing
    duplicate-cluster counts a live ingestion gate reads, without ever
    deleting a document. Both per-cluster reductions are order-free
    folds (count is additive, keeper is a min), so the face has EXACT
    batch parity under ANY arrival order — the weighted-reservoir
    contract class, pinned by the parity test on two interleavings.

    State under ``state_dir``:

    - ``counts`` — one cumulative snapshot per micro-batch
      ``(k, dup_count, keeper)``: the standing commonness signal
      (latest snapshot dominates — each batch merges the previous
      snapshot with its own per-key rollup, sum/min, so per-batch
      work is O(standing keys + batch), never stream age).
    - ``members`` — per batch, the arrivals' ``(doc_id, source,
      n_tokens, k)`` rows — ids and a bounded prefix key, never the
      payload; the recovery basis the finalizer re-weights.
    - ``audit`` — one row per micro-batch: arrivals, batch clusters,
      standing clusters after the merge (an empty poll still writes
      its row — zeros, snapshot carried).

    Replay-safe by the standing contract: state is read with
    ``before_batch=batch_id`` (counts: latest strictly-prior
    snapshot) and every write overwrites its own partition.
    """
    from linz_bde_uploader_spark.functions.text import (  # noqa: PLC0415
        token_count,
        tokens,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        prev = _state_read_latest(
            spark, f"{state_dir}/counts", before_batch=batch_id
        )
        key = F.concat_ws(
            " ", F.slice(tokens(F.col(text_col)), 1, int(prefix_tokens))
        )
        mem = batch_df.select(
            F.col(id_col),
            F.col(group_col).cast("string").alias("source"),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
            key.alias("k"),
        )
        bc = mem.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("dup_count"),
            F.min(id_col).alias("keeper"),
        )
        merged = bc if prev is None else (
            bc.unionByName(prev.select("k", "dup_count", "keeper"))
            .groupBy("k")
            .agg(
                F.sum("dup_count").cast("long").alias("dup_count"),
                F.min("keeper").alias("keeper"),
            )
        )
        merged = merged.persist()
        try:
            _state_write(merged, f"{state_dir}/counts", batch_id)
            _state_write(mem, f"{state_dir}/members", batch_id)
            audit = (
                batch_df.agg(
                    F.count(F.lit(1)).cast("long").alias("n_arrived")
                )
                .crossJoin(
                    bc.agg(
                        F.count(F.lit(1)).cast("long").alias(
                            "n_batch_clusters"
                        )
                    )
                )
                .crossJoin(
                    merged.agg(
                        F.count(F.lit(1)).cast("long").alias(
                            "n_standing_clusters"
                        )
                    )
                )
            )
            _state_write(audit, f"{state_dir}/audit", batch_id)
        finally:
            merged.unpersist()

    return apply_batch


def soft_dedup_stream(
    spark: SparkSession,
    staging_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    state_dir: str,
    prefix_tokens: int = 8,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
):
    """Streaming SoftDeDup — maintain the standing duplicate-cluster
    counts (and the reweighting basis) over everything that has ever
    arrived; the soft-policy sibling of the hard streaming dedup gate.
    Same prefix key and weight rule as the batch operator (one
    implementation, two drivers); see :func:`soft_dedup_batch_fn` for
    the state layout and the exact any-order parity contract."""
    apply_batch = soft_dedup_batch_fn(
        spark, state_dir, prefix_tokens=prefix_tokens,
        group_col=group_col, text_col=text_col, id_col=id_col,
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(staging_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def soft_dedup_finalize(
    spark: SparkSession, state_dir: str, id_col: str = "doc_id"
) -> DataFrame:
    """The standing per-document reweighting datasheet: the member
    union (distinct — replays overwrite their own partition, but a
    crashed-then-replayed batch may leave duplicates across
    partitions) re-weighted by a count/min window over the prefix
    key — STRUCTURALLY the batch
    :func:`~linz_bde_uploader_spark.functions.dedup.soft_dedup` over
    everything arrived (the parity test also pins the latest
    ``counts`` snapshot equal to the members-derived rollup)."""
    from pyspark.sql import Window  # noqa: PLC0415

    mem = _state_read(spark, f"{state_dir}/members")
    if mem is None:
        raise ValueError(f"no members state under {state_dir}")
    base = mem.select(id_col, "source", "n_tokens", "k").distinct()
    w = Window.partitionBy("k")
    return base.select(
        id_col,
        "source",
        "n_tokens",
        F.count(F.lit(1)).over(w).cast("long").alias("dup_count"),
        F.min(id_col).over(w).alias("_keeper"),
    ).select(
        id_col,
        "source",
        "n_tokens",
        "dup_count",
        F.round(F.lit(1.0) / F.col("dup_count"), 6).alias("soft_weight"),
        F.round(
            F.col("n_tokens").cast("double") / F.col("dup_count"), 4
        ).alias("effective_tokens"),
        (F.col(id_col) == F.col("_keeper")).cast("int").alias("keep_hard"),
    )
