"""Multimodal (binary) column operators: metadata, fingerprint dedup,
decode/thumbnail/frame-sample plumbing.

Design for a 100-TB media pipeline: image/audio/video payloads are opaque
``binary`` columns with *typed metadata columns* beside them — Spark never
interprets the bytes in the JVM row path. The three operator tiers:

1. **Metadata extraction** — pure Column expressions (size, magic bytes):
   whole-stage codegen, no Python.
2. **Byte-level sketches** — Arrow-batched pandas UDFs (numpy per value);
   the sanctioned slow path, vectorized at the transfer layer. Used for
   payload fingerprint dedup (the binary analog of text near-dup).
3. **Decode / resize / frame-sample** — ``mapInPandas`` over Arrow record
   batches, so each Python worker streams batches without materializing
   the whole partition. The *decode* step needs an image/audio codec
   (PIL/ffmpeg), which is NOT in this environment: the plumbing (schema,
   batch iteration, UDF signatures, partition behavior) is real and
   tested; the codec call is isolated behind ``_decode_image``, which
   falls back to a clearly-marked deterministic fake so the distributed
   machinery is exercisable end-to-end.

The synthetic media fixture derives bytes from the ``documents`` table
(UTF-8 of the text column) so every sketch is reproducible in ANSI SQL for
the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

HASH_MOD = 2_147_483_647
_WEIGHT_MIX = 2_654_435_761  # Knuth multiplicative constant (public domain)

#: bytes of payload a fingerprint samples — fixed so the sketch is stable
FINGERPRINT_BYTES = 64

try:  # codec gate: PIL is not in this container; plumbing still runs
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


# ---------------------------------------------------------------------------
# tier 1: metadata as Column expressions
# ---------------------------------------------------------------------------


def synth_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic synthetic media table: payload = UTF-8 bytes of the
    text column. Stands in for a real (media_id, content, mime) table."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def media_size_bytes(content: Column | str) -> Column:
    c = F.col(content) if isinstance(content, str) else content
    return F.length(c).cast("long")


def media_magic_hex(content: Column | str, n: int = 4) -> Column:
    """Hex of the payload's leading bytes — the magic-number sniff every
    media pipeline runs before routing to a decoder."""
    c = F.col(content) if isinstance(content, str) else content
    # substr on binary is byte-addressed in Spark
    return F.hex(F.substring(c, 1, n))


# ---------------------------------------------------------------------------
# tier 2: byte fingerprint (Arrow-batched pandas UDF)
# ---------------------------------------------------------------------------

_FP_WEIGHTS = np.array(
    [((i + 1) * _WEIGHT_MIX) % HASH_MOD for i in range(FINGERPRINT_BYTES)],
    dtype=np.int64,
)


def byte_fingerprint(content: Column | str) -> Column:
    """Position-weighted byte sketch over the first FINGERPRINT_BYTES bytes:
    ``sum(byte_i * w_i mod P) mod P``, ``w_i = (i*2654435761) mod P``.

    Deterministic pure arithmetic — identical payloads collide exactly, and
    the value is reproducible in ANSI SQL for oracle checks. Arrow batches
    in/out; numpy per value (no Python-level byte loop). The UDF is built
    lazily because ``pandas_udf`` type parsing needs an active session."""

    @pandas_udf("long")
    def _fp(s: pd.Series) -> pd.Series:
        def one(b) -> int | None:
            if b is None:
                return None
            arr = np.frombuffer(
                bytes(b[:FINGERPRINT_BYTES]), dtype=np.uint8
            ).astype(np.int64)
            if arr.size == 0:
                return 0
            return int(((arr * _FP_WEIGHTS[: arr.size]) % HASH_MOD).sum() % HASH_MOD)

        return s.map(one)

    return _fp(F.col(content) if isinstance(content, str) else content)


def fingerprint_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact payload dedup by fingerprint: keep the min-id row per
    fingerprint group — one shuffle, same shape as text exact_dedup."""
    with_fp = df.withColumn("_fp", byte_fingerprint(F.col(content_col)))
    keep = with_fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return (
        with_fp.join(keep, ["_fp", id_col], "left_semi")
        .select(F.col(id_col), F.col("_fp").alias("fingerprint"))
    )


# ---------------------------------------------------------------------------
# tier 3: decode / thumbnail / frame-sample over mapInPandas
# ---------------------------------------------------------------------------

THUMBNAIL_SCHEMA = "media_id long, width int, height int, thumb binary"


#: thumbnail bounding box for the real-codec path
THUMB_MAX = (128, 128)


def _fake_decode(payload: bytes) -> tuple[int, int, bytes]:
    """DETERMINISTIC FAKE codec: dimensions derived from the payload size,
    thumbnail = leading bytes. Keeps the operator (and its DuckDB oracle)
    reproducible wherever no real codec is installed."""
    n = len(payload)
    return (n % 640) + 16, (n % 480) + 16, payload[:16]


def _decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode → (width, height, thumbnail-bytes).

    Uses the real codec (PIL ``Image.open`` + ``thumbnail``) when Pillow is
    importable; otherwise the deterministic fake. A payload the real codec
    cannot parse also falls back to the fake rather than failing the batch —
    one corrupt blob must not kill a 100-TB media scan (the reference routes
    bad records through the P8 error budget, lib/LINZ/BdeUpload.pm:1164)."""
    if HAVE_PIL:
        try:  # pragma: no cover - Pillow not present in this container
            from io import BytesIO

            with Image.open(BytesIO(payload)) as im:
                im.thumbnail(THUMB_MAX)
                width, height = im.size
                buf = BytesIO()
                im.convert("RGB").save(buf, format="PNG")
                return width, height, buf.getvalue()
        except Exception:
            pass  # unparseable payload → deterministic fake below
    return _fake_decode(payload)


def decode_thumbnails(df: DataFrame, id_col: str = "media_id",
                      content_col: str = "content") -> DataFrame:
    """Decode each payload and emit (id, width, height, thumb).

    ``mapInPandas``: the worker receives an iterator of Arrow batches and
    yields result batches — constant memory per worker regardless of
    partition size, the correct shape for 100-TB media scans. Partitioning
    is preserved (no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                (None, None, None) if b is None else _decode_image(bytes(b))
                for b in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "thumb": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(batches, THUMBNAIL_SCHEMA)


def frame_sample(content: Column | str, k: int = 16) -> Column:
    """Every k-th byte of the payload — the frame-sampling analog for
    audio/video streams (sample every k-th frame). Numpy slice per value."""

    @pandas_udf("binary")
    def _sample(s: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            return np.frombuffer(bytes(b), dtype=np.uint8)[::k].tobytes()

        return s.map(one)

    return _sample(F.col(content) if isinstance(content, str) else content)


# ---------------------------------------------------------------------------
# tier 4: cross-modal alignment (embedding columns beside the payload)
# ---------------------------------------------------------------------------


def image_text_alignment(
    df: DataFrame,
    img_col: str = "img_embedding",
    txt_col: str = "txt_embedding",
    id_col: str = "media_id",
    threshold: float = 0.28,
) -> DataFrame:
    """LAION-style image-text alignment gate (Schuhmann et al. 2021):
    per (image, caption) pair, the cosine between the image-embedding
    and text-embedding columns — the CLIP score — and a keep flag at
    ``threshold`` (LAION-400M's published English cut is 0.3, the
    5B relaxation 0.28). This is THE filter that built the public
    image-text corpora: pairs whose caption does not describe the
    image score low and are dropped before training.

    Returns ``(id, align_score, keep)`` — score at 6 dp, every row
    emits (an audit needs the margin on both sides of the cut).

    Edge contract: a zero-norm embedding has no defined cosine —
    under this engine's ANSI mode the bare division would RAISE
    ``DIVIDE_BY_ZERO``, so the divide sits behind a denominator
    guard and such a pair emits the out-of-range sentinel
    ``align_score = -2.0`` with ``keep = false``: loud (no real
    cosine is below -1), null-free (the driver-surface rule), and
    it can never silently pass the gate.

    Scale: MAP-ONLY — three sequential-fold array reductions per row
    (dot + both norms, all whole-stage-codegen Column arithmetic),
    no join, no shuffle, no UDF; the scan is linear in corpus bytes
    and embarrassingly parallel at any executor count. The embedding
    pair rides the same row, so no alignment join is ever needed —
    the contract a 100-TB media table should store to."""
    score = _alignment_score(img_col, txt_col)
    return df.select(
        F.col(id_col),
        score.alias("align_score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def _alignment_score(img_col: str, txt_col: str) -> Column:
    """The gate's guarded 6-dp CLIP-score cosine — shared by the
    per-pair gate and the per-source datasheet so the datasheet's
    quantiles always describe EXACTLY the score the gate applies
    (sentinel, guard, and rounding can never diverge)."""
    from linz_bde_uploader_spark.functions.similarity import (  # noqa: PLC0415
        dot,
        norm,
    )

    den = norm(F.col(img_col)) * norm(F.col(txt_col))
    return F.when(
        den > 0,
        F.round(dot(F.col(img_col), F.col(txt_col)) / den, 6),
    ).otherwise(F.lit(-2.0))


def alignment_datasheet(
    df: DataFrame,
    img_col: str = "img_embedding",
    txt_col: str = "txt_embedding",
    group_col: str = "source",
    threshold: float = 0.28,
) -> DataFrame:
    """Per-source alignment-quantile datasheet over the gate above —
    the audit row a corpus card publishes per ingest source: pair
    count, kept count/fraction at ``threshold``, fixed-point mean
    alignment, and the exact p10/p50/p90 alignment quantiles (a
    source whose p50 sits under the cut is mostly noise; one whose
    p10 clears it needs no filtering).

    Determinism: scores are 6-dp-rounded BEFORE aggregation;
    ``mean_align`` averages 1e-6 fixed-point longs (the
    host-datasheet convention) so partial-agg fold order cannot
    drift it; quantiles use the interpolated ``percentile``, which
    DuckDB's ``quantile_cont`` mirrors arithmetic-for-arithmetic
    (the q_percentiles precedent).

    Scale: the gate is map-only; the only shuffle is the |sources|-key
    partial agg (map-side combined). The exact percentile holds the
    per-source score list on the reducer — bounded by source count ×
    corpus/|sources|; swap for the histogram quantile sketch
    (``sketches.histogram_sketch``) when a single source's row count
    outgrows reducer memory at the 100-TB end."""
    score = _alignment_score(img_col, txt_col)
    scored = df.select(
        F.col(group_col).alias("source"),
        score.alias("_s"),
        (score >= F.lit(float(threshold))).cast("long").alias("_k"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_k").cast("long").alias("n_kept"),
        F.round(F.sum("_k").cast("double") / F.count(F.lit(1)), 4).alias(
            "kept_frac"
        ),
        F.round(
            F.sum(F.round(F.col("_s") * 1e6).cast("long"))
            / (F.count(F.lit(1)) * F.lit(1e6)),
            6,
        ).alias("mean_align"),
        F.round(F.percentile(F.col("_s"), F.lit(0.1)), 6).alias("p10"),
        F.round(F.percentile(F.col("_s"), F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile(F.col("_s"), F.lit(0.9)), 6).alias("p90"),
    )
