"""Context-window document chunking — the step between a cleaned corpus
and sequence packing: split each document into fixed-size token windows
with overlap, so no training sequence crosses a document boundary and
long documents aren't truncated to one window.

Chunk boundaries are a pure function of the token array (stride
arithmetic), so the operator is a map-side ``explode`` — no shuffle, no
Python, linear in corpus size, and oracle-expressible (the same stride
arithmetic in ANSI SQL's generate_series)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Explode each document into ``(id, chunk_id, n_tokens, chunk)``
    windows of ``chunk_tokens`` whitespace tokens, consecutive windows
    sharing ``overlap`` tokens (stride = chunk_tokens − overlap).

    The last window keeps the tail even when shorter than a full chunk;
    a document shorter than one chunk yields exactly one window; empty
    documents yield none. Every row's chunk is reassembled with single
    spaces (the engine's token convention), so chunk text is stable
    across engines.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be within [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toks = tokens(F.trim(F.col(text_col)))
    n = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(toks))
    # number of windows: 1 + ceil(max(n - chunk, 0) / stride)
    n_chunks = F.when(n == 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.floor(
            (F.greatest(n - F.lit(chunk_tokens), F.lit(0))
             + F.lit(stride - 1)) / F.lit(stride)
        ).cast("int")
    )
    out = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        n_chunks.alias("_nc"),
    ).filter(F.col("_nc") >= 1).select(
        F.col(id_col),
        F.col("_toks"),
        F.explode(
            F.sequence(F.lit(0), F.col("_nc") - 1)
        ).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride  # 0-based token offset
    piece = F.slice(F.col("_toks"), start + 1, chunk_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_id").cast("int"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk"),
    )
