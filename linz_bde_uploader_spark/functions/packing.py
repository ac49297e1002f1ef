"""Sequence packing — assign documents to fixed-token-budget training
sequences.

Training pipelines concatenate documents into fixed-length sequences
(e.g. 2048/4096 tokens); the packer decides which documents share a
sequence and at what offset. This implements the deterministic
GREEDY-SEQUENTIAL policy: within each shard, documents are visited in id
order and appended to the current pack while they fit; a document that
would overflow starts the next pack. Documents longer than the capacity
are clamped (truncated) to exactly one full pack — the standard
behavior for over-length documents.

Why a Pandas-UDF operator and not a window expression: pack assignment
is a RUNNING-STATE recurrence (the boundary depends on the running
remainder, which resets at every boundary) — not expressible as a plain
cumulative window. It IS expressible as a recursive CTE, which is what
the correctness oracle uses, but per-row recursion in SQL is quadratic
in group size; the per-shard linear scan here is the right physical
plan.

Scale design: the corpus is grouped by a deterministic SHARD (a pure
function of the id, same integer mixing as ``sampling.split_bucket``),
so packing parallelizes across shards — each shard's scan is linear,
Arrow-batched, and independent. At 100 TB you pick the shard count to
size each group to executor memory; packs never span shards, which is
exactly what training wants (a shard is the unit a data-loader worker
reads).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.text import HASH_MIX, HASH_MOD


def shard_of(id_col, n_shards: int):
    """Deterministic shard in [0, n_shards): same mixed-id hash as
    split_bucket, reduced mod the shard count — engine-independent and
    oracle-expressible."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    mixed = F.pmod(
        F.pmod(c.cast("long"), F.lit(HASH_MOD)) * HASH_MIX, F.lit(HASH_MOD)
    )
    return F.pmod(mixed, F.lit(n_shards))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    n_shards: int = 8,
) -> DataFrame:
    """Greedy-sequential packing into ``capacity``-token sequences.

    Returns (shard, id_col, clamped_tokens, pack_id, pack_offset):
    ``pack_id`` numbers packs within the shard from 0 in visit order,
    ``pack_offset`` is the document's starting token position inside its
    pack. Deterministic: ids are visited in ascending order per shard.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")

    out_schema = (
        f"shard int, {id_col} long, clamped_tokens long, "
        "pack_id long, pack_offset long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        # null/NaN token counts pack as 0 tokens (token_count's
        # blank-text convention) — astype('int64') on NaN would
        # otherwise fail the whole shard's task
        clamped = (
            pdf[tokens_col].fillna(0).clip(lower=0, upper=capacity)
            .astype("int64")
        )
        pack_ids, offsets = [], []
        cur, used = 0, 0
        for t in clamped:
            if used + t > capacity:
                cur += 1
                used = 0
            pack_ids.append(cur)
            offsets.append(used)
            used += t
        return pd.DataFrame(
            {
                "shard": pdf["shard"].astype("int32"),
                id_col: pdf[id_col].astype("int64"),
                "clamped_tokens": clamped,
                "pack_id": pd.Series(pack_ids, dtype="int64", index=pdf.index),
                "pack_offset": pd.Series(offsets, dtype="int64", index=pdf.index),
            }
        )

    sharded = df.select(
        shard_of(id_col, n_shards).cast("int").alias("shard"),
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).alias(tokens_col),
    )
    return sharded.groupBy("shard").applyInPandas(pack, out_schema)


def pack_utilization(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-shard packing efficiency: packs used and mean fill fraction —
    the metric you watch when tuning capacity vs. document length
    distribution. One narrow aggregation over the packer output."""
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.sum("clamped_tokens").alias("fill")
    )
    return per_pack.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.round(F.avg(F.col("fill") / F.lit(float(capacity))), 6).alias(
            "mean_fill"
        ),
    )


def pack_best_fit(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    n_shards: int = 8,
) -> DataFrame:
    """Best-fit-decreasing packing — the classic bin-packing heuristic
    (≤ 11/9·OPT + 1 packs) as the higher-utilization alternative to
    :func:`pack_sequences`' greedy-sequential policy, at the cost of
    losing document order inside a pack.

    Within each shard, documents are visited LONGEST FIRST (tokens
    desc, id asc — a total order) and placed into the open pack with
    the SMALLEST remaining capacity that still fits (ties → lowest
    pack_id); a document no pack can hold opens a new one. Over-length
    documents are clamped to one full pack, null/negative counts pack
    as 0 (``pack_sequences``' conventions).

    Returns the same surface as :func:`pack_sequences`:
    ``(shard, id_col, clamped_tokens, pack_id, pack_offset)`` where
    ``pack_offset`` is the placement position inside the pack.

    Why applyInPandas: the bag of open-pack remainders is running
    state no window expression carries; the oracle replays the exact
    recurrence as a recursive CTE whose state is the remainder LIST
    indexed by pack_id (list_min∘list_filter = best fit,
    list_position = lowest-index tiebreak).

    Scale: identical layout to :func:`pack_sequences` — one shuffle to
    the deterministic shard key, then a per-shard numpy scan (the
    best-fit probe is a vectorized mask over the ≤|packs| remainder
    array, O(n·packs) C-speed per shard; shard count sizes groups to
    executor memory, packs never span shards).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")

    import numpy as np  # noqa: PLC0415

    out_schema = (
        f"shard int, {id_col} long, clamped_tokens long, "
        "pack_id long, pack_offset long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.assign(
            _t=pdf[tokens_col].fillna(0).clip(lower=0, upper=capacity)
            .astype("int64")
        ).sort_values(
            ["_t", id_col], ascending=[False, True], kind="mergesort"
        )
        rem = np.empty(len(pdf), dtype=np.int64)  # grows; rem[:n_packs]
        n_packs = 0
        pack_ids = np.empty(len(pdf), dtype=np.int64)
        offsets = np.empty(len(pdf), dtype=np.int64)
        for j, t in enumerate(pdf["_t"].to_numpy()):
            open_rem = rem[:n_packs]
            fits = np.nonzero(open_rem >= t)[0]
            if fits.size:
                pos = fits[np.argmin(open_rem[fits])]
                # np.argmin returns the FIRST minimum → lowest pack_id
                pack_ids[j] = pos
                offsets[j] = capacity - rem[pos]
                rem[pos] -= t
            else:
                pack_ids[j] = n_packs
                offsets[j] = 0
                rem[n_packs] = capacity - t
                n_packs += 1
        return pd.DataFrame(
            {
                "shard": pdf["shard"].astype("int32").to_numpy(),
                id_col: pdf[id_col].astype("int64").to_numpy(),
                "clamped_tokens": pdf["_t"].to_numpy(),
                "pack_id": pack_ids,
                "pack_offset": offsets,
            }
        )

    sharded = df.select(
        shard_of(id_col, n_shards).cast("int").alias("shard"),
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).alias(tokens_col),
    )
    return sharded.groupBy("shard").applyInPandas(pack, out_schema)
