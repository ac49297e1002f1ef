"""Blocked fuzzy matching / record linkage — approximate joins on
dirty string keys.

Catalog and entity data rarely joins on clean keys: OCR noise, typos,
and format drift make "red widget" arrive as "red widge" or
"red  widget". The classical record-linkage design (Fellegi-Sunter
pipelines, Dedupe, Splink) is the ONLY shape that survives scale:

1. **Dictionary first** — pair DISTINCT key strings, never raw rows.
   A key appearing a million times must not contribute a million rows
   to the pair space; it contributes one dictionary entry with a
   support count, and row-level joins happen through the resolved
   bridge afterwards (equi-joins, broadcastable when the dictionary
   is small).
2. **Multi-pass blocking** — candidate pairs come from equi-joins on
   cheap block keys (here: first token and last token, two passes
   unioned), never from an all-pairs cartesian. A pair is considered
   only if SOME pass co-blocks it; recall is the union of the passes.
3. **Cheap filters before the expensive verify** — a length band
   (``abs(len_a - len_b) <= max_dist``) is a necessary condition for
   edit distance and prunes most candidates before the DP runs.
4. **Exact verify on candidates only** — ``levenshtein`` (JVM-side,
   whole-stage codegen; same DP as DuckDB's ``levenshtein``) bounded
   to the surviving candidates.

Reference parity: the reference engine's keyed-merge machinery
(`sql/02-bde_control_functions.sql.in` change-classification joins)
assumes exact keys; this module is the approximate-key complement a
training-data / entity-resolution pipeline needs on top.

Scale: block-key equi-joins shuffle on the block key; skewed blocks
(a stopword first token) are bounded by ``max_block`` — oversized
blocks are dropped and REPORTED via ``blocked_out`` rather than
silently exploding the pair space (the no-silent-caps rule: a dropped
block is a visible recall decision, not an accident).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _block_keys(name: Column) -> Column:
    """Blocking keys for one name: first and last whitespace token.
    Two passes unioned — a typo in one token still co-blocks the pair
    through the other token."""
    toks = F.split(name, " ")
    return F.array_distinct(
        F.array(F.element_at(toks, 1), F.element_at(toks, -1))
    )


def name_dictionary(
    df: DataFrame, name_col: str, min_support: int = 1
) -> DataFrame:
    """Distinct-key dictionary ``(name, support)`` — the dictionary-first
    step. One partial-agg shuffle on the name; support is the raw row
    count behind each distinct key."""
    return (
        df.filter(F.col(name_col).isNotNull())
        .groupBy(F.col(name_col).alias("name"))
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def fuzzy_name_pairs(
    names: DataFrame,
    max_dist: int = 2,
    max_block: int = 10_000,
) -> DataFrame:
    """All dictionary-name pairs within edit distance ``max_dist``:
    ``(name_a, name_b, dist, support_a, support_b)`` with
    ``name_a < name_b``.

    ``names`` is a ``(name, support)`` dictionary (see
    :func:`name_dictionary`). Candidates come from two blocking passes
    (first token, last token) unioned and deduplicated; a length band
    prunes before the ``levenshtein`` verify. Blocks larger than
    ``max_block`` dictionary entries are dropped from pairing (the
    skew guard — a stopword block would otherwise go quadratic); use
    :func:`oversized_blocks` to see what was dropped.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    keyed = names.select(
        "name", "support", F.explode(_block_keys(F.col("name"))).alias("_bk")
    )
    # Skew guard: bound per-block pair work. Anti-join against
    # oversized block keys (tiny — broadcast).
    big = (
        keyed.groupBy("_bk")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_block)
        .select("_bk")
    )
    keyed = keyed.join(F.broadcast(big), "_bk", "left_anti")
    a = keyed.select(
        F.col("_bk"),
        F.col("name").alias("name_a"),
        F.col("support").alias("support_a"),
    )
    b = keyed.select(
        F.col("_bk"),
        F.col("name").alias("name_b"),
        F.col("support").alias("support_b"),
    )
    cand = (
        a.join(b, "_bk")
        .filter(F.col("name_a") < F.col("name_b"))
        # a pair co-blocked by BOTH passes must count once
        .drop("_bk")
        .distinct()
        # length band: necessary condition for edit distance <= d
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
        )
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist", "support_a", "support_b")
    )


def oversized_blocks(
    names: DataFrame, max_block: int = 10_000
) -> DataFrame:
    """The blocks :func:`fuzzy_name_pairs` dropped under the skew
    guard: ``(block_key, n_names)`` — the visible face of the recall
    decision."""
    return (
        names.select(F.explode(_block_keys(F.col("name"))).alias("block_key"))
        .groupBy("block_key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_names"))
        .filter(F.col("n_names") > max_block)
    )


def _dictionary_bridge(
    ld: DataFrame, rd: DataFrame, max_dist: int, max_block: int
) -> DataFrame:
    """``(_lname, _rname, _dist)`` pairs within ``max_dist`` between a
    left and a right name dictionary — blocking passes unioned, skew
    guard on the LEFT side's block sizes, length band, then the DP
    verify on surviving candidates only."""
    lk = ld.select(
        "_lname", F.explode(_block_keys(F.col("_lname"))).alias("_bk")
    )
    rk = rd.select(
        "_rname", F.explode(_block_keys(F.col("_rname"))).alias("_bk")
    )
    big = (
        lk.groupBy("_bk").agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_block).select("_bk")
    )
    lk = lk.join(F.broadcast(big), "_bk", "left_anti")
    return (
        lk.join(rk, "_bk")
        .drop("_bk")
        .distinct()
        .filter(F.abs(F.length("_lname") - F.length("_rname")) <= max_dist)
        .withColumn("_dist", F.levenshtein(F.col("_lname"), F.col("_rname")))
        .filter(F.col("_dist") <= max_dist)
    )


def best_matches(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    max_block: int = 10_000,
) -> DataFrame:
    """Per DISTINCT left key, its best right-side match:
    ``(dirty_name, match_name, dist)`` — minimum edit distance, ties
    broken lexicographically on the match name (a struct-min, so the
    result is deterministic). Unmatched left keys stay in the output
    with the ``('', -1)`` sentinel — the no-silent-drop rule; NULLs
    never surface.

    The match runs dictionary-to-dictionary (distinct keys only);
    row-level supports are irrelevant to the best-match decision, so
    raw rows never reach the DP.
    """
    ld = name_dictionary(left, left_col).select(F.col("name").alias("_lname"))
    rd = name_dictionary(right, right_col).select(F.col("name").alias("_rname"))
    bridge = _dictionary_bridge(ld, rd, max_dist, max_block)
    best = bridge.groupBy("_lname").agg(
        F.min(F.struct(F.col("_dist"), F.col("_rname"))).alias("_best")
    )
    return (
        ld.join(best, "_lname", "left")
        .select(
            F.col("_lname").alias("dirty_name"),
            F.coalesce(F.col("_best._rname"), F.lit("")).alias("match_name"),
            F.coalesce(F.col("_best._dist"), F.lit(-1))
            .cast("long")
            .alias("dist"),
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    max_block: int = 10_000,
) -> DataFrame:
    """Approximate-key join: rows of ``left`` matched to rows of
    ``right`` whose key strings are within ``max_dist`` edits
    (including exact matches at distance 0). Returns
    ``left.* + _match_name + _dist`` followed by ``right``'s columns.

    Shape: dictionary per side → blocked pair match on the
    dictionaries (the expensive part runs on DISTINCT keys only) →
    the resulting ``(left key, right key, dist)`` bridge is equi-joined
    back to both row sets. When the dictionaries are small the bridge
    broadcast-joins; the row-level joins are plain hash equi-joins
    either way — the DP never touches raw rows.

    Column-name collisions (common for the key column itself) are
    resolved by suffixing the RIGHT side: any right column whose name
    already exists on the left (or equals ``_match_name``/``_dist``)
    comes out as ``_r_<name>``, so every output column stays
    addressable by name.
    """
    ld = name_dictionary(left, left_col).select(
        F.col("name").alias("_lname")
    )
    rd = name_dictionary(right, right_col).select(
        F.col("name").alias("_rname")
    )
    bridge = _dictionary_bridge(ld, rd, max_dist, max_block)
    # The bridge's lineage contains both inputs — alias all three so
    # the row-level rejoins resolve unambiguously.
    out = (
        left.alias("_l")
        .join(bridge.alias("_b"), F.col(f"_l.{left_col}") == F.col("_b._lname"))
        .join(right.alias("_r"), F.col("_b._rname") == F.col(f"_r.{right_col}"))
    )
    taken = set(left.columns) | {"_match_name", "_dist"}
    return out.select(
        *[F.col(f"_l.{c}") for c in left.columns],
        F.col("_b._rname").alias("_match_name"),
        F.col("_b._dist").alias("_dist"),
        *[
            F.col(f"_r.{c}").alias(f"_r_{c}" if c in taken else c)
            for c in right.columns
        ],
    )
