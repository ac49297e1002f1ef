"""Corpus-level boilerplate line removal (C4-style).

The C4 pipeline (Raffel et al. 2020, §2.2) drops any line that occurs
three or more times in the corpus — navigation bars, cookie banners,
license footers — because cross-document repeated lines are boilerplate,
not content. This operator generalizes that: compute each distinct
(trimmed) line's document frequency, then rebuild every document keeping
only lines under the threshold.

Scale design (100 TB corpus):
- one shuffle to count line document-frequencies — (line_hash) keys with
  map-side partial aggregation; the distinct-line table is vocabulary-
  sized, orders of magnitude smaller than the corpus;
- the boilerplate set (lines OVER the threshold) is smaller still —
  broadcast, so the removal probe is a map-only anti join;
- document reassembly groups the surviving (id, pos, line) rows — the
  one unavoidable shuffle, on narrow rows, combined map-side by
  collect_list's partial aggregation.

Reference scope note: the reference engine has no text data plane
(SURVEY §2.7); this is part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_doc_frequencies(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(line, df) — each distinct trimmed non-empty line with the number
    of distinct documents it appears in."""
    lines = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), sep)).alias("raw"),
    ).select(F.col(id_col), F.trim("raw").alias("line"))
    return (
        lines.filter(F.length("line") > 0)
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Rebuild each document without lines occurring in more than
    ``max_df`` distinct documents (and without blank lines).

    Returns (id_col, cleaned) for EVERY input document — a document whose
    lines were all boilerplate comes back with ``cleaned = ''``, so row
    counts are stable through the pass.
    """
    boiler = F.broadcast(
        line_doc_frequencies(docs, id_col, text_col, sep)
        .filter(F.col("df") > max_df)
        .select("line")
    )
    positioned = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "raw"),
    ).select(F.col(id_col), "pos", F.trim("raw").alias("line"))
    kept = positioned.filter(F.length("line") > 0).join(
        boiler, "line", "left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias("cleaned")
    )
    return docs.select(id_col).join(rebuilt, id_col, "left").select(
        F.col(id_col), F.coalesce("cleaned", F.lit("")).alias("cleaned")
    )
