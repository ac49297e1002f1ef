"""URL canonicalization and host-level corpus rollups — the link
between the dedup stack and the centrality/quality priors.

Web-corpus pipelines (C4, RefinedWeb, Common Crawl derivatives) dedup
and sample BY URL and BY HOST, but raw crawl URLs are noisy: scheme and
host case varies, ``www.``/``m.`` mirrors split one host into three,
default ports and trailing slashes split one resource into several, and
tracking query parameters (``utm_*``, click ids) make every fetch of
the same page a distinct string. Canonicalization collapses those
variants FIRST, so exact-URL dedup, host frequency caps, and host-level
quality/centrality datasheets count the real thing.

Everything here is a chain of ``regexp_replace``/``regexp_extract``
Column expressions — map-only, whole-stage codegen, no UDF, no shuffle
until the final bounded per-host aggregate — and each step is mirrored
1:1 in the DuckDB oracle (same regexes, ``\\1`` instead of ``$1``).

Canonical form produced (documented contract, deliberately simple —
swap in a full WHATWG parser behind the same column if ever needed):

- fragment removed;
- scheme and host lowercased (path/query case is preserved — it is
  significant on most servers);
- default ports ``:80`` (http) / ``:443`` (https) removed;
- ``www.`` / ``m.`` host prefix removed;
- tracking query parameters removed (``utm_*``, ``ref``, ``session``,
  ``fbclid``, ``gclid``), with separator cleanup so no dangling
  ``?``/``&`` survives;
- trailing slash removed (also before a surviving query string).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme + authority prefix of an absolute URL (everything before the
#: first /, ? or # after the ``://``).
_SCHEME_HOST = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"

#: query parameters that never identify content (trackers / session ids).
_TRACKING = r"([?&])(utm_[^&#=]*|ref|session|fbclid|gclid)=[^&#]*"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an absolute URL (see module docstring for the
    exact contract). Pure regexp Column arithmetic; every step mirrors
    one DuckDB ``regexp_replace`` in the oracle."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, r"#.*$", "")
    sh = F.lower(F.regexp_extract(u, _SCHEME_HOST, 0))
    rest = F.regexp_replace(u, _SCHEME_HOST, "")
    sh = F.regexp_replace(sh, r"^(http://.*):80$", "$1")
    sh = F.regexp_replace(sh, r"^(https://.*):443$", "$1")
    sh = F.regexp_replace(sh, r"^(https?://)(www\.|m\.)", "$1")
    rest = F.regexp_replace(rest, _TRACKING, "$1")
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"/\?", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(sh, rest)


def url_host(col: Column | str) -> Column:
    """Host of a CANONICAL url (run :func:`canonicalize_url` first —
    this does no case folding or mirror stripping of its own)."""
    u = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(u, r"://([^/?#:]*)", 1)


def host_datasheet(
    docs: DataFrame,
    url_col: str = "url",
    quality_col: str = "prob",
    ranks: DataFrame | None = None,
    node_col: str = "node",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-host corpus datasheet: document count, DISTINCT canonical
    URLs (the post-canonicalization dedup denominator), mean quality
    score, and — when a ``(node, rank)`` centrality table is supplied
    (:func:`graph.pagerank` over the host link graph) — the host's
    rank, the Common Crawl-style "host quality prior" join. Hosts with
    no rank row report 0.0 (sentinel, not NULL — the driver-surface
    rule).

    Determinism: ``quality_col`` is expected pre-rounded (6 dp, e.g.
    ``text.quality_classifier``'s prob); the mean is computed over
    1e-6 fixed-point integers so partial-aggregation fold order cannot
    drift the result between engines.

    Scale: canonicalization is map-only; one bounded partial-agg
    shuffle keyed by host (|hosts| rows — web-scale is ~1e7 hosts, a
    small aggregate); the rank join is a broadcast of the equally
    bounded rank table."""
    canon = canonicalize_url(F.col(url_col))
    per = docs.select(
        url_host(canon).alias("host"),
        canon.alias("_cu"),
        F.round(F.col(quality_col) * 1e6).cast("long").alias("_q"),
    )
    out = per.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("_cu").cast("long").alias("n_urls"),
        F.round(
            F.sum("_q") / (F.count(F.lit(1)) * F.lit(1e6)), 6
        ).alias("mean_quality"),
    )
    if ranks is not None:
        r = ranks.select(
            F.col(node_col).alias("host"),
            F.col(rank_col).alias("host_rank"),
        )
        out = out.join(F.broadcast(r), "host", "left").withColumn(
            "host_rank", F.coalesce(F.col("host_rank"), F.lit(0.0))
        )
    return out
