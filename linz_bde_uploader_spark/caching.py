"""Tracked persistence for operator-internal intermediates.

Several candidate-pair generators persist an expensive intermediate (e.g.
the banded signature projection) because the self-join that follows would
otherwise recompute it for both sides. The *result* DataFrame is returned
lazily, so the function itself cannot unpersist — the cache must survive
until the caller materializes the result.

This module makes that lifetime explicit instead of leaking it:

- ``track(df)`` persists a DataFrame and registers it;
- ``release_intermediates()`` unpersists everything registered — call it
  after materializing the results (a harness run, a bench query, a test);
- ``tracked_count()`` reports the number of live tracked caches.

Unpersisting is always *safe* (Spark recomputes from lineage on the next
action); the registry only controls when storage is reclaimed. In a
long-lived cluster session, call ``release_intermediates()`` between
jobs — or checkpoint/write the intermediate to storage instead, which is
the recommended shape at 100 TB (see the generators' docstrings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    df = df.persist()
    _LIVE.append(df)
    return df


def release_intermediates() -> int:
    """Unpersist every tracked intermediate; returns how many were live."""
    n = len(_LIVE)
    while _LIVE:
        _LIVE.pop().unpersist()
    return n


def tracked_count() -> int:
    return len(_LIVE)


#: memoized Column EXPRESSION trees keyed by a caller-chosen tuple
#: (r15 optimization, guide §5 — keep the driver out of repeated
#: per-query work). Building a higher-order-function expression costs
#: tens to hundreds of ms of py4j round trips per call; when the
#: expression references only FIXED column names it is input-
#: independent, and Catalyst trees are immutable, so one unresolved
#: tree is safe to embed in any number of plans (the module-constant-
#: Column pattern). This memoizes PLAN ARTIFACTS, never data — the
#: same class of thing as the workload loader's schema memo.
#:
#: Lifecycle: the trees are py4j handles into ONE JVM/gateway, so the
#: memo is valid only for the SparkContext it was built under.
#: ``memo_column`` checks the active context by identity on every call
#: (one attribute read, no py4j) and clears the memo when the context
#: changed — a stop/start session rebuilds its trees instead of
#: failing opaquely on stale JVM references.
_COLUMN_EXPRS: dict[tuple, object] = {}
_MEMO_CTX: object = None


def memo_column(key: tuple, builder):
    """Return the memoized Column for ``key``, building it once per
    active SparkContext."""
    global _MEMO_CTX
    from pyspark import SparkContext

    ctx = SparkContext._active_spark_context
    if ctx is not _MEMO_CTX:
        _COLUMN_EXPRS.clear()
        _MEMO_CTX = ctx
    col = _COLUMN_EXPRS.get(key)
    if col is None:
        col = builder()
        _COLUMN_EXPRS[key] = col
    return col
