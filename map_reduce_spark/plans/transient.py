"""Transient-persist registry: scoped cleanup for plan-internal caches.

Several builders persist an intermediate frame that is consumed ONLY
within the single lazy plan they return (e.g. basket.py's basket
arrays feed the item counts, the pair stream, and the order total).
The persist is load-bearing — without it the diamond re-runs the
upstream subplan per arm — but the builder cannot unpersist it
itself: the cache must survive until the CALLER materializes the
plan. Across a 162-query bench session those caches would otherwise
accumulate until LRU eviction (ADVICE r7).

``transient_persist`` is the house spelling for that pattern: it
persists the frame AND enrolls it for release. Harness loops
(bench.py, tools/check_oracle.py) call ``release_transient()`` after
materializing each query, so every transient cache lives exactly one
query. Deliberately session-scoped caches (the retrieval index
builders' memoized frames, similarity.py's trained codebooks) do NOT
enroll — cross-query reuse is their point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def transient_persist(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` and enroll it for the next ``release_transient``."""
    df = df.persist(level)
    _LIVE.append(df)
    return df


def release_transient() -> int:
    """Unpersist (non-blocking) every enrolled frame; returns count."""
    n = len(_LIVE)
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    return n
