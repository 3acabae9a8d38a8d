"""Cache lifecycle for operators that persist shared plan subtrees.

Operators like ``minhash_lsh_pairs(persist_signatures=True)`` persist a
subtree that feeds several branches of one query plan.  Spark gives no hook
for "unpersist after the next action", so the operator can't release its own
cache — a bare ``persist()`` would leak MEMORY_AND_DISK blocks into every
later query of the session (observed pressuring subsequent bench queries).

This registry is the seam: operators ``track()`` what they persist, and the
runtime (bench loop, query registry, or any caller) calls
``release_caches()`` once the consuming action has finished.  Releasing
early is safe — unpersisting a DataFrame that never materialized merely
skips the caching, it never changes results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and register it for release."""
    df.persist()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame; returns how many were released."""
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist()
        n += 1
    return n
