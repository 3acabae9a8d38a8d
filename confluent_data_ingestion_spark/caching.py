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


def release_checkpoint(frame: DataFrame) -> None:
    """Free a localCheckpointed DataFrame's RDD blocks (best-effort).

    ``localCheckpoint`` pins its data as persisted RDD blocks that
    ``DataFrame.unpersist`` does NOT release (that path only drops
    cache-manager entries for ``persist()``-ed plans); the blocks stay
    reachable through the checkpointed plan's ``LogicalRDD`` and are
    freed there.  Shared-artifact caches (BM25 index, PQ index, simhash
    pairs/labels, skip-scan stats) call this on the entry they evict —
    without it a session alternating sf_dirs leaks block-manager memory
    on every switch.  No-op when ``frame`` was never checkpointed.
    """
    try:
        frame._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # not a LogicalRDD-backed frame — nothing held
