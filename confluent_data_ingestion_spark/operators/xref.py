"""XREF snapshot: latest-record-per-business-key dedup (reference A1/A2).

Reference semantics (``resources/architecture/sttm-requirements.md:106-134``):
ROW_NUMBER() OVER (PARTITION BY pk ORDER BY event_ts DESC, seq DESC), keep
rn=1, optionally excluding soft-deleted records before ranking.  The
materialized table has upsert changelog semantics — one current row per key
at quiescence, idempotent under replay.

Scale notes:
 - The window dedup is one hash-partitioned shuffle on the business key —
   exactly the minimum data movement the semantics require.  With AQE on,
   skewed keys are split automatically; for pathological hot keys use
   ``salt_partitions`` which pre-aggregates per (key, salt) then re-ranks per
   key, turning one giant partition into ``salt`` bounded ones (classic
   two-level top-1; correct because max-by composes).
 - No driver-side collection; state per key is O(1) (top-1), so this holds at
   100 TB as long as keys hash-balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    *,
    delete_flag_field: str | None = None,
    delete_flag_values: tuple[str, ...] = ("true", "1"),
    salt_partitions: int = 0,
) -> DataFrame:
    """One row per key: the latest by ``order_by`` (DESC, NULLS LAST).

    ``order_by`` columns are ranked descending in the given order (e.g.
    ``[event_ts, op_seq]`` -> event_ts DESC, op_seq DESC with op_seq breaking
    ties).  Soft-deleted rows are excluded BEFORE ranking when
    ``delete_flag_field`` is set (reference spec columns 13-17).
    """
    if delete_flag_field:
        flag = F.lower(F.trim(F.col(delete_flag_field).cast("string")))
        df = df.filter(flag.isNull() | ~flag.isin(*[v.lower() for v in delete_flag_values]))

    order_cols = [F.col(c).desc_nulls_last() for c in order_by]

    if salt_partitions and salt_partitions > 1:
        # Two-level latest: local top-1 per (key, salt) shard, then global
        # top-1 per key over the (at most ``salt_partitions``) survivors.
        salted = df.withColumn(
            "__salt__", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_partitions))
        )
        w_local = Window.partitionBy(*keys, "__salt__").orderBy(*order_cols)
        local = (
            salted.withColumn("__rn__", F.row_number().over(w_local))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__", "__salt__")
        )
        df = local

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
