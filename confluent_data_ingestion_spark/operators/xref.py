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
    delete_mode: str = "exclude",
    salt_partitions: int = 0,
) -> DataFrame:
    """One row per key: the latest by ``order_by`` (DESC, NULLS LAST).

    ``order_by`` columns are ranked descending in the given order (e.g.
    ``[event_ts, op_seq]`` -> event_ts DESC, op_seq DESC with op_seq breaking
    ties).  Soft-delete handling (reference spec columns 13-17):

    - ``delete_mode="exclude"`` — flagged rows are dropped BEFORE ranking
      (the reference's documented materialization pattern): a delete event
      resurfaces the previous non-deleted version of the key.
    - ``delete_mode="tombstone"`` — rank first, then drop keys whose LATEST
      record is flagged: a delete event retracts the key entirely (Kafka
      changelog-compaction semantics; what an upsert sink with DELETE ops
      does).
    """
    is_deleted = None
    if delete_flag_field:
        flag = F.lower(F.trim(F.col(delete_flag_field).cast("string")))
        is_deleted = flag.isNotNull() & flag.isin(*[v.lower() for v in delete_flag_values])
        if delete_mode == "exclude":
            df = df.filter(~F.coalesce(is_deleted, F.lit(False)))
            is_deleted = None
        elif delete_mode != "tombstone":
            raise ValueError(f"unknown delete_mode {delete_mode!r}")

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
    latest = (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    if is_deleted is not None:
        latest = latest.filter(~F.coalesce(is_deleted, F.lit(False)))
    return latest
