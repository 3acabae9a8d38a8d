"""Incrementally-maintained aggregate materialization (a rollup /
materialized-view store for foreachBatch).

The 100 TB failure mode this removes: a dashboard aggregate recomputed
from raw data scans the whole table every refresh.  Every aggregate this
store supports decomposes into MERGEABLE per-group partials —

 - count            -> summable
 - sum              -> summable (accumulated in DECIMAL for exactness)
 - min / max        -> idempotent re-min / re-max
 - distinct         -> DataSketches HLL sketch, unioned
                       (``operators/sketch.hll_merge_estimate`` contract)

so ``apply(batch)`` aggregates ONLY the new batch (cost O(batch)), merges
the batch partials with the stored per-group state (cost O(state groups +
batch groups), no raw-history rescan ever), writes the merged state to a
new versioned directory and flips a pointer — the same
marker/pointer-flip crash protocol as ``Scd2Store``: replays of a
committed batch are no-ops, and a crash mid-write leaves the previous
state live.

``snapshot()`` finalizes: counts/sums/mins/maxs read straight from
state, HLL sketches collapse through ``hll_sketch_estimate``.
Differential tests pin ``snapshot()`` == one-shot aggregation of the
full concatenated input at every quiescence point.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RollupStore:
    def __init__(
        self,
        path: str,
        group_cols: list[str],
        *,
        sum_cols: list[str] | None = None,
        min_cols: list[str] | None = None,
        max_cols: list[str] | None = None,
        distinct_cols: list[str] | None = None,
        lgk: int = 12,
    ) -> None:
        self.path = path
        self.group_cols = group_cols
        self.sum_cols = sum_cols or []
        self.min_cols = min_cols or []
        self.max_cols = max_cols or []
        self.distinct_cols = distinct_cols or []
        self.lgk = lgk
        os.makedirs(os.path.join(path, "_markers"), exist_ok=True)

    # -- transaction markers (identical protocol to UpsertSnapshot) --------
    def _marker(self, batch_id) -> str:
        return os.path.join(self.path, "_markers", f"batch-{batch_id}")

    def committed(self, batch_id) -> bool:
        return os.path.exists(self._marker(batch_id))

    # -- partial-aggregate schema -------------------------------------------
    def _partials(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("__cnt")]
        for c in self.sum_cols:
            aggs.append(
                F.sum(F.col(c).cast("decimal(28,6)")).alias(f"sum_{c}")
            )
        for c in self.min_cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
        for c in self.max_cols:
            aggs.append(F.max(c).alias(f"max_{c}"))
        for c in self.distinct_cols:
            aggs.append(
                F.hll_sketch_agg(F.col(c), F.lit(self.lgk)).alias(f"hll_{c}")
            )
        return df.groupBy(*self.group_cols).agg(*aggs)

    def _merge(self, state: DataFrame, batch: DataFrame) -> DataFrame:
        both = state.unionByName(batch)
        aggs = [F.sum("__cnt").alias("__cnt")]
        for c in self.sum_cols:
            aggs.append(F.sum(f"sum_{c}").alias(f"sum_{c}"))
        for c in self.min_cols:
            aggs.append(F.min(f"min_{c}").alias(f"min_{c}"))
        for c in self.max_cols:
            aggs.append(F.max(f"max_{c}").alias(f"max_{c}"))
        for c in self.distinct_cols:
            aggs.append(
                F.hll_union_agg(F.col(f"hll_{c}"), F.lit(True)).alias(f"hll_{c}")
            )
        return both.groupBy(*self.group_cols).agg(*aggs)

    # -- write path -----------------------------------------------------------
    def apply(self, batch_df: DataFrame, batch_id=None) -> bool:
        """Fold one microbatch into the state; False if ``batch_id`` was
        already committed (replay -> no-op)."""
        if batch_id is not None and self.committed(batch_id):
            return False
        partials = self._partials(batch_df)
        cur = self._current_dir()
        if cur:
            state = batch_df.sparkSession.read.parquet(cur)
            partials = self._merge(state, partials)
        new_dir = os.path.join(self.path, f"v-{uuid.uuid4().hex[:12]}")
        partials.write.mode("overwrite").parquet(new_dir)
        # pointer flips last: crash before this line leaves the previous
        # state live and the marker unwritten -> clean redo on retry
        with open(os.path.join(self.path, "_current"), "w") as f:
            f.write(new_dir)
        if cur:
            shutil.rmtree(cur, ignore_errors=True)
        if batch_id is not None:
            with open(self._marker(batch_id), "w") as f:
                f.write("1")
        return True

    def _current_dir(self) -> str | None:
        ptr = os.path.join(self.path, "_current")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return f.read().strip()

    # -- read path ------------------------------------------------------------
    def snapshot(self, spark: SparkSession) -> DataFrame:
        """Finalized per-group aggregates from the materialized state —
        no raw history is read.  Sums surface as DOUBLE (from the exact
        DECIMAL partials), distincts as HLL estimates."""
        cur = self._current_dir()
        if not cur:
            raise FileNotFoundError("no committed rollup state yet")
        state = spark.read.parquet(cur)
        cols = [*self.group_cols, F.col("__cnt").alias("n_rows")]
        for c in self.sum_cols:
            cols.append(F.col(f"sum_{c}").cast("double").alias(f"sum_{c}"))
        for c in self.min_cols:
            cols.append(F.col(f"min_{c}"))
        for c in self.max_cols:
            cols.append(F.col(f"max_{c}"))
        for c in self.distinct_cols:
            cols.append(
                F.hll_sketch_estimate(F.col(f"hll_{c}")).alias(
                    f"n_distinct_{c}"
                )
            )
        return state.select(*cols)
