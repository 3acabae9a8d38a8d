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
new versioned directory and commits with ONE atomic pointer write.

Crash protocol — stricter than ``UpsertSnapshot``/``Scd2Store``'s
marker-after-write, because additive count/sum partials are NOT
replay-idempotent (a latest-by-key store tolerates double-apply; a sum
does not).  The committing batch_id is recorded INSIDE the pointer file,
in the same single ``os.replace`` that flips the state pointer, so "new
state live" and "batch committed" become one indivisible fact:

 - crash before the flip  -> old pointer live, batch not committed,
   replay redoes the fold against the OLD state (new dir is an orphan,
   swept on the next apply);
 - crash after the flip   -> new state live AND ``committed(batch_id)``
   is already True via the pointer record, so the foreachBatch replay is
   a no-op — the batch can never be double-counted;
 - the old state directory is only removed after the commit record is
   durable (fsync + rename).

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

    # -- transaction markers ------------------------------------------------
    # The marker dir keeps the full history of committed batch ids; the
    # LATEST commit is additionally recorded inside the pointer file itself,
    # atomically with the state flip (see module docstring for why the
    # UpsertSnapshot marker-after-write protocol is not sound here).
    def _marker(self, batch_id) -> str:
        return os.path.join(self.path, "_markers", f"batch-{batch_id}")

    def committed(self, batch_id) -> bool:
        if os.path.exists(self._marker(batch_id)):
            return True
        _, last = self._read_pointer()
        return last is not None and last == str(batch_id)

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
            # Backfill the durable marker if the commit is only recorded in
            # the pointer (crash landed between the flip and the marker
            # write): the next commit overwrites the pointer's batch_id
            # slot, and without a marker the earlier batch would lose its
            # only commit record — a later replay could double-count it.
            if not os.path.exists(self._marker(batch_id)):
                with open(self._marker(batch_id), "w") as f:
                    f.write(str(batch_id))
            return False
        cur = self._current_dir()
        self._sweep_orphans(keep=cur)
        partials = self._partials(batch_df)
        if cur:
            state = batch_df.sparkSession.read.parquet(cur)
            partials = self._merge(state, partials)
        new_dir = os.path.join(self.path, f"v-{uuid.uuid4().hex[:12]}")
        partials.write.mode("overwrite").parquet(new_dir)
        # ATOMIC COMMIT: the new-state pointer and the committing batch_id
        # land in one os.replace.  A crash before this rename leaves the old
        # state live and the batch uncommitted (clean redo); a crash after it
        # leaves the new state live and the batch already committed (replay
        # no-op).  There is no window where the new partials are live but the
        # batch looks uncommitted — that window double-counts additive sums.
        ptr = os.path.join(self.path, "_current")
        tmp = ptr + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(new_dir + "\n" + ("" if batch_id is None else str(batch_id)))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, ptr)
        # past the commit point: the marker (commit history) and old-state
        # cleanup may crash without harm — committed() already answers True
        # via the pointer record, and orphan dirs are swept next apply.
        if batch_id is not None:
            with open(self._marker(batch_id), "w") as f:
                f.write(str(batch_id))
        if cur:
            shutil.rmtree(cur, ignore_errors=True)
        return True

    def _sweep_orphans(self, keep: str | None) -> None:
        """Remove v-* state dirs that lost the pointer race: a crash between
        state write and pointer flip leaves the new dir orphaned, and a
        crash after the flip may leave the OLD dir undeleted."""
        keep_name = os.path.basename(keep) if keep else None
        for name in os.listdir(self.path):
            if name.startswith("v-") and name != keep_name:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    def _read_pointer(self) -> tuple[str | None, str | None]:
        """(current state dir, batch_id recorded at the commit) — the second
        slot is None for pre-upgrade single-line pointer files."""
        ptr = os.path.join(self.path, "_current")
        if not os.path.exists(ptr):
            return None, None
        with open(ptr) as f:
            lines = f.read().splitlines()
        cur = lines[0].strip() if lines else ""
        last = lines[1].strip() if len(lines) > 1 else ""
        return (cur or None, last or None)

    def _current_dir(self) -> str | None:
        return self._read_pointer()[0]

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
