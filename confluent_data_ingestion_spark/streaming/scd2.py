"""Streaming SCD2 materialization: the validity-interval twin of the
upsert store (reference ``changelog.mode = upsert``,
``resources/sql/xref-queries.sql:13-23`` — extended from "current row
per key" to full history, the same way ``operators/evolve.py`` extends
``latest_by_key``).

Two backends, same foreachBatch contract as ``UpsertSnapshot``:

 - ``mode="log"`` — append each microbatch's EVENTS to a parquet
   changelog behind a per-batch transaction marker (exactly-once-effect
   under foreachBatch retries); ``history()`` derives the SCD2 table by
   running ``scd2_from_changelog`` over the log.  Write cost O(batch),
   no state; the history scan is one key-shuffle over the log —
   ``compact()`` (rewrite the log as version-start events) bounds it to
   the version count.
 - ``mode="materialized"`` — keep the history itself on disk and update
   it with ``scd2_apply_batch`` per microbatch (cost proportional to the
   batch's keys, not the table); each batch writes a NEW versioned
   directory and flips a pointer file, so replays of a committed batch
   are skipped and a crash mid-write leaves the previous version intact
   (the parquet-dir stand-in for a Delta MERGE transaction).

Batch/streaming parity: at quiescence ``history()`` equals
``scd2_from_changelog`` over all events, for either backend — asserted
by the differential tests in ``tests/test_streaming_scd2.py``.

Contract (both modes): per-key append-only event time, the
``scd2_apply_batch`` contract.  Out-of-order WITHIN a microbatch is
fine (the rebuild sorts); an event older than its key's last change
point must be routed to a rebuild instead.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.evolve import scd2_apply_batch, scd2_from_changelog


class Scd2Store:
    def __init__(
        self,
        path: str,
        keys: list[str],
        ts_col: str,
        tracked: list[str],
        *,
        mode: str = "log",
    ) -> None:
        if mode not in ("log", "materialized"):
            raise ValueError(f"unknown mode {mode!r}")
        self.path = path
        self.keys = keys
        self.ts_col = ts_col
        self.tracked = tracked
        self.mode = mode
        os.makedirs(os.path.join(path, "_markers"), exist_ok=True)

    # -- transaction markers (identical protocol to UpsertSnapshot) --------
    def _marker(self, batch_id) -> str:
        return os.path.join(self.path, "_markers", f"batch-{batch_id}")

    def committed(self, batch_id) -> bool:
        return os.path.exists(self._marker(batch_id))

    # -- write path ---------------------------------------------------------
    def apply(self, batch_df: DataFrame, batch_id=None) -> bool:
        """Apply one microbatch; returns False if ``batch_id`` was already
        committed (replay -> no-op)."""
        if batch_id is not None and self.committed(batch_id):
            return False
        cols = [*self.keys, self.ts_col, *self.tracked]
        events = batch_df.select(*cols)
        if self.mode == "log":
            events.write.mode("append").parquet(
                os.path.join(self.path, "log")
            )
        else:
            self._apply_materialized(events)
        if batch_id is not None:
            with open(self._marker(batch_id), "w") as f:
                f.write(str(uuid.uuid4()))
        return True

    def _version_dirs(self) -> list[str]:
        ptr = os.path.join(self.path, "_current")
        if not os.path.exists(ptr):
            return []
        with open(ptr) as f:
            return [f.read().strip()]

    def _apply_materialized(self, events: DataFrame) -> None:
        spark = events.sparkSession
        cur = self._version_dirs()
        new_dir = os.path.join(self.path, f"v-{uuid.uuid4().hex[:12]}")
        if not cur:
            hist = scd2_from_changelog(
                events, self.keys, self.ts_col, self.tracked
            )
        else:
            hist = scd2_apply_batch(
                spark.read.parquet(cur[0]), events,
                self.keys, self.ts_col, self.tracked,
            )
        hist.write.mode("overwrite").parquet(new_dir)
        # flip the pointer last: a crash before this line leaves the old
        # version live and the marker unwritten -> the retry redoes cleanly
        with open(os.path.join(self.path, "_current"), "w") as f:
            f.write(new_dir)
        for d in cur:
            shutil.rmtree(d, ignore_errors=True)

    # -- read path ----------------------------------------------------------
    def history(self, spark: SparkSession) -> DataFrame:
        if self.mode == "log":
            # mergeSchema: columns added by later appends survive (rows
            # predating a column read NULL) — same additive-evolution
            # contract as UpsertSnapshot.log()
            log = spark.read.option("mergeSchema", "true").parquet(
                os.path.join(self.path, "log")
            )
            return scd2_from_changelog(
                log, self.keys, self.ts_col, self.tracked
            )
        cur = self._version_dirs()
        if not cur:
            raise FileNotFoundError("no committed history yet")
        return spark.read.parquet(cur[0])

    def current(self, spark: SparkSession) -> DataFrame:
        """The latest-per-key view — what ``UpsertSnapshot.snapshot()``
        materializes; here it is just the is_current slice."""
        return self.history(spark).filter(F.col("is_current"))

    def compact(self, spark: SparkSession) -> None:
        """log mode: rewrite the event log as version-start events (the
        lossless compression ``scd2_apply_batch`` relies on), bounding
        the history scan by the version count instead of event count."""
        if self.mode != "log":
            return
        hist = self.history(spark)
        starts = hist.select(
            *self.keys,
            F.col("effective_from").alias(self.ts_col),
            *self.tracked,
        )
        tmp = os.path.join(self.path, f"log-compact-{uuid.uuid4().hex[:8]}")
        starts.write.mode("overwrite").parquet(tmp)
        live = os.path.join(self.path, "log")
        shutil.rmtree(live)
        os.rename(tmp, live)

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch(...)``."""

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.apply(batch_df, batch_id)

        return fn
