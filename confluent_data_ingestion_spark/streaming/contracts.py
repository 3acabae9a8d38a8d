"""Streaming data-contract monitoring: the batch quality gate
(operators/contracts) run per microbatch at O(batch) cost, with the
cumulative report provably equal to a one-shot scan of everything the
stream has delivered — the rollup-store quiescence property
(streaming/rollup.py) applied to contract verification.

Each microbatch contributes ONE 1-row mergeable counter partial
(operators/contracts.contract_counters), persisted under its batch id;
replays overwrite their own partial, so restarts are idempotent the
same way the upsert/rollup stores are.  ``snapshot()`` folds every
partial by the counter-prefix rules (sums add, extrema combine) and
renders the validate_contract report.

Scale: the per-batch cost is one aggregation over the batch (all scan
checks share it, map-side combined); state on disk is batches x 1 row.
Foreign-key checks are supported through ``refs`` but note the
per-batch anti-join cost and the 1-row-combine BNLJ it plans — the
scan-check-only monitor is the pure single-agg path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.contracts import (
    contract_counters,
    merge_all_counters,
    report_from_counters,
)


class ContractMonitor:
    """foreachBatch handler + snapshot reader for incremental contract
    verification.  ``apply(batch_df, batch_id)`` folds one delivery;
    ``snapshot(spark)`` returns the cumulative report."""

    def __init__(
        self,
        path: str,
        checks: list[dict],
        refs: dict[str, DataFrame] | None = None,
    ) -> None:
        if not checks:
            raise ValueError("ContractMonitor: empty check list")
        self.path = path
        self.checks = checks
        self.refs = refs
        self.last_batch_plan: str | None = None

    def apply(self, batch_df: DataFrame, batch_id) -> None:
        part = contract_counters(batch_df, self.checks, self.refs)
        # per-batch subdir + overwrite = idempotent under microbatch
        # replay (the marker-free little sibling of RollupStore commits:
        # a re-run batch rewrites ITS OWN partial, never double-counts)
        part.write.mode("overwrite").parquet(
            os.path.join(self.path, f"batch_id={int(batch_id)}")
        )
        try:  # capture must never fail the batch
            self.last_batch_plan = (
                part._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as ex:  # pragma: no cover
            self.last_batch_plan = f"<plan capture unavailable: {ex}>"

    def snapshot(self, spark: SparkSession) -> DataFrame:
        parts = spark.read.parquet(self.path).drop("batch_id")
        return report_from_counters(
            merge_all_counters(parts), self.checks
        )


class UniqueKeyMonitor:
    """Cross-batch ``unique`` verification — the ONE contract check
    :func:`~..operators.contracts.contract_counters` rejects, because
    distinctness does not decompose into mergeable counters: it needs a
    KEY INDEX.  That index is
    :func:`~..operators.dedup.build_dedup_index`'s digest frame (the
    32-byte md5 key set a production ingest persists next to the
    corpus): every microbatch upserts its own distinct-digest partial
    plus a 1-row non-null/total counter partial, each under its batch
    id with overwrite, so replays rewrite their own partials and never
    double-count — the same idempotence contract as ContractMonitor
    and the rollup store.

    ``snapshot()`` returns one report row per monitored column in the
    validate_contract schema: ``observed`` is the cumulative unique
    rate distinct/non-null (the duplicate rate is ``1 - observed``),
    ``status`` judges it against ``min_rate``.  distinct-of-union ==
    union-of-per-batch-distinct, so the quiescence snapshot equals a
    one-shot ``validate_contract`` unique check over everything the
    stream delivered, exactly.

    Scale: per batch, one distinct + one count over the BATCH only;
    state on disk is the digest set (bounded by distinct keys, 32
    bytes each — the corpus text never re-scans) plus batches x 1
    counter rows.  The snapshot's distinct fold shuffles digests only.
    """

    def __init__(
        self,
        path: str,
        columns: list[str],
        min_rate: float = 1.0,
    ) -> None:
        if not columns:
            raise ValueError("UniqueKeyMonitor: empty column list")
        self.path = path
        self.columns = list(columns)
        self.min_rate = float(min_rate)
        self.last_batch_plan: str | None = None

    def apply(self, batch_df: DataFrame, batch_id) -> None:
        from pyspark.sql import functions as F

        from ..operators.dedup import build_dedup_index

        # ONE keys write + ONE counters write per batch regardless of
        # how many columns the contract monitors: per-column digest
        # frames (build_dedup_index returns lazy frames, and persisting
        # only the digest set means the MinHash band plan never runs —
        # scalar keys need the exact-key index alone) union under an
        # integer column-index discriminator.  A streaming sink's fixed
        # cost is the write count, not the bytes.
        keys: DataFrame | None = None
        for ci, col in enumerate(self.columns):
            keyed = batch_df.select(
                F.col(col).cast("string").alias("__key__")
            ).filter(F.col("__key__").isNotNull())
            # the partial carries the column NAME next to its index:
            # a monitor re-instantiated over an existing path with a
            # different/reordered column list must fail loudly at
            # snapshot, not silently merge stale digests under the
            # wrong column
            digests = build_dedup_index(
                keyed, id_col="__key__", text_col="__key__"
            )["digests"].select(
                F.lit(ci).alias("ci"), F.lit(col).alias("col"), "d"
            )
            keys = digests if keys is None else keys.unionByName(digests)
        keys.write.mode("overwrite").parquet(
            os.path.join(self.path, "keys", f"batch_id={int(batch_id)}")
        )
        counters = batch_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("s_tot"),
            *[
                F.sum(F.col(col).isNotNull().cast("bigint"))
                .cast("bigint").alias(f"s_nn_{ci}")
                for ci, col in enumerate(self.columns)
            ],
        ).withColumn(
            "cols", F.array(*[F.lit(c) for c in self.columns])
        )
        counters.write.mode("overwrite").parquet(
            os.path.join(self.path, "counters", f"batch_id={int(batch_id)}")
        )
        try:  # capture must never fail the batch
            self.last_batch_plan = (
                keys._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as ex:  # pragma: no cover
            self.last_batch_plan = f"<plan capture unavailable: {ex}>"

    _REPORT_SCHEMA = (
        "check string, column string, observed double, "
        "threshold double, status string"
    )

    def _key_batch_ids(self) -> list[int]:
        """Batch ids present under ``keys/`` (negative ids are compacted
        pseudo-batches), from a directory listing — metadata only."""
        keys_dir = os.path.join(self.path, "keys")
        if not os.path.isdir(keys_dir):
            return []
        out = []
        for name in os.listdir(keys_dir):
            if name.startswith("batch_id="):
                try:
                    out.append(int(name.split("=", 1)[1]))
                except ValueError:
                    pass
        return sorted(out)

    def compact(
        self, spark: SparkSession, keep_last: int = 16
    ) -> dict[str, int]:
        """Fold the digest partials of every batch except the newest
        ``keep_last`` into ONE compacted pseudo-batch dir — the
        snapshot-read-fan-out fix for long streams: after B batches the
        ``keys/batch_id=N`` layout holds B small parquet dirs, and the
        snapshot's scan cost is dominated by per-dir open/list overhead
        (object-storage LIST + small-object GETs at scale) rather than
        digest bytes.  Compaction restores O(keep_last) dirs while the
        digest SET — the real state, bounded by distinct keys — is
        unchanged.

        Crash-safe by construction, riding the same distinct-of-union
        algebra as the snapshot: the compacted union is first written
        to a NEW pseudo-batch dir (``batch_id=<next negative id>``) —
        at that point every digest exists in BOTH the new dir and its
        sources, which cannot change any ``count_distinct`` — and only
        then are the folded source dirs (and prior compacted dirs)
        deleted.  A crash at any point leaves duplicates, never loss,
        and a re-run folds them away: idempotent.  Replay interplay is
        free for the same reason — a replayed batch that re-creates
        ``keys/batch_id=N`` after N was folded just duplicates digests
        the compacted dir already holds.

        The newest ``keep_last`` batches stay as-is so in-flight
        microbatch replays (which only ever target recent batch ids)
        rewrite their own partial without touching compacted state.
        Counter partials are NOT compacted: they merge by SUM, which
        double-counts under replay-after-fold; at 1 row x ~3 columns
        per batch they are list-overhead only, and snapshot reads them
        in one partitioned scan.

        Returns ``{"folded": n_dirs_folded, "kept": n_batch_dirs_kept}``.
        Serialize with apply()/snapshot() exactly as those are
        serialized with each other (foreachBatch already guarantees it
        for apply).
        """
        ids = self._key_batch_ids()
        live = [i for i in ids if i >= 0]
        prior_compact = [i for i in ids if i < 0]
        fold = live[:-keep_last] if keep_last > 0 else live
        if not fold and len(prior_compact) <= 1:
            return {"folded": 0, "kept": len(live)}
        src_ids = fold + prior_compact
        keys_dir = os.path.join(self.path, "keys")
        src = spark.read.option("basePath", keys_dir).parquet(
            *[os.path.join(keys_dir, f"batch_id={i}") for i in src_ids]
        )
        new_id = min(prior_compact, default=0) - 1
        # ONE distinct over the folded digests (ci, col, d) — the same
        # shuffle shape as the snapshot's count_distinct, sized by the
        # distinct-key state, then a single new dir
        # natural distinct-shuffle partitioning: ONE dir of
        # shuffle-partition-count files written in parallel (a
        # coalesce(1) would serialize the write through one task at
        # corpus scale); the fan-out win is dirs, not files-per-dir
        (
            src.select("ci", "col", "d").distinct()
            .write.mode("overwrite")
            .parquet(os.path.join(keys_dir, f"batch_id={new_id}"))
        )
        import shutil

        for i in src_ids:  # delete AFTER the union dir exists
            shutil.rmtree(
                os.path.join(keys_dir, f"batch_id={i}"), ignore_errors=True
            )
        return {"folded": len(src_ids), "kept": len(live) - len(fold)}

    def snapshot(self, spark: SparkSession) -> DataFrame:
        from pyspark.errors import AnalysisException
        from pyspark.sql import functions as F

        # the two state dirs are read under SEPARATE guards: apply()
        # writes keys first, counters second, so a crash between the
        # writes leaves keys without counters — that is torn state and
        # must fail loudly, not read as "no batches yet" (the silent
        # empty report would mask exactly the partial-write failure a
        # fail-loud contract monitor exists to surface)
        try:
            raw_keys = spark.read.parquet(os.path.join(self.path, "keys"))
        except AnalysisException:
            raw_keys = None
        try:
            cnt = spark.read.parquet(os.path.join(self.path, "counters"))
        except AnalysisException:
            cnt = None
        if raw_keys is None and cnt is None:
            # no completed batch yet: an empty report, not a read error
            return spark.createDataFrame([], self._REPORT_SCHEMA)
        if raw_keys is None or cnt is None:
            have = "keys" if cnt is None else "counters"
            miss = "counters" if cnt is None else "keys"
            raise ValueError(
                f"UniqueKeyMonitor: state at {self.path} has {have} "
                f"partials but no {miss} dir — a batch crashed between "
                "its two writes; replay the batch (its overwrite "
                "repairs both partials) or rebuild the monitor state"
            )
        # fail loudly if the on-disk partials were written by a monitor
        # with a different/reordered column list (the digest partials
        # are keyed by column INDEX; merging them under the wrong name
        # would corrupt the cumulative rate silently).  Validation rides
        # the ONE digest fold the snapshot already does — grouping by
        # (ci, col) instead of ci makes the column identity a free
        # byproduct of the count-distinct scan, and the grouped result
        # is metadata-sized (columns x at most a few stale names), so it
        # collects here and re-enters the plan as a literal frame.
        if "col" not in raw_keys.columns:
            raise ValueError(
                "UniqueKeyMonitor: keys partials at "
                f"{self.path} predate column-name tracking; rebuild the "
                "monitor state (cannot validate column identity)"
            )
        dk_rows = (
            raw_keys.groupBy("ci", "col")
            .agg(F.count_distinct("d").alias("__nd__"))
            .collect()
        )
        expected = {(ci, c) for ci, c in enumerate(self.columns)}
        seen = {(r["ci"], r["col"]) for r in dk_rows}
        if not seen <= expected:
            raise ValueError(
                "UniqueKeyMonitor: keys partials at "
                f"{self.path} were written for columns "
                f"{sorted(seen - expected)} but this monitor tracks "
                f"{list(enumerate(self.columns))}"
            )
        if "cols" not in cnt.columns or any(
            list(r["cols"]) != self.columns
            for r in cnt.select("cols").distinct().collect()
        ):
            raise ValueError(
                "UniqueKeyMonitor: counter partials at "
                f"{self.path} do not match this monitor's column list "
                f"{self.columns}"
            )
        dk = spark.createDataFrame(
            [(r["ci"], r["__nd__"]) for r in dk_rows],
            "ci int, __nd__ bigint",
        )
        nn = cnt.agg(
            *[
                F.sum(f"s_nn_{ci}").cast("bigint").alias(f"__nn_{ci}__")
                for ci in range(len(self.columns))
            ]
        ).select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(ci).alias("ci"),
                        F.col(f"__nn_{ci}__").alias("__nn__"),
                    )
                    for ci in range(len(self.columns))
                ])
            ).alias("__r__")
        ).select("__r__.*")
        name = F.element_at(
            F.array(*[F.lit(c) for c in self.columns]), F.col("ci") + 1
        )
        return (
            nn.join(F.broadcast(dk), "ci", "left")
            .select(
                F.lit("unique").alias("check"),
                name.alias("column"),
                (
                    F.floor(
                        (
                            F.coalesce(F.col("__nd__"), F.lit(0))
                            .cast("double")
                            / F.greatest(F.col("__nn__"), F.lit(1))
                        )
                        * F.lit(1000000.0)
                        + F.lit(0.5)
                    )
                    / F.lit(1000000.0)
                ).alias("observed"),
                F.lit(self.min_rate).cast("double").alias("threshold"),
            )
            .withColumn(
                "status",
                F.when(
                    F.col("observed") >= F.col("threshold"),
                    F.lit("pass"),
                ).otherwise(F.lit("fail")),
            )
        )
