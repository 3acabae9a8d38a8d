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
