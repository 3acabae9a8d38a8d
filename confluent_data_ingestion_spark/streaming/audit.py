"""Executed-plan capture for streaming registry rows.

Batch rows are plan-audited by compiling the returned DataFrame
(tools/plan_audit.py); a streaming row EXECUTES its query inside the
function, so the interesting plan — the microbatch the engine actually
ran, with its stateful operators, stream-stream joins, and exchanges —
is gone by the time the function returns the quiescence read-back.
This module is the seam that keeps it: each streaming query function
records the LAST executed microbatch's physical plan here after
``awaitTermination``; ``tools/plan_audit.py`` and
``tests/test_plan_guards.py`` read the registry instead of skipping
the rows.

Two capture paths:

  record_stream_plan    for sink-writing streams (parquet sink): the
                        finished StreamingQuery's ``explainInternal``
                        renders the last executed microbatch plan —
                        the real executed plan, stateful operators and
                        all.
  record_runner_plans   for foreachBatch statement sets: the sink-side
                        work happens on per-stage DataFrames inside
                        ``StatementSetRunner._process_batch``; the
                        runner keeps each stage's plan from the final
                        microbatch and they are joined here, one
                        section per stage table.
"""

from __future__ import annotations

STREAMING_PLANS: dict[str, str] = {}


def record_stream_plan(name: str, query) -> None:
    """Store the last executed microbatch plan of a finished
    StreamingQuery under the registry row's name."""
    try:
        STREAMING_PLANS[name] = query._jsq.explainInternal(False)
    except Exception as ex:  # pragma: no cover - capture must never fail a run
        STREAMING_PLANS[name] = f"<plan capture unavailable: {ex}>"


def record_runner_plans(name: str, runner) -> None:
    """Store a StatementSetRunner's per-stage plans from its last
    microbatch (foreachBatch side), one labelled section per stage."""
    parts = [
        f"== foreachBatch stage: {table} ==\n{plan}"
        for table, plan in sorted(runner.last_batch_plans.items())
    ]
    STREAMING_PLANS[name] = "\n".join(parts) if parts else (
        "<no microbatch ran>"
    )
