"""Stream-stream event-time joins — the Structured Streaming twin of
``operators.temporal.interval_join``.

Spark's native stream-stream join keeps both sides in keyed state and
uses the event-time range CONDITION plus the watermarks to bound how
long each row is retained (state eviction is derived from the interval:
a left row can stop waiting once the watermark passes
``left_time + upper``).  This is the Flink interval-join semantics the
reference's pipelines assume (state-TTL'd two-stream correlation) in
idiomatic Spark — no custom state management.

Batch/streaming parity: at quiescence the streaming result equals the
batch ``interval_join`` on the same inputs (same half-open bound
``left_time + lower < right_time <= left_time + upper``), asserted by
the differential test in tests/test_streaming_scd2.py.

Scale shape: one shuffle per side on the join key; state per key is the
rows inside the (upper - lower) window, evicted by watermark — memory is
O(in-flight window), not stream length.  Late rows beyond the watermark
drop (the streaming trade the batch twin does not make).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    lower_seconds: float,
    upper_seconds: float,
    watermark: str = "1 hour",
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames on key equality plus the event-time
    interval ``left_time + lower < right_time <= left_time + upper``.
    Right-side columns come back ``suffix``-renamed (the batch twin's
    convention).  Both sides get ``watermark`` as their event-time bound;
    pick it >= the max tolerated lateness — it also caps state size.

    ``how``: ``inner`` (matches emit as they arrive), ``left_outer``,
    ``right_outer``, or ``full_outer`` — Flink's outer interval-join
    semantics: an unmatched LEFT row emits with NULL right columns,
    but only once the GLOBAL watermark passes ``left_time + upper``
    (before that a match could still arrive, so the engine MUST hold
    the row; this is watermark-gated null emission, not a per-batch
    outer join).  An unmatched RIGHT row's deadline is
    ``right_time - lower``: the newest left row that could still
    match it carries ``left_time < right_time - lower``, so once the
    watermark passes that point no on-time match can arrive and the
    row emits with NULL left columns.  ``full_outer`` applies both
    rules at once.  The global watermark is the MIN over both streams
    and advances only with event time — so a held row flushes when
    LATER DATA on both sides pushes event time past its deadline, and
    rows whose deadline the final watermark never passed stay HELD in
    state at quiescence (held, not lost: a restart with newer data
    still emits them).  Pinned in tests/test_streaming_scd2.py with
    watermark-advancing trailing events; up to the rows still inside
    the watermark horizon, the emitted set equals the batch outer
    interval join."""
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(
            f"how must be inner/left_outer/right_outer/full_outer, "
            f"got {how!r}"
        )
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark).select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns]
    )
    rt = f"{right_time}{suffix}"
    cond = (
        (lw[left_on] == rw[f"{right_on}{suffix}"])
        & (F.col(rt) > F.expr(
            f"{left_time} + INTERVAL {lower_seconds} SECONDS"))
        & (F.col(rt) <= F.expr(
            f"{left_time} + INTERVAL {upper_seconds} SECONDS"))
    )
    return lw.join(rw, cond, how)
