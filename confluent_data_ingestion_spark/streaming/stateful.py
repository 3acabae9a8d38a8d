"""Custom stateful streaming operator: per-key session aggregation with
``applyInPandasWithState``.

The built-in ``session_window`` aggregation (operators/temporal.py) covers
the declarative case.  This operator is the IMPERATIVE path Spark reserves
for semantics the built-ins can't express — here, emit-on-close session
records whose state (the open session) survives across microbatches, the
Structured Streaming equivalent of a Flink KeyedProcessFunction.

Scale design: state per key is ONE fixed-width row (4 numbers), not the
event history — memory is O(live keys) regardless of stream length.  Rows
arrive grouped and Arrow-batched per key (one shuffle on the key, the same
partitioning the stateful store needs, so no extra exchange).  Per batch,
each key's work is a single sorted pass over that batch's rows.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "key bigint, session_start timestamp, session_end timestamp, "
    "n_events int, sum_value double"
)
# open-session state: all times as epoch micros (fixed-width, no tz traps)
STATE_SCHEMA = "start bigint, last bigint, n int, s double"


def stateful_sessionize(
    stream: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    value_col: str = "value",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Emit one row per CLOSED session (a gap > ``gap_seconds`` closed it);
    the open session per key rides in the state store until a later batch
    closes it.  ``session_end`` is the last event time (not +gap — the
    record reports observed activity).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds * 1_000_000)

    def fn(key, pdf_iter, state: GroupState) -> Iterator:
        import pandas as pd

        frames = [p[[time_col, value_col]] for p in pdf_iter]
        # null/NaT event times carry no session position — drop before
        # the int64 cast turns NaT into -2^63 garbage
        rows = pd.concat(frames).dropna(subset=[time_col]).sort_values(time_col)
        # pin the unit before the int cast: pandas 2.x can deliver
        # non-ns datetime64 resolutions, which would silently scale ts
        ts = rows[time_col].astype("datetime64[ns]").astype("int64") // 1000
        vals = rows[value_col].astype("float64")

        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0

        closed = []
        for t, v in zip(ts.tolist(), vals.tolist()):
            if last is None:
                start, last, n, s = t, t, 1, v
            elif t > last:
                if t - last > gap_us:
                    closed.append((key[0], start, last, n, s))
                    start, last, n, s = t, t, 1, v
                else:
                    last, n, s = t, n + 1, s + v
            elif t >= start - gap_us:
                # late row from a previous batch that still belongs to (or
                # extends the front of) the open session
                start, n, s = min(start, t), n + 1, s + v
            else:
                # very-late data entirely before the open session: emit as
                # its own record rather than corrupting the open session
                closed.append((key[0], t, t, 1, v))
        state.update((start, last, n, s))

        if closed:
            yield pd.DataFrame(
                {
                    "key": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[2] for c in closed], unit="us"
                    ),
                    "n_events": [c[3] for c in closed],
                    "sum_value": [c[4] for c in closed],
                }
            )

    return (
        stream.selectExpr(
            f"CAST({key_col} AS BIGINT) AS key",
            f"{time_col} AS {time_col}",
            f"{value_col} AS {value_col}",
        )
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_OUTPUT_SCHEMA = (
    "user_id bigint, stage int, step_name string, ts timestamp"
)
# funnel progress: deepest stage reached + that stage's event time (micros)
FUNNEL_STATE_SCHEMA = "stage int, last bigint"


def stateful_funnel(
    stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming ordered-funnel tracker: per-user progress through
    ``steps`` maintained in the state store across microbatches — the
    live-conversion view whose batch equivalent is
    ``operators.temporal.funnel_stages``.

    Emits one row per ADVANCE: when a user first reaches stage k (their
    earliest qualifying occurrence of ``steps[k-1]`` strictly after the
    time they reached stage k-1), the row (user, k, step name, event
    time) appends.  A user completing all steps across five microbatches
    emits len(steps) rows total, each in the batch where the advance
    happened.

    Semantics note vs the batch operator: within a batch, rows process
    in time order (identical greedy matching); an event arriving in a
    LATER batch than a same-step event it precedes in event time cannot
    retroactively lower the recorded advance time — the standard
    at-arrival streaming approximation, bounded by the source's
    out-of-orderness across batches.

    Scale design: state per user is TWO fixed-width numbers regardless
    of stream length or funnel depth; rows arrive grouped per key by the
    state store's own shuffle (no extra exchange); per batch each key
    does one sorted pass over its batch rows.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    step_index = {s: k for k, s in enumerate(steps)}
    n_steps = len(steps)

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        frames = [p[[time_col, type_col]] for p in pdf_iter]
        # drop null/NaT event times BEFORE the int64 conversion (NaT
        # would become -2^63 garbage and could advance stage 0), matching
        # the batch funnel's null semantics where min/join drops them
        rows = pd.concat(frames).dropna(subset=[time_col]).sort_values(time_col)
        # unit pinned as in stateful_sessionize above
        ts = rows[time_col].astype("datetime64[ns]").astype("int64") // 1000
        types = rows[type_col]

        if state.exists:
            stage, last = state.get
        else:
            stage, last = 0, None

        out = []
        for t, typ in zip(ts.tolist(), types.tolist()):
            if stage >= n_steps:
                break
            if step_index.get(typ) != stage:
                continue
            # stage 0 needs no predecessor; deeper stages need strictly-
            # later arrival than the time the previous stage was reached
            if stage == 0 or (last is not None and t > last):
                stage += 1
                last = t
                out.append((key[0], stage, steps[stage - 1], t))
        state.update((stage, last))

        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "stage": [o[1] for o in out],
                    "step_name": [o[2] for o in out],
                    "ts": pd.to_datetime([o[3] for o in out], unit="us"),
                }
            )

    return (
        stream.selectExpr(
            f"CAST({user_col} AS BIGINT) AS user_id",
            f"{time_col} AS {time_col}",
            f"{type_col} AS {type_col}",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            FUNNEL_OUTPUT_SCHEMA,
            FUNNEL_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


ANOMALY_OUTPUT_SCHEMA = (
    "key bigint, event_ts timestamp, value double, zscore double"
)
# running moments per key: fixed-width, O(1) regardless of stream length
ANOMALY_STATE_SCHEMA = "n bigint, s double, s2 double"


def stateful_anomaly(
    stream: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    value_col: str = "value",
    threshold: float = 2.0,
    min_count: int = 5,
) -> DataFrame:
    """Online per-key z-score anomaly detection — the streaming twin of
    ``operators.temporal.anomaly_zscore``.  Each event is judged against
    the key's running moments over all PRIOR events (the online
    definition: an alerting detector cannot see the future), then folded
    into the state; ``min_count`` suppresses flags until the baseline has
    enough history.  State is three numbers per key — O(live keys)
    memory forever.

    Emits flagged events only: (key, event_ts, value, zscore), zscore
    rounded to 6.  Within a batch rows process in (ts, value) order so
    replays are deterministic.  Unlike the batch operator (population
    stats over ALL events — the retrospective audit), the online prefix
    definition is order-dependent by nature; the differential test pins
    it against an independent single-threaded reference.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        import math

        import pandas as pd

        frames = [p[[time_col, value_col]] for p in pdf_iter]
        rows = (
            pd.concat(frames)
            .dropna(subset=[time_col, value_col])
            .sort_values([time_col, value_col], kind="mergesort")
        )
        n, s, s2 = state.get if state.exists else (0, 0.0, 0.0)
        out = []
        for ts, v in zip(rows[time_col], rows[value_col]):
            v = float(v)
            if n >= min_count:
                mean = s / n
                var = s2 / n - mean * mean
                if var > 0:
                    z = round((v - mean) / math.sqrt(var), 6)
                    if abs(z) > threshold:
                        out.append((key[0], ts, v, z))
            n, s, s2 = n + 1, s + v, s2 + v * v
        state.update((n, s, s2))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "event_ts", "value", "zscore"]
            )

    return (
        stream.groupBy(key_col).applyInPandasWithState(
            fn,
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
