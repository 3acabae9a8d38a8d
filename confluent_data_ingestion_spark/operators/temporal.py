"""Temporal join / sessionization operators.

Spark has no built-in AS OF / interval join (Flink and kdb+ ship them as
primitives; the reference's Flink runtime exposes interval joins for its
streaming pipelines).  These implement the same semantics Spark-first:

  asof_join           latest right row at-or-before each left row's
                      timestamp, per key — the point-in-time enrichment
                      join (no leakage of future data into training
                      features).
  interval_join       left ⨝ right where right_time ∈ (left_time+lower,
                      left_time+upper], per key — Flink's interval join,
                      re-expressed as a bucketed equi-join.
  sessionize          gap-based session ids per key (the classic
                      clickstream sessionization window).
  tumbling_window_agg Flink TUMBLE: non-overlapping event-time windows.
  hopping_window_agg  Flink HOP: overlapping sliding windows.
  session_window_agg  Flink SESSION: gap-merged windows (Spark-native
                      session_window).
  gapfill_locf        dense per-key daily grid with last-observation-
                      carried-forward fill (hypertable gap-fill).
  markov_transitions  per-key consecutive-state transition matrix.
  markov_stationary   power-iteration stationary distribution; with
                      damping < 1 it is PageRank.

Scale design:
 - ``asof_join`` does NOT range-join: a range join on (key, time<=)
   degenerates to per-key cross products.  Instead both sides union into
   one tagged stream and a single window pass per key carries the last
   right-side values forward (``last(..., ignorenulls=True)``) — ONE hash
   shuffle on the key + a per-partition sort, the minimum the semantics
   allow.  100 TB of facts never joins; it sorts once.
 - ``interval_join`` buckets time at the window width: each right row
   lands in one bucket, each left row probes the two (or
   ceil(span/width)+1) buckets its window can overlap, and the exact
   range predicate filters the equi-join output.  The shuffle is an
   equi-join on (key, bucket) — never an unbounded theta join — and each
   qualifying pair is produced exactly once because the right side is
   bucketed uniquely.
 - ``sessionize`` is lag + running sum over one (key, time) window —
   one shuffle, map-side nothing wider than the row itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _q6(col: Column) -> Column:
    """6-dp quantization as ``floor(x * 1e6 + 0.5) / 1e6`` — pure IEEE
    double ops, identical in every engine.  ``round(double, 6)`` is NOT:
    Spark rounds the double's SHORTEST decimal string while DuckDB
    rounds the exact binary value, so a quotient within an ulp of a .5
    boundary rounds differently (the ols_trend sf0.1 divergence class).
    Every double->6dp step in this module goes through this helper; the
    DECIMAL-input rounds stay F.round (decimal arithmetic is exact and
    engine-agnostic)."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tie_col: str | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``direction="backward"``, the default: latest ``right_time <=
    left_time``), at-or-after (``direction="forward"``: earliest
    ``right_time >= left_time``), or closest in EITHER direction
    (``direction="nearest"``: pandas ``merge_asof`` nearest semantics,
    equal gaps resolve backward) its timestamp, per key — backward is
    the point-in-time enrichment join (no future leakage), forward is
    the time-to-next-event join (time-to-conversion, next restock,
    next error after a deploy), nearest is the sensor-alignment join
    (attach the closest reading regardless of side).  Left rows with
    no match keep NULLs.

    Deterministic tie-break among right rows sharing the matched
    ``right_time``: backward takes the GREATEST ``tie_col`` (the
    latest), forward the SMALLEST (the earliest) — pass a unique right
    key; defaults to the first value column.

    ``tolerance_seconds`` bounds the match's staleness (pandas
    ``merge_asof(tolerance=...)`` / kdb ``wj`` semantics): a matched
    right row further than the tolerance from the left timestamp is
    treated as NO match (NULLs).  Timestamps compare in seconds;
    numeric time columns compare in their own units.  The bound is a
    per-row post-filter on the already-carried match — the plan is
    unchanged.

    Output: all left columns + ``prefix``-renamed ``value_cols``.

    Both directions are the SAME single-pass plan (see module
    docstring): one hash shuffle on the key, one per-partition sort —
    forward just reverses the traversal order, it never range-joins.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}"
        )
    if tolerance_seconds is not None and tolerance_seconds < 0:
        raise ValueError("tolerance_seconds must be >= 0")
    tie = tie_col or value_cols[0]
    lcols = left.columns
    # ALL value columns travel in ONE struct carried by ONE last(): the
    # per-column formulation (last per value col independently) mixes
    # values from different right rows whenever the latest right row has
    # NULL in some value col — the older non-null value bleeds through
    # ignorenulls.  A struct built from a right row is non-null even when
    # every member is NULL, so ignorenulls skips exactly the left rows.
    # the matched right row's OWN time travels inside the struct so a
    # tolerance bound can be applied per left row after the carry
    vs_type = right.select(
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(right_time).alias("__rt__"),
        ).alias("__vs__")
    ).schema["__vs__"].dataType
    r = right.select(
        F.col(right_on).alias("__k__"),
        F.col(right_time).alias("__t__"),
        F.lit(0).alias("__tag__"),
        F.col(tie).alias("__tie__"),
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(right_time).alias("__rt__"),
        ).alias("__vs__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(left_on).alias("__k__"),
        F.col(left_time).alias("__t__"),
        F.lit(1).alias("__tag__"),
        F.lit(None).cast(right.schema[tie].dataType).alias("__tie__"),
        F.lit(None).cast(vs_type).alias("__vs__"),
        *lcols,
    )
    # Left rows (tag=1) sort after right rows at the same instant, making
    # the match inclusive in either direction.  Backward traverses time
    # ascending and last() picks the latest-seen right row (max tie among
    # equals, via tie asc); forward traverses time DESCENDING, so the
    # latest-seen right row is the earliest at-or-after (min tie among
    # equals, via tie desc).
    order_b = [
        F.col("__t__").asc(), F.col("__tag__").asc(),
        F.col("__tie__").asc(),
    ]
    order_f = [
        F.col("__t__").desc(), F.col("__tag__").asc(),
        F.col("__tie__").desc(),
    ]

    def _w(order):
        return (
            Window.partitionBy("__k__")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    u = r.unionByName(l)
    if direction in ("backward", "forward"):
        w = _w(order_b if direction == "backward" else order_f)
        carried = u.select(
            *lcols,
            F.col("__tag__"),
            F.last("__vs__", ignorenulls=True).over(w).alias("__asof__"),
        )
    else:
        # nearest (pandas merge_asof nearest semantics, ties -> backward):
        # carry BOTH directions' matches — two windows over the SAME key
        # partitioning, so the plan pays one hash exchange and two sorts,
        # never a range join — then pick the closer per left row
        carried_2 = u.select(
            *lcols,
            F.col("__tag__"),
            F.col("__t__"),
            F.last("__vs__", ignorenulls=True).over(_w(order_b))
            .alias("__b__"),
            F.last("__vs__", ignorenulls=True).over(_w(order_f))
            .alias("__f__"),
        )

        def _tnum(col):
            from pyspark.sql.types import TimestampNTZType, TimestampType

            if isinstance(
                right.schema[right_time].dataType,
                (TimestampType, TimestampNTZType),
            ):
                return F.unix_micros(col.cast("timestamp"))
            return col.cast("double")

        gap_b = _tnum(F.col("__t__")) - _tnum(
            F.col("__b__").getField("__rt__")
        )
        gap_f = _tnum(F.col("__f__").getField("__rt__")) - _tnum(
            F.col("__t__")
        )
        carried = carried_2.select(
            *lcols,
            F.col("__tag__"),
            F.when(F.col("__b__").isNull(), F.col("__f__"))
            .when(F.col("__f__").isNull(), F.col("__b__"))
            .when(gap_b <= gap_f, F.col("__b__"))
            .otherwise(F.col("__f__"))
            .alias("__asof__"),
        )
    matched = carried.filter(F.col("__tag__") == 1)
    if tolerance_seconds is None:
        ok = F.lit(True)
    else:
        from pyspark.sql.types import TimestampNTZType, TimestampType

        def _num(col, dtype):
            if isinstance(dtype, (TimestampType, TimestampNTZType)):
                return F.unix_micros(col.cast("timestamp")) / F.lit(1e6)
            return col.cast("double")

        lt = _num(F.col(left_time), left.schema[left_time].dataType)
        rt = _num(
            F.col("__asof__").getField("__rt__"),
            right.schema[right_time].dataType,
        )
        if direction == "backward":
            gap = lt - rt
        elif direction == "forward":
            gap = rt - lt
        else:  # nearest: the matched side varies per row
            gap = F.abs(lt - rt)
        ok = gap <= F.lit(float(tolerance_seconds))
    return matched.select(
        *lcols,
        *[
            F.when(ok, F.col("__asof__").getField(c)).alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    lower_seconds: float,
    upper_seconds: float,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs (l, r) with matching key and
    ``left_time + lower < right_time <= left_time + upper``.

    The equi-join key is (key, time bucket) at the window-span width:
    each right row is bucketed once, each left row probes every bucket
    its (lower, upper] window can overlap — pairs are emitted exactly
    once, no post-join dedup.
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    span = upper_seconds - lower_seconds
    bucket_us = int(span * 1_000_000)
    lo_us = int(lower_seconds * 1_000_000)
    hi_us = int(upper_seconds * 1_000_000)
    rcols = right.columns
    r = right.select(
        F.col(right_on).alias("__k__"),
        F.unix_micros(F.col(right_time).cast("timestamp")).alias("__rt__"),
        # integral div, not float division: at 100 TB a one-ulp error at a
        # bucket boundary silently drops pairs.
        F.expr(
            f"unix_micros(cast({right_time} as timestamp)) div {bucket_us}"
        ).alias("__b__"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    )
    l = left.withColumn(
        "__lt__", F.unix_micros(F.col(left_time).cast("timestamp"))
    ).withColumn(
        "__b__",
        F.explode(
            F.sequence(
                F.expr(f"(__lt__ + {lo_us}) div {bucket_us}"),
                F.expr(f"(__lt__ + {hi_us}) div {bucket_us}"),
            )
        ),
    )
    joined = l.join(r, on=[l["__b__"] == r["__b__"], F.col(left_on) == r["__k__"]])
    return joined.filter(
        (F.col("__rt__") > F.col("__lt__") + F.lit(lo_us))
        & (F.col("__rt__") <= F.col("__lt__") + F.lit(hi_us))
    ).drop("__k__", "__b__", "__lt__", "__rt__")


def sessionize(
    df: DataFrame,
    *,
    key_col: str,
    time_col: str,
    gap_seconds: float,
    order_tie_col: str,
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign each row a per-key session sequence number (1-based): a new
    session starts when the gap from the previous row of the same key
    exceeds ``gap_seconds``.  ``order_tie_col`` makes the within-key
    ordering total (and the labeling deterministic) for equal timestamps.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(time_col).asc(), F.col(order_tie_col).asc()
    )
    gap_us = int(gap_seconds * 1_000_000)
    t = F.unix_micros(F.col(time_col).cast("timestamp"))
    prev = F.lag(t).over(w)
    is_new = F.when(prev.isNull() | ((t - prev) > F.lit(gap_us)), 1).otherwise(0)
    return df.withColumn(
        out_col,
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )


def tumbling_window_agg(
    df: DataFrame,
    *,
    time_col: str,
    window_seconds: int,
    group_cols: list[str],
    aggs: list,
) -> DataFrame:
    """Tumbling event-time window aggregation — Flink SQL's
    ``TUMBLE(...)`` (the reference's Flink runtime exposes it as a
    first-class streaming construct; batch semantics are identical).

    One shuffle on (window, group keys) with map-side partial aggregation;
    ``F.window`` is a pure projection, so the window assignment itself is
    codegen'd and free.  The same expression works under Structured
    Streaming with a watermark for the streaming path.
    """
    w = F.window(F.col(time_col), f"{window_seconds} seconds")
    agged = df.groupBy(w.alias("__w__"), *group_cols).agg(*aggs)
    return agged.select(
        F.col("__w__.start").alias("window_start"),
        F.col("__w__.end").alias("window_end"),
        *[c for c in agged.columns if c != "__w__"],
    )


def hopping_window_agg(
    df: DataFrame,
    *,
    time_col: str,
    window_seconds: int,
    slide_seconds: int,
    group_cols: list[str],
    aggs: list,
) -> DataFrame:
    """Hopping (sliding) event-time window aggregation — Flink SQL's
    ``HOP(...)``.  Each row lands in ``window/slide`` overlapping windows;
    ``F.window(col, win, slide)`` expands them JVM-side before ONE shuffle
    on (window, keys) with map-side combine — row duplication is bounded
    by the overlap factor, never by the data.
    """
    if window_seconds % slide_seconds != 0:
        raise ValueError("window_seconds must be a multiple of slide_seconds")
    w = F.window(
        F.col(time_col), f"{window_seconds} seconds", f"{slide_seconds} seconds"
    )
    agged = df.groupBy(w.alias("__w__"), *group_cols).agg(*aggs)
    return agged.select(
        F.col("__w__.start").alias("window_start"),
        F.col("__w__.end").alias("window_end"),
        *[c for c in agged.columns if c != "__w__"],
    )


def session_window_agg(
    df: DataFrame,
    *,
    time_col: str,
    gap_seconds: int,
    group_cols: list[str],
    aggs: list,
) -> DataFrame:
    """Session event-time window aggregation — Flink SQL's ``SESSION(...)``
    via Spark's native ``session_window`` (windows extend while events
    arrive within ``gap_seconds`` of the last one; window_end = last event
    + gap).

    Session merging is Spark-native (dedicated merging state store in
    streaming; a window-merge pass in batch) behind ONE shuffle on the
    group keys.  The same expression runs under Structured Streaming with
    a watermark.
    """
    w = F.session_window(F.col(time_col), f"{gap_seconds} seconds")
    agged = df.groupBy(w.alias("__w__"), *group_cols).agg(*aggs)
    return agged.select(
        F.col("__w__.start").alias("window_start"),
        F.col("__w__.end").alias("window_end"),
        *[c for c in agged.columns if c != "__w__"],
    )


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: how many users complete each prefix of
    ``steps`` IN ORDER (each step strictly after the previous one's first
    qualifying occurrence) — the classic conversion funnel
    (view -> click -> purchase), which a plain per-step count cannot
    answer because it ignores ordering.

    Semantics: a user reaches step k when there exists an occurrence of
    ``steps[k]`` strictly after the user's EARLIEST qualifying occurrence
    of step k-1 (the standard greedy funnel — earliest-completion
    matching maximizes reachable depth for strictly-increasing chains).
    Output: one row per step, (step int 1-based, step_name, n_users),
    n_users monotonically non-increasing.

    Scale shape: one filtered min-aggregation per step, each a map-side
    combined shuffle on the user key producing user-count-sized frames;
    step k joins step k-1's (user, first_ts) frame — k-1 equi-joins on
    the user key, no windows, no self-join of the raw stream.  The raw
    events scan is re-read per step; persist upstream if the source scan
    dominates (step frames themselves are small).  The final counts are
    single-row aggregates unioned driver-side (k rows total).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    prev: DataFrame | None = None
    counts: DataFrame | None = None
    for k, step in enumerate(steps):
        occ = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("__t__")
        )
        if prev is None:
            cur = occ.groupBy(user_col).agg(F.min("__t__").alias("__ft__"))
        else:
            cur = (
                occ.join(prev.select(user_col, "__ft__"), user_col)
                .filter(F.col("__t__") > F.col("__ft__"))
                .groupBy(user_col)
                .agg(F.min("__t__").alias("__ft__"))
            )
        row = cur.agg(
            F.lit(k + 1).cast("int").alias("step"),
            F.lit(step).alias("step_name"),
            F.count(F.lit(1)).alias("n_users"),
        )
        counts = row if counts is None else counts.unionByName(row)
        prev = cur
    return counts


def rolling_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    window_rows: int = 5,
) -> DataFrame:
    """Per-key rolling statistics over the trailing ``window_rows`` rows
    in time order — the feature-engineering primitive (trailing spend,
    trailing event rate) behind sessionless user features.

    Output: input columns + roll_sum / roll_avg / roll_n over the frame
    ``ROWS BETWEEN window_rows-1 PRECEDING AND CURRENT ROW`` ordered by
    (``ts_col``, ``order_tiebreak``) within each key.

    Determinism across engines: the frame is an explicit ROWS frame with
    a total order (timestamp + unique tiebreak), and the windowed sum
    accumulates DECIMAL(18,2) — exact arithmetic, so segment-tree vs
    sequential accumulation differences between engines cannot change a
    bit.  The average divides the exact sum and rounds to 6 decimals.

    Scale shape: ONE hash shuffle on the key + a per-partition sort —
    the minimum the semantics allow; the frame is O(window_rows) state
    per row.  Keys are users: cardinality is high and per-key row counts
    are bounded, so no single-reducer risk (unlike a global window).
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
        .rowsBetween(-(window_rows - 1), 0)
    )
    dec = F.col(value_col).cast("decimal(18,2)")
    return (
        df.withColumn("__rsum__", F.sum(dec).over(w))
        .withColumn("__rn__", F.count(F.lit(1)).over(w))
        .withColumn(
            "roll_avg",
            F.expr("round(CAST(__rsum__ AS DOUBLE) / __rn__, 6)"),
        )
        .withColumn("roll_sum", F.col("__rsum__").cast("double"))
        .withColumn("roll_n", F.col("__rn__").cast("int"))
        .drop("__rsum__", "__rn__")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    *,
    max_offset_weeks: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the ISO week
    (Monday-start ``date_trunc('week', ...)``) of their FIRST event;
    for each (cohort_week, week_offset) the output counts the distinct
    cohort users active in that week and the retention rate against the
    cohort's size — the standard product-analytics retention triangle.

    Output: (cohort_week, week_offset, n_users, retention_rate) with
    offset 0 being the cohort week itself (rate 1.0 by construction —
    every user is active in their first week).  ``max_offset_weeks``
    truncates the triangle's tail.

    Scale shape: one min-aggregation on the user key (map-side combined)
    to build cohorts, one distinct-aggregation on (user, week) — both
    user-cardinality frames, far smaller than the event stream — then an
    equi-join on the user key and a final small aggregation on
    (cohort, offset).  The cohort-size denominator comes from a window
    over the (cohort, offset) AGGREGATE (cohort-count rows, not users),
    so no second pass over the data.  Nothing here scales with events
    beyond the two initial map-side-combined aggregations.
    """
    wk = lambda c: F.date_trunc("week", F.col(c))  # noqa: E731
    cohorts = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = (
        events.select(F.col(user_col), wk(ts_col).alias("__wk__")).distinct()
    )
    grid = (
        active.join(cohorts, user_col)
        .withColumn(
            "week_offset",
            (F.datediff(F.col("__wk__"), F.col("cohort_week")) / 7).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    if max_offset_weeks is not None:
        grid = grid.filter(F.col("week_offset") <= max_offset_weeks)
    w0 = Window.partitionBy("cohort_week")
    size0 = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_users"))
    ).over(w0)
    return (
        grid.withColumn("__sz__", size0)
        .withColumn(
            "retention_rate",
            F.round(F.col("n_users").cast("double") / F.col("__sz__"), 6),
        )
        .drop("__sz__")
    )


def anomaly_zscore(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    *,
    threshold: float = 2.0,
) -> DataFrame:
    """Per-key z-score outlier detection: flag events whose ``value_col``
    deviates from the key's own mean by more than ``threshold`` standard
    deviations (population sigma) — the metrics-anomaly primitive behind
    per-entity spend/latency alerting.

    Determinism across engines: the per-key moments accumulate as exact
    DECIMAL sums (sum and sum-of-squares of DECIMAL(18,6)-quantized
    values), so mean/variance derive from bit-identical inputs in any
    engine; the z-score computes in DOUBLE from those exact sums and
    rounds to 6 decimals.  Keys with zero variance (or a single event)
    yield NULL z and are never flagged.

    Output: flagged rows only — (event row columns, zscore).

    Scale shape: ONE hash shuffle on the key; the moments are
    whole-partition window aggregates (O(1) state per row), the z-score
    and flag are per-row projections.  No join, no second pass.  Keys are
    entities (users/devices) — high cardinality, bounded per-key rows, so
    partition memory stays flat at 100 TB.
    """
    w = Window.partitionBy(key_col)
    q = F.col(value_col).cast("decimal(18,6)")
    stats = (
        events.withColumn("__n__", F.count(F.lit(1)).over(w))
        .withColumn("__s__", F.sum(q).over(w))
        .withColumn("__s2__", F.sum(q * q).over(w))
    )
    mean = F.col("__s__").cast("double") / F.col("__n__")
    var = (
        F.col("__s2__").cast("double") / F.col("__n__") - mean * mean
    )
    z = F.round(
        (F.col(value_col) - mean) / F.sqrt(var), 6
    )
    return (
        stats.withColumn("zscore", F.when(var > 0, z))
        .filter(F.abs(F.col("zscore")) > threshold)
        .drop("__n__", "__s__", "__s2__")
    )


def gapfill_locf(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    *,
    id_col: str | None = None,
) -> DataFrame:
    """Resample each key's event stream onto a dense daily grid with
    last-observation-carried-forward fill — the hypertable/timeseries
    "gap-fill" primitive (TimescaleDB's ``time_bucket_gapfill`` +
    ``locf``): downstream per-day features and forecasting joins need a
    row for EVERY day in an entity's active span, not just days with
    traffic.

    Per (key, day) the observed aggregate is the event count and the
    exact daily value sum (values quantized to DECIMAL(18,6) before
    summing, so the total is bit-identical across engines and
    partitionings).  Days inside the key's [first, last] observed span
    with no events appear with ``n_events = 0``, ``filled = true`` and
    the PRECEDING observed day's ``value_sum_locf`` carried forward.

    Output: (key, day, n_events, filled, value_sum_locf), one row per
    key per day of the key's span.

    Scale design — gap rows are GENERATED, not joined: the obvious plan
    (per-key min/max -> explode a calendar grid -> left join
    observations -> LOCF window) costs two extra shuffles (grid join +
    fill window).  Instead each observed day looks at the NEXT observed
    day (lead over one (key, day) window) and emits itself plus its gap
    days via ``sequence`` — every grid day is produced exactly once,
    already carrying the value it would inherit, so LOCF is free and the
    whole operator is ONE shuffle for the (key, day) aggregate plus ONE
    for the per-key window.  Fan-out per row is bounded by the key's
    longest gap (days, not events), the same bound the join plan's grid
    side has — but map-side.
    """
    day = F.col(ts_col).cast("date").alias("day")
    obs = events.groupBy(key_col, day).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum(F.round(F.col(value_col), 6).cast("decimal(18,6)")).alias(
            "__vsum__"
        ),
    )
    w = Window.partitionBy(key_col).orderBy(F.col("day").asc())
    nxt = obs.withColumn("__next__", F.lead("day").over(w))
    gridded = nxt.select(
        F.col(key_col),
        F.col("day").alias("__obs_day__"),
        F.explode(
            F.expr("sequence(day, coalesce(date_sub(__next__, 1), day))")
        ).alias("day"),
        "__n__",
        "__vsum__",
    )
    is_obs = F.col("day") == F.col("__obs_day__")
    return gridded.select(
        F.col(key_col),
        F.col("day"),
        F.when(is_obs, F.col("__n__")).otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_events"),
        (~is_obs).alias("filled"),
        F.col("__vsum__").cast("double").alias("value_sum_locf"),
    )


def gapfill_interpolate(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily gap-fill with LINEAR INTERPOLATION — the other TimescaleDB
    fill mode (``interpolate()`` next to ``locf()``): gap days take the
    value on the straight line between the surrounding observed days'
    exact daily sums, the right fill for quantities that drift rather
    than step.

    Same lead-generated-grid design as ``gapfill_locf`` (each observed
    day emits itself plus its gap days map-side; two shuffles total) —
    interpolation needs ONE extra lead (the next day's value) in the
    same window pass, still no join.  Gap values are
    ``round(prev + (next - prev) * pos / gap_len, 6)`` with prev/next
    exact DECIMAL daily sums, pos/gap_len integral day offsets: the
    only float step is one multiply-divide on exact inputs, identical
    in any engine.  The trailing observed day of each key has no next
    observation, so it generates no gaps (by construction) — every
    emitted gap interpolates between two real observations.

    Output: (key, day, n_events, filled, value_sum_interp).
    """
    day = F.col(ts_col).cast("date").alias("day")
    obs = events.groupBy(key_col, day).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum(F.round(F.col(value_col), 6).cast("decimal(18,6)")).alias(
            "__vsum__"
        ),
    )
    w = Window.partitionBy(key_col).orderBy(F.col("day").asc())
    nxt = obs.withColumn("__next__", F.lead("day").over(w)).withColumn(
        "__nextv__", F.lead("__vsum__").over(w)
    )
    gridded = nxt.select(
        F.col(key_col),
        F.col("day").alias("__obs_day__"),
        F.col("__next__"),
        F.explode(
            F.expr("sequence(day, coalesce(date_sub(__next__, 1), day))")
        ).alias("day"),
        "__n__",
        "__vsum__",
        "__nextv__",
    )
    is_obs = F.col("day") == F.col("__obs_day__")
    pos = F.datediff(F.col("day"), F.col("__obs_day__")).cast("double")
    gap_len = F.datediff(F.col("__next__"), F.col("__obs_day__")).cast(
        "double"
    )
    # floor-quantization, not round(double, 6): the interpolation
    # quotient is a raw double, the exact boundary-divergence class the
    # ols_trend fix documents (stats.ols_trend docstring)
    raw = (
        F.col("__vsum__").cast("double")
        + (F.col("__nextv__").cast("double") - F.col("__vsum__")
           .cast("double"))
        * pos / gap_len
    )
    interp = F.floor(raw * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    return gridded.select(
        F.col(key_col),
        F.col("day"),
        F.when(is_obs, F.col("__n__")).otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_events"),
        (~is_obs).alias("filled"),
        F.when(is_obs, F.col("__vsum__").cast("double"))
        .otherwise(interp)
        .alias("value_sum_interp"),
    )


def markov_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of per-key state sequences:
    order each key's events by (ts, tiebreak), pair every state with its
    predecessor (lag), and count + row-normalize the (prev, next) pairs —
    the behavioral-model primitive behind next-event prediction, funnel
    leak analysis, and session simulation.

    Output: (prev_state, next_state, n_transitions, n_out, prob) where
    ``n_out`` is the total outgoing transitions of ``prev_state`` and
    ``prob`` the 6-dp floor-quantized ratio of the exact counts (see
    :func:`_q6` for why not ``round(double, 6)``).

    Scale shape: ONE hash shuffle on the key for the lag window (the
    per-key sort is the floor the semantics allow), then a groupBy on
    (prev, next) whose state is the state-alphabet squared — metadata
    sized, partially aggregated map-side.  The row-total rides a window
    over the tiny matrix, not a second scan.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        events.withColumn("__prev__", F.lag(state_col).over(w))
        .filter(F.col("__prev__").isNotNull())
        .groupBy(
            F.col("__prev__").alias("prev_state"),
            F.col(state_col).alias("next_state"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wrow = Window.partitionBy("prev_state")
    return (
        pairs.withColumn("n_out", F.sum("n_transitions").over(wrow))
        .withColumn(
            "prob",
            _q6(
                F.col("n_transitions").cast("double") / F.col("n_out")
            ).cast("decimal(18,6)"),
        )
    )


def markov_stationary(
    transitions: DataFrame,
    steps: int = 3,
    damping: float = 1.0,
) -> DataFrame:
    """Approximate stationary distribution of a Markov transition matrix
    by ``steps`` rounds of power iteration from the uniform vector —
    "where does user behavior settle": the long-run share of each state
    under the observed dynamics.

    Input is ``markov_transitions`` output (or any frame with
    prev_state / next_state / prob as DECIMAL(18,6)).  States are the
    distinct ``prev_state`` values (states with outgoing edges; a pure
    sink has no row in a row-normalized matrix and is excluded — callers
    wanting sink mass should add explicit self-loops first).

    Determinism: the vector starts at round(1/S, 6) and every iteration
    computes ``p'(s') = round(sum_s p(s) * prob(s, s'), 6)`` in exact
    DECIMAL arithmetic (scale-12 products, exact sum, half-up round to
    6 dp) — bit-identical across engines, partitionings, and join
    orders, the property an unrounded DOUBLE accumulation cannot give.

    ``damping`` < 1 turns the iteration into PAGERANK (Brin & Page;
    public method): ``p'(s') = round((1 - damping)/S +
    damping * sum_s p(s) * prob(s, s'), 6)`` — the teleport term makes
    the chain irreducible, so no state starves even when unreachable.
    For engine-parity oracles pick an exact-binary damping (0.875,
    0.75): the teleport constant ``1 - damping`` computes in Python and
    must equal the literal an oracle writes.

    Output: (state, p_uniform, p_stationary) — the start vector and the
    ``steps``-step iterate.

    Scale shape: the matrix is state-alphabet squared (metadata sized)
    and the vector is state-alphabet sized; each round is one broadcast
    join + one tiny aggregation.  The transitions frame is persisted
    (``caching.track`` — released by the registry after the action) so
    the corpus-sized lineage BELOW it runs once, not once per
    iteration: without it each round's join re-derives the matrix from
    the raw events.  The iteration count is fixed and small, so the
    plan above the persisted matrix stays shallow.
    """
    from ..caching import track

    if steps < 1:
        raise ValueError("steps must be >= 1")
    if not 0.0 < damping <= 1.0:
        raise ValueError("damping must be in (0, 1]")
    trans = track(
        transitions.select("prev_state", "next_state", "prob")
    )
    states = trans.select(F.col("prev_state").alias("state")).distinct()
    # alphabet-sized frame: the single-partition window is metadata work,
    # not a skew risk, and keeps the uniform seed collect-free
    w_all = Window.partitionBy()
    p0 = _q6(
        F.lit(1.0) / F.count(F.lit(1)).over(w_all)
    ).cast("decimal(18,6)")
    vec = states.select("state", p0.alias("p"))
    # base frame for the teleport re-join: every state, with the alphabet
    # size attached once (window over the tiny states frame)
    base = states.select(
        "state", F.count(F.lit(1)).over(w_all).alias("__ns__")
    )
    trans = F.broadcast(trans)
    for _ in range(steps):
        # vec descends from `transitions` (states -> groupBy lineage), so
        # an expression join against `trans` would trip Spark's ambiguous
        # self-join detection — explicit aliases keep each side's
        # attributes distinct.
        inc = (
            vec.alias("v")
            .join(
                trans.alias("t"),
                F.col("v.state") == F.col("t.prev_state"),
                "inner",
            )
            .groupBy(F.col("t.next_state").alias("state"))
            .agg(
                F.round(F.sum(F.col("v.p") * F.col("t.prob")), 6)
                .cast("decimal(18,6)")
                .alias("p")
            )
        )
        if damping == 1.0:
            vec = inc
        else:
            # PageRank step: states with no incoming mass still get the
            # teleport share — re-join the full state set each round
            vec = base.join(inc, "state", "left").select(
                "state",
                _q6(
                    F.lit(1.0 - damping) / F.col("__ns__")
                    + F.lit(damping)
                    * F.coalesce(
                        F.col("p"), F.lit(0).cast("decimal(18,6)")
                    ).cast("double")
                ).cast("decimal(18,6)").alias("p"),
            )
    return states.select("state", p0.alias("p_uniform")).join(
        vec.withColumnRenamed("p", "p_stationary"), "state", "left"
    )
