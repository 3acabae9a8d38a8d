"""Corpus composition statistics: the "what's in my corpus" report.

Training mixes are steered by composition numbers — documents, tokens,
and bytes per (language, source, ...) slice plus the slice's share of the
whole — and the natural shape is one ROLLUP aggregation: every level of
the report (per-pair, per-language, grand total) comes out of a single
shuffle instead of one groupBy per level.

Scale: token/byte counts are per-row Catalyst expressions folded into the
aggregation's map-side partial step, so the shuffle carries one
pre-aggregated row per (dims) combination per task — never documents.
ROLLUP multiplies map-side rows by (levels + 1), all of them tiny.

Also here: robust per-group statistics (median + MAD), two-pass exact
order-statistic quantiles, PSI snapshot-drift reports, and per-key OLS
trend lines — the monitoring statistics a recurring pipeline runs over
its own output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def corpus_mix_report(
    df: DataFrame,
    dims: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Doc/token/char totals and shares for every ROLLUP level of ``dims``.

    Output: ``dims...``, grp (grouping level: 0 = finest, increasing as
    dimensions aggregate away — disambiguates a genuine NULL dimension
    value from a rollup row), n_docs, n_tokens, n_chars, avg_tokens, and
    doc_share — the slice's fraction of the corpus (rounded to 6).
    """
    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    chars = F.length(F.col(text_col)).cast("long")
    base = df.select(
        *[F.col(d) for d in dims], toks.alias("__t__"), chars.alias("__c__")
    )
    agg = (
        base.rollup(*dims)
        .agg(
            F.expr(
                " + ".join(
                    f"grouping({d}) * {1 << i}"
                    for i, d in enumerate(reversed(dims))
                )
            )
            .cast("int")
            .alias("grp"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t__").alias("n_tokens"),
            F.sum("__c__").alias("n_chars"),
        )
        .withColumn(
            "avg_tokens",
            F.round(F.col("n_tokens") / F.col("n_docs"), 6),
        )
    )
    # the grand-total row (all dims aggregated away) carries the corpus
    # size; a scalar broadcast-joined back in gives every slice its share
    # without a second scan
    grand = agg.filter(F.col("grp") == (1 << len(dims)) - 1).select(
        F.col("n_docs").alias("__total__")
    )
    return (
        agg.crossJoin(F.broadcast(grand))
        .withColumn(
            "doc_share", F.round(F.col("n_docs") / F.col("__total__"), 6)
        )
        .drop("__total__")
    )


def robust_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    approx: bool = False,
) -> DataFrame:
    """Outlier-robust location/scale per group: median and MAD (median
    absolute deviation from the median) — the statistics quality gates
    should threshold on when a corpus has heavy-tailed junk, because a
    handful of pathological documents drag mean/stddev arbitrarily far
    while leaving median/MAD untouched.

    Two aggregation passes (the MAD's inner median forces it: deviations
    need the group median first); the group-median frame that joins back
    is group-count-sized.  Medians round to 6 dp BEFORE the deviation
    pass so any engine (R-7 interpolation, DuckDB ``quantile_cont``)
    reproduces the exact same devs and MAD bit-for-bit.  ``approx=True``
    swaps exact percentiles for ``approx_percentile`` sketches — the
    100 TB variant (exact per-group percentile sorts each group's
    values; the sketch is one bounded pass), same shape as
    ``profile_columns(approx=True)``.
    """
    pfn = "approx_percentile" if approx else "percentile"
    med = df.groupBy(*group_cols).agg(
        F.expr(f"round({pfn}({value_col}, 0.5d), 6)").alias("med_value"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    dev = df.join(med, group_cols).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("med_value"))
    )
    return (
        dev.groupBy(*group_cols)
        .agg(F.expr(f"round({pfn}(__dev, 0.5d), 6)").alias("mad_value"))
        .join(med, group_cols)
        .select(*group_cols, "n_rows", "med_value", "mad_value")
    )


def exact_quantiles_twopass(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: list[float],
    nbins: int = 256,
) -> DataFrame:
    """EXACT per-group quantiles as order statistics, computed WITHOUT
    sorting or buffering whole groups — the scale path the
    ``percentile``-based reports (``length_quantiles``,
    ``robust_stats``) lack: Spark's exact ``percentile`` aggregate holds
    every group value in one executor buffer, which is the same
    unbounded-state hazard the rollup store's KMV rework removed.

    Two passes, both bounded (three corpus SCANS in total — bounds,
    histogram, target-bin filter — deliberately traded against caching a
    100 TB corpus):

     1. Histogram pass — per-group (count, min, max), then bin counts on
        a per-group [min, max] grid (ONE map-combined corpus shuffle,
        output = groups x nbins rows).  A cumulative fold locates, for
        each quantile rank k = max(1, ceil(q * n)), the bin holding the
        k-th smallest value and how many values precede that bin.
     2. Order-statistic pass — only rows in a TARGET bin re-shuffle
        (expected n / nbins of the group per quantile); a row_number
        within (group, q) picks the (k - preceding)-th smallest.  Equal
        values make the rank tie arbitrary but the VALUE at any rank
        unambiguous, so the result is deterministic.

    The answer is an exact data value (the lower order statistic — SQL
    ``quantile_disc`` semantics), not an interpolation: binning-float
    details cannot change it, only which pass-2 subset it is found in.
    Output: (``group_cols...``, q, rank, value) — long form, one row per
    group per quantile.  NULL values are excluded; empty groups emit
    nothing.  A NULL group KEY is a real group (GROUP BY semantics), so
    every internal re-join uses null-safe equality — a name-based
    equi-join would silently drop the NULL-keyed group between passes.
    State per task: O(nbins) in pass 1, one spillable bin-subset sort in
    pass 2 — never O(group).
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    if nbins < 2:
        raise ValueError("nbins must be >= 2")
    g = [F.col(c) for c in group_cols]

    def nsjoin(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
        # null-safe broadcast equi-join on `keys`, keeping the LEFT
        # side's key columns (eqNullSafe stays a plain broadcast hash
        # join physically — NULL just becomes a joinable key value)
        r = right
        for k in keys:
            r = r.withColumnRenamed(k, f"__r_{k}__")
        r = F.broadcast(r)
        cond = None
        for k in keys:
            c = left[k].eqNullSafe(r[f"__r_{k}__"])
            cond = c if cond is None else cond & c
        return left.join(r, cond).drop(*[f"__r_{k}__" for k in keys])

    rows = df.select(*g, F.col(value_col).cast("double").alias("__v__")) \
        .filter(F.col("__v__").isNotNull())
    bounds = rows.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.min("__v__").alias("__lo__"),
        F.max("__v__").alias("__hi__"),
    )
    binned = nsjoin(rows, bounds, group_cols).withColumn(
        "__bin__",
        F.expr(
            f"CASE WHEN __hi__ = __lo__ THEN 0 ELSE "
            f"least(CAST(floor((__v__ - __lo__) / (__hi__ - __lo__) "
            f"* {nbins}) AS INT), {nbins - 1}) END"
        ),
    )
    hist = binned.groupBy(*g, F.col("__bin__")).agg(
        F.count(F.lit(1)).alias("__c__")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("__bin__")
    cum = nsjoin(
        hist.withColumn("__cum__", F.sum("__c__").over(w)),
        bounds.select(*g, "__n__"),
        group_cols,
    )
    qdf = rows.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    # target bin per (group, q): first bin whose cumulative count reaches
    # the rank; rows before it = cum - c
    targets = (
        cum.crossJoin(F.broadcast(qdf))
        .withColumn(
            "__k__",
            F.expr("greatest(1L, CAST(ceil(q * __n__) AS BIGINT))"),
        )
        .filter(
            (F.col("__cum__") >= F.col("__k__"))
            & (F.col("__cum__") - F.col("__c__") < F.col("__k__"))
        )
        .select(
            *g, "q", "__bin__", "__k__",
            (F.col("__k__") - (F.col("__cum__") - F.col("__c__")))
            .alias("__need__"),
        )
    )
    wv = Window.partitionBy(*group_cols, "q").orderBy("__v__")
    return (
        nsjoin(binned, targets, [*group_cols, "__bin__"])
        .withColumn("__rn__", F.row_number().over(wv))
        .filter(F.col("__rn__") == F.col("__need__"))
        .select(
            *g, "q", F.col("__k__").alias("rank"),
            F.col("__v__").alias("value"),
        )
    )


def psi_drift_report(
    base: DataFrame,
    current: DataFrame,
    cat_cols: list[str] | None = None,
    num_cols: dict[str, float] | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Population-Stability-Index drift between two corpus snapshots —
    the monitoring gate a recurring training-data pipeline runs before
    trusting a new crawl/dump against the one the last model trained on.

    Features: every ``cat_cols`` entry contributes its raw value as the
    bucket; every ``num_cols`` entry maps ``col -> bin_width`` and
    buckets by ``floor(col / width)`` (fixed-width bins — deterministic,
    mergeable, no quantile pass; NULL buckets as the sentinel ``'∅'``).
    For each (feature, bucket): shares on both sides and the PSI term
    ``(cur - base) * ln((cur + eps) / (base + eps))``; per feature the
    terms SUM to the classic PSI (industry rule of thumb: > 0.2 =
    investigate).  Returns one row per feature:
    ``(feature, psi, n_buckets, base_rows, cur_rows)``.

    Determinism: bucket counts are exact; shares are single IEEE
    divisions; each term is rounded to 6 dp and summed as an exact
    DECIMAL, so the report is bit-identical regardless of partitioning
    or engine (the same ln-round-then-decimal-sum contract as the LM
    log-prob rows).

    Scale: one scan per side — every feature's (feature, bucket) pair
    is emitted from the same pass via a stack/explode projection, so
    adding features adds map-side rows (feature-count x rows), never
    scans; the join and the PSI arithmetic run on the bucket-count
    frame, which is (features x buckets)-sized metadata.
    """
    cat_cols = list(cat_cols or [])
    num_cols = dict(num_cols or {})
    if not cat_cols and not num_cols:
        raise ValueError("psi_drift_report: no features given")

    def melt(df: DataFrame) -> DataFrame:
        pairs = []
        for c in cat_cols:
            pairs.append(
                F.struct(
                    F.lit(c).alias("feature"),
                    F.coalesce(F.col(c).cast("string"), F.lit("∅"))
                    .alias("bucket"),
                )
            )
        for c, width in num_cols.items():
            pairs.append(
                F.struct(
                    F.lit(c).alias("feature"),
                    F.coalesce(
                        F.floor(F.col(c) / F.lit(float(width)))
                        .cast("long").cast("string"),
                        F.lit("∅"),
                    ).alias("bucket"),
                )
            )
        return (
            df.select(F.explode(F.array(*pairs)).alias("fb"))
            .select("fb.feature", "fb.bucket")
            .groupBy("feature", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    b = melt(base).withColumnsRenamed({"n": "base_n"})
    c = melt(current).withColumnsRenamed({"n": "cur_n"})
    joined = b.join(c, ["feature", "bucket"], "full_outer").select(
        "feature", "bucket",
        F.coalesce("base_n", F.lit(0)).alias("base_n"),
        F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
    )
    per_f = Window.partitionBy("feature")
    terms = joined.select(
        "feature", "base_n", "cur_n",
        F.sum("base_n").over(per_f).alias("base_t"),
        F.sum("cur_n").over(per_f).alias("cur_t"),
    ).select(
        "feature", "base_t", "cur_t",
        F.round(
            (F.col("cur_n") / F.col("cur_t")
             - F.col("base_n") / F.col("base_t"))
            * F.round(F.log(
                (F.col("cur_n") / F.col("cur_t") + F.lit(eps))
                / (F.col("base_n") / F.col("base_t") + F.lit(eps))
            ), 6),
            6,
        ).cast("decimal(18,6)").alias("term"),
    )
    return terms.groupBy("feature").agg(
        F.sum("term").cast("double").alias("psi"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.first("base_t").alias("base_rows"),
        F.first("cur_t").alias("cur_rows"),
    )


def ols_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key ordinary-least-squares trend line — slope, intercept and
    r² of y over x within every key: the per-entity trend detector
    (spend drifting up, latency creeping, a domain's quality decaying)
    that turns raw history into one monitorable number per entity.

    Closed-form OLS from the five sufficient sums (n, Σx, Σy, Σxy,
    Σx², plus Σy² for r²), all accumulated EXACTLY: x must be integral
    (bucket indexes, day offsets), y is quantized to DECIMAL(18,6) —
    so the sums are bit-identical across engines and partitionings and
    the final divisions are the only floating-point steps.  The
    intercept derives from the ALREADY-QUANTIZED slope; both sides of
    any oracle must mirror that choice (they do).

    The 6-dp quantization is ``floor(x * 1e6 + 0.5) / 1e6`` — pure
    IEEE ops, NOT ``round(double, 6)``: Spark's round() goes through
    the double's SHORTEST decimal string (BigDecimal.valueOf) while
    DuckDB rounds the exact binary value, and a quotient landing
    within an ulp of a .5 boundary rounds differently (observed:
    intercept 133.712866 vs .712865 at sf0.1 — found by the sf0.1
    gate, not by luck).  floor on the same double is the same in every
    engine.  (Negative exact halves quantize toward +inf — identical
    on both sides, which is the actual contract.)

    Null contract: rows where x OR y is NULL are dropped BEFORE the
    aggregation — a point with a missing coordinate carries no trend
    information.  (Counting such rows while the sums skipped them would
    silently corrupt n vs Σ consistency and with it every derived
    statistic; the filter makes the contract explicit and keeps
    ``n_points`` = the number of points actually fitted.)

    Output per key: (key, n_points, slope, intercept, r2).  Keys with
    a single point (or zero x-variance) report NULL slope/intercept/r2;
    zero y-variance alone reports slope 0 and NULL r2 (r² is 0/0 on a
    flat line).  Keys whose rows are ALL null-coordinate are absent.

    Scale shape: ONE hash aggregation on the key — five decimal/bigint
    accumulators of map-side-combinable state, scan speed; no window,
    no join, no second pass.
    """
    x = F.col(x_col).cast("long")
    y = F.round(F.col(y_col), 6).cast("decimal(18,6)")
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    agg = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    # combine the sufficient sums in DOUBLE on individually-cast
    # operands: each sum is exact, so its double image is deterministic,
    # and the products/differences are then identical IEEE ops in any
    # engine — whereas a DECIMAL n*sxy would hit precision-cap rounding
    # whose semantics differ between engines
    nD = F.col("n").cast("double")
    sxD = F.col("sx").cast("double")
    syD = F.col("sy").cast("double")
    num = nD * F.col("sxy").cast("double") - sxD * syD
    denx = nD * F.col("sxx").cast("double") - sxD * sxD
    deny = nD * F.col("syy").cast("double") - syD * syD
    def q6(col):
        return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(
            1000000.0
        )

    slope = F.when(denx > 0, q6(num / denx))
    out = agg.withColumn("slope", slope)
    intercept = F.when(
        F.col("slope").isNotNull(),
        q6(
            (F.col("sy").cast("double") - F.col("slope") * F.col("sx"))
            / F.col("n")
        ),
    )
    r2 = F.when(
        (denx > 0) & (deny > 0),
        q6(F.pow(num, F.lit(2.0)) / (denx * deny)),
    )
    return out.select(
        F.col(key_col),
        F.col("n").cast("bigint").alias("n_points"),
        "slope",
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def ewma_residual(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.25,
) -> DataFrame:
    """Per-key EWMA baseline + last-observation residual — the
    exponentially-weighted control chart (Roberts 1959, the EWMA chart;
    public method) that asks of every entity "is today's value out of
    line with its own smoothed history?".  Next to ols_trend (slope
    over the whole window) and anomaly_zscore (global-stats z), this is
    the RECENCY-weighted detector: yesterday counts ~4x more than five
    days ago at the default alpha.

    Per key, over the DAILY exact value sums x_1..x_n (day order):

        e_1 = x_1;  e_t = alpha * x_t + (1 - alpha) * e_{t-1}

    and the report row carries the baseline BEFORE the last day
    (``ewma_prev`` = e_{n-1}), the smoothed level including it
    (``ewma_last`` = e_n) and ``residual`` = x_n - e_{n-1} — the
    surprise of the newest observation against its own history.

    Determinism contract: daily sums are exact DECIMAL(18,6); the
    recursion is evaluated as an explicit LEFT FOLD over the
    day-ordered array (``F.aggregate`` — interpreted, but the array is
    series-length-sized, bounded by the calendar not the data), so the
    double operations happen in one defined order — the same order
    DuckDB's ``list_reduce`` uses, making the statistic bit-identical
    across engines AND partitionings (a windowed running sum would
    leave the addition order to each engine's frame evaluator).  alpha
    defaults to 0.25: alpha and 1-alpha are exact binary doubles, so
    every fold step is reproducible IEEE arithmetic.  Outputs are
    floor-quantized at 6 dp.

    Scale shape: one hash aggregation to daily grain, one to the key
    grain (collect_list of a ~series-length array per key — bounded by
    days in range, NOT by table size), zero joins, zero windows.  Keys
    with a single day report NULL ewma_prev/residual.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    a = repr(float(alpha))
    b = repr(1.0 - float(alpha))
    daily = df.groupBy(
        F.col(key_col).alias("k"),
        F.col(ts_col).cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col(value_col), 6).cast("decimal(18,6)"))
        .alias("x")
    )
    series = daily.groupBy("k").agg(
        F.array_sort(
            F.collect_list(F.struct("day", "x"))
        ).alias("s")
    )
    # 1e6 / 0.5d are DOUBLE literals in Spark SQL — a plain 1000000.0
    # would parse as DECIMAL and drag the quotient into decimal division
    q6 = lambda e: f"floor(({e}) * 1e6 + 0.5d) / 1e6"  # noqa: E731
    fold_prev = (
        f"aggregate(slice(transform(s, e -> cast(e.x as double)),"
        f" 2, size(s) - 2), cast(s[0].x as double),"
        f" (acc, x) -> {a} * x + {b} * acc)"
    )
    last_x = "cast(element_at(s, -1).x as double)"
    ewma_last_expr = f"{a} * {last_x} + {b} * ({fold_prev})"
    residual_expr = f"{last_x} - ({fold_prev})"
    return series.select(
        F.col("k").alias(key_col),
        F.expr("size(s)").cast("bigint").alias("n_days"),
        F.expr("element_at(s, -1).day").alias("last_day"),
        F.expr(last_x).alias("last_value"),
        F.expr(
            f"CASE WHEN size(s) >= 2 THEN {q6(fold_prev)} END"
        ).alias("ewma_prev"),
        F.expr(
            f"CASE WHEN size(s) >= 2 THEN {q6(ewma_last_expr)}"
            f" ELSE {last_x} END"
        ).alias("ewma_last"),
        F.expr(
            f"CASE WHEN size(s) >= 2 THEN {q6(residual_expr)} END"
        ).alias("residual"),
    )
