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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
