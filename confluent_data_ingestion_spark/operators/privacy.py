"""Group-privacy gates: k-anonymity suppression and l-diversity audit.

`text.pii_scrub` masks PII-shaped substrings INSIDE free text; these
operators gate STRUCTURED releases — the other half of a training-data
pipeline's privacy posture.  A record is k-anonymous when at least k
rows share its quasi-identifier combination (Sweeney), and a
quasi-group is l-diverse when its sensitive attribute takes at least l
distinct values (Machanavajjhala et al.) — k alone fails when everyone
in a small group shares the same sensitive value.

Both are pure aggregations:

  k_anonymize_suppress   one window count over the quasi-identifier
                         partition; rows in groups below k drop.  One
                         shuffle on the quasi key, no join, no state
                         beyond the running count — scan-shaped at any
                         table size.
  privacy_group_report   per-quasi-group audit: group size, distinct
                         sensitive values, and the releasable verdict
                         (size >= k AND diversity >= l).  One hash
                         aggregation; output is group-count-sized.

Suppression is the conservative mechanism (never generalizes values,
so released rows are verbatim rows); generalization hierarchies are a
policy choice layered on top by rewriting the quasi columns BEFORE
calling these (e.g. bucketing an age, truncating a zip).  That rewrite
ships here too, as a composable spec:

  generalize_quasi       rewrite named quasi columns in place from a
                         {column: rule} spec — ``bucket_rule(width)``
                         (numeric value -> its bucket's lower bound),
                         ``truncate_rule(n)`` (string -> n-char
                         prefix), or any Column expression.  A pure
                         projection: zero shuffles, the gate that
                         follows still pays only its own one.

Generalize-then-gate trades value precision for row survival: raw
near-unique quasi values suppress almost everything at any useful k,
the coarsened values keep the rows and release the bucket label — the
standard Sweeney hierarchy move, demonstrated by the
``k_anonymity_generalized`` registry row against suppression-only.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket_rule(width: float) -> Callable[[Column], Column]:
    """Generalization rule: numeric value -> its bucket's LOWER BOUND
    (double), e.g. width 1000.0 maps 2345.67 -> 2000.0 and -999.0 ->
    -1000.0.  The lower bound IS the released value — a real
    generalized datum, not an opaque bucket ordinal."""
    return lambda c: (F.floor(c / F.lit(width)) * F.lit(width)).cast(
        "double"
    )


def truncate_rule(n: int) -> Callable[[Column], Column]:
    """Generalization rule: string -> its first ``n`` characters (the
    zip-truncation hierarchy)."""
    return lambda c: F.substring(c, 1, n)


def generalize_quasi(
    df: DataFrame,
    rules: dict[str, object],
) -> DataFrame:
    """Rewrite quasi-identifier columns to coarser values, in place.

    ``rules`` maps column name -> a rule from :func:`bucket_rule` /
    :func:`truncate_rule` (a callable applied to the column), or a
    ready Column expression.  Pure projection — no shuffle, no join;
    compose as ``k_anonymize_suppress(generalize_quasi(df, ...), ...)``
    so the pipeline still costs one shuffle total.
    """
    out = {}
    for name, rule in rules.items():
        col = rule(F.col(name)) if callable(rule) else rule
        out[name] = col
    return df.withColumns(out)


def k_anonymize_suppress(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    size_col: str = "group_size",
) -> DataFrame:
    """Rows whose quasi-identifier group has >= k members, with the
    group size appended (the audit trail a release needs).  Groups
    below k are suppressed entirely — the standard conservative
    k-anonymity mechanism.  One window count partitioned by the quasi
    columns: a single shuffle on the quasi key.
    """
    w = Window.partitionBy(*quasi_cols)
    return (
        df.withColumn(size_col, F.count(F.lit(1)).over(w))
        .filter(F.col(size_col) >= k)
    )


def privacy_group_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: Column | str,
    k: int,
    l_div: int,
) -> DataFrame:
    """Per-quasi-group privacy audit: (quasi cols..., group_size,
    distinct_sensitive, releasable) where releasable = group_size >= k
    AND distinct_sensitive >= l_div.  ``sensitive`` may be a column
    name or an expression (bucket the raw value first when it is
    near-unique — diversity over a continuous value is meaningless).
    Exact distinct count per group: one hash aggregation, output is
    group-count-sized.
    """
    s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.count_distinct(s).alias("distinct_sensitive"),
    ).select(
        *quasi_cols,
        "group_size",
        "distinct_sensitive",
        (
            (F.col("group_size") >= k)
            & (F.col("distinct_sensitive") >= l_div)
        ).alias("releasable"),
    )
