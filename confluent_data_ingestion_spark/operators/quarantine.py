"""Quarantine: data-quality reject streams via anti-joins (reference J5).

Reference shape (``resources/output/final-output.sql:131-144``): records in A
with no match in B, UNION ALL records in B with no match in A, each arm
tagged with a literal reason column.

Scale notes: the two anti-join arms share their inputs — callers should
persist/cache the upstream views once (the statement-set runtime does this)
instead of recomputing them per arm.  Anti-joins hash-shuffle on the join key
only; with a small right side Spark broadcasts it and the arm is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dialect import translate_expr


def quarantine_antijoin(
    left: DataFrame,
    right: DataFrame,
    condition: str,
    *,
    select_left: list[str] | None = None,
    select_right: list[str] | None = None,
    reason_col: str = "what",
    left_reason: str = "right: none",
    right_reason: str = "left: none",
    both_directions: bool = True,
    left_alias: str = "a",
    right_alias: str = "b",
) -> DataFrame:
    """Rows failing referential checks, tagged with a reason literal.

    Arm 1: left rows with no right match.  Arm 2 (``both_directions``): right
    rows with no left match.  Column lists are aligned positionally across
    arms (the reference aligns by target column order, O1).
    """
    cond = F.expr(translate_expr(condition, safe_cast=False))
    l, r = left.alias(left_alias), right.alias(right_alias)

    arm1 = l.join(r, cond, "left_anti")
    if select_left:
        arm1 = arm1.select(*[F.expr(c) for c in select_left])
    arm1 = arm1.withColumn(reason_col, F.lit(left_reason))
    if not both_directions:
        return arm1

    arm2 = r.join(l, cond, "left_anti")
    if select_right:
        arm2 = arm2.select(*[F.expr(c) for c in select_right])
    arm2 = arm2.withColumn(reason_col, F.lit(right_reason))
    # positional alignment, renaming arm2 to arm1's schema
    arm2 = arm2.toDF(*arm1.columns)
    return arm1.unionAll(arm2)
