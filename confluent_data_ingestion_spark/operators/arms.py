"""UNION ALL of select arms (reference P9/O1).

Rows sharing (target_table, filter, join_condition) form one SELECT arm; arms
are combined with UNION ALL with column lists aligned to the target column
order.  Spark: unionByName after projecting every arm to the target order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_arms(arms: list[DataFrame], target_order: list[str] | None = None) -> DataFrame:
    """UNION ALL a list of arm DataFrames, aligned by target column order.

    Missing columns in an arm are filled with NULL (reference fills unmapped
    target columns with NULL, P5).
    """
    if not arms:
        raise ValueError("no arms")
    order = target_order or arms[0].columns
    aligned = []
    for arm in arms:
        cols = [
            F.col(c) if c in arm.columns else F.lit(None).alias(c)
            for c in order
        ]
        aligned.append(arm.select(*cols))
    out = aligned[0]
    for nxt in aligned[1:]:
        out = out.unionByName(nxt)
    return out
