"""FGAC refined-table operators: enrichment joins + column masking.

Reference semantics: a refined table is an XREF/view joined with entitlement
or child tables, with row filtering and column masking (SURVEY.md section 1.1;
STTM v22 FGAC rows; quarantine handled in ``quarantine.py``).

Join shapes supported (reference J1-J4):
 - single lookup join, type in {inner,left,right,full}, default LEFT, with an
   arbitrary SQL ON condition (theta joins included);
 - ordered multi-view left-deep join chain (v4.5 J2): driving relation plus a
   sequence of (relation, condition, type) in join order.

Scale notes:
 - Lookup sides that are dimension-sized should broadcast: pass
   ``broadcast=True`` (or rely on Spark's auto-broadcast threshold / AQE) so
   the big fact side never shuffles.
 - Equi-conditions (even wrapped in TRIM) stay hash-joinable because Catalyst
   extracts equality predicates on expressions; genuinely non-equi conditions
   fall back to broadcast-nested-loop — keep those sides small.
 - Masking is a pure projection (sha2 / literal NULL / regexp_replace), fully
   codegen'd, zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dialect import translate_expr

_JOIN_TYPES = {
    "INNER": "inner",
    "LEFT": "left",
    "LEFT OUTER": "left",
    "RIGHT": "right",
    "RIGHT OUTER": "right",
    "FULL": "full",
    "FULL OUTER": "full",
}


def _norm_join_type(t: str | None) -> str:
    if not t or not t.strip():
        return "left"
    return _JOIN_TYPES.get(t.strip().upper(), "left")


def lookup_join(
    df: DataFrame,
    lookup: DataFrame,
    condition: str,
    *,
    join_type: str | None = "LEFT",
    left_alias: str = "s",
    right_alias: str = "j",
    broadcast: bool = False,
) -> DataFrame:
    """Single enrichment join with an arbitrary SQL ON condition (J1/J4)."""
    right = F.broadcast(lookup) if broadcast else lookup
    return df.alias(left_alias).join(
        right.alias(right_alias),
        F.expr(translate_expr(condition, safe_cast=False)),
        _norm_join_type(join_type),
    )


def ordered_join(
    driving: DataFrame,
    driving_alias: str,
    joins: list[tuple[DataFrame, str, str, str]],
    *,
    broadcast_small: bool = True,
    broadcast_threshold_rows: int | None = None,
) -> DataFrame:
    """Left-deep ordered join chain (J2/J3).

    ``joins``: list of (relation, alias, condition_sql, join_type) applied in
    join order.  Empty condition -> cross join (UI J3 parity).
    """
    acc = driving.alias(driving_alias)
    for rel, alias, cond, jtype in joins:
        rel = rel.alias(alias)
        if not cond or not cond.strip():
            acc = acc.crossJoin(rel)
            continue
        acc = acc.join(rel, F.expr(translate_expr(cond, safe_cast=False)),
                       _norm_join_type(jtype))
    return acc


def mask_columns(
    df: DataFrame,
    masks: dict[str, str],
) -> DataFrame:
    """Apply column masking (reference MaskField SMT / BR-5).

    ``masks`` maps column name -> strategy:
      'null'      -> replace with NULL (MaskField$Value parity)
      'sha2'      -> sha2-256 hex digest of the string value
      'redact'    -> keep last 4 chars, mask the rest with '*'
      any other   -> treated as a raw SQL expression for the new value
    """
    out = df
    for col, strategy in masks.items():
        s = strategy.strip().lower()
        if s == "null":
            out = out.withColumn(col, F.lit(None).cast(dict(out.dtypes)[col]))
        elif s == "sha2":
            out = out.withColumn(col, F.sha2(F.col(col).cast("string"), 256))
        elif s == "redact":
            c = F.col(col).cast("string")
            out = out.withColumn(
                col,
                F.when(
                    c.isNull(), F.lit(None)
                ).otherwise(
                    F.concat(
                        F.expr(f"repeat('*', greatest(char_length(CAST({col} AS STRING)) - 4, 0))"),
                        F.substring(c, -4, 4),
                    )
                ),
            )
        else:
            out = out.withColumn(col, F.expr(translate_expr(strategy)))
    return out
