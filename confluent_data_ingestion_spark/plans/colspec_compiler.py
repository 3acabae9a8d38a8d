"""Column-spec (v3/v4.5) pipeline compiler: Config+STTM -> DataFrames.

Implements the reference's first-generation dataflow
(``scripts/flinksql_from_sttm_v4_5.py``; golden output
``resources/output/final-output.sql``) Spark-first:

 - one shared envelope scan feeds every per-source-table view
   (discriminator ``$.tbl = '<source_table>'``, untyped string extraction —
   typing happens in the insert expressions, exactly like the golden SQL);
 - per target: arms grouped by (Filter, JoinCondition); each arm is a
   left-deep ordered join of views (driving = lowest Join Order; the right
   side of each distinct condition is the first ``…_vw`` reference not yet
   in scope); arms are combined UNION ALL (``unionByName``);
 - select expressions run through the Flink->Spark dialect layer, NULL
   fill for unmapped target columns, and a cast to the declared target
   type (the typed-sink coercion Flink applies on INSERT).

Scale notes: views are projections over one scan (no shuffle); arm joins
are view-to-view equi-joins that Catalyst plans (dimension-sized sides
broadcast); UNION ALL is a no-shuffle concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dialect import translate_expr
from ..functions.exprs import normalize_type
from ..spec.colspec import ColSpec, ColSpecRow


def _extract_view_refs(cond: str, suffix: str) -> list[str]:
    import re

    out = []
    for m in re.findall(rf"([A-Za-z0-9_]+{re.escape(suffix)})\.", cond or ""):
        if m not in out:
            out.append(m)
    return out


_JOIN_TYPE = {
    "": "left", "LEFT": "left", "LEFT OUTER": "left",
    "INNER": "inner", "RIGHT": "right", "RIGHT OUTER": "right",
    "FULL": "full", "FULL OUTER": "full",
}


def compile_colspec_views(spec: ColSpec, raw_df: DataFrame) -> dict[str, DataFrame]:
    """Every per-source-table view off ONE envelope DataFrame."""
    views: dict[str, DataFrame] = {}
    payload = F.col(spec.raw_col).cast("string")
    for src, cols in spec.view_columns().items():
        disc = F.get_json_object(payload, spec.table_identifier_field) == F.lit(src)
        proj = [
            F.get_json_object(payload, f"$.{c}").alias(c) for c in cols
        ]
        views[spec.view_name(src)] = raw_df.filter(disc).select(*proj)
    return views


def _arm_df(
    spec: ColSpec,
    grp: list[ColSpecRow],
    tgt_order: list[str],
    tgt_types: dict[str, str],
    views: dict[str, DataFrame],
) -> DataFrame:
    suffix = spec.view_suffix
    srcs: list[str] = []
    for r in grp:
        if r.source_table and r.source_table not in srcs:
            srcs.append(r.source_table)
    multi = len(srcs) > 1
    driving_name = spec.view_name(
        sorted(grp, key=lambda r: (r.join_order_int(), grp.index(r)))[0].source_table
    )
    acc = views[driving_name].alias(driving_name)

    # distinct join conditions, ordered; right side = first unused _vw ref
    conds: dict[str, dict] = {}
    for r in grp:
        jc = (r.join_condition or "").strip()
        if not jc:
            continue
        if jc not in conds:
            conds[jc] = {
                "order": r.join_order_int(),
                "type": _JOIN_TYPE.get((r.join_type or "").strip().upper(), "left"),
                "refs": _extract_view_refs(jc, suffix),
            }
        else:
            conds[jc]["order"] = min(conds[jc]["order"], r.join_order_int())
    used = {driving_name}
    for jc, it in sorted(conds.items(), key=lambda kv: (kv[1]["order"], kv[0])):
        candidates = [v for v in it["refs"] if v not in used]
        right = candidates[0] if candidates else None
        if right is None or right not in views:
            continue
        used.add(right)
        acc = acc.join(
            views[right].alias(right),
            F.expr(translate_expr(jc, safe_cast=False)),
            it["type"],
        )

    # first-wins expression per target column; NULL fill; cast to target type
    expr_by_tgt: dict[str, str] = {}
    for r in grp:
        tc = r.target_column
        if not tc or tc in expr_by_tgt:
            continue
        if r.expression:
            expr_by_tgt[tc] = translate_expr(r.expression)
        elif multi:
            expr_by_tgt[tc] = f"{spec.view_name(r.source_table)}.{r.source_column}"
        else:
            expr_by_tgt[tc] = r.source_column
    select_cols = []
    for col in tgt_order:
        e = expr_by_tgt.get(col, "NULL")
        t = normalize_type(tgt_types.get(col))
        select_cols.append(F.expr(e).cast(t).alias(col))
    arm = acc.select(*select_cols)
    filt = (grp[0].filter or "").strip()
    # the Filter belongs to the arm's FROM/JOIN scope, so apply before the
    # projection renames columns away
    if filt:
        arm = acc.filter(F.expr(translate_expr(filt, safe_cast=False))).select(*select_cols)
    return arm


def compile_colspec(
    spark: SparkSession, spec: ColSpec, raw_df: DataFrame
) -> dict[str, DataFrame]:
    """Compile the whole column-spec pipeline: views + every target (arms
    unioned).  Returns {view_name | target_table: DataFrame}."""
    views = compile_colspec_views(spec, raw_df)
    out: dict[str, DataFrame] = dict(views)
    for target, rows in spec.targets().items():
        tgt_order: list[str] = []
        tgt_types: dict[str, str] = {}
        for r in rows:
            if r.target_column and r.target_column not in tgt_order:
                tgt_order.append(r.target_column)
                tgt_types[r.target_column] = r.target_data_type or "STRING"
        arms: dict[tuple, list[ColSpecRow]] = {}
        for r in rows:
            k = ((r.filter or ""), (r.join_condition or "NOJOIN"))
            arms.setdefault(k, []).append(r)
        dfs = [
            _arm_df(spec, grp, tgt_order, tgt_types, views)
            for grp in arms.values()
        ]
        acc = dfs[0]
        for d in dfs[1:]:
            acc = acc.unionByName(d)
        out[target] = acc
    return out
