"""Column-spec (v3/v4.5) artifact emission with selectable dialect.

``dialect="flink"`` reproduces the reference generator's output format —
views / DROP+CREATE sinks with WITH props / EXECUTE STATEMENT SET inserts
(golden file ``resources/output/final-output.sql``) — verbatim enough that
tests diff our output against that committed golden file.  ``dialect=
"spark"`` emits the same statements through the Flink->Spark expression
translation, runnable on a SparkSession.

This is an artifact/debug surface; execution goes through
``plans/colspec_compiler.py`` (same grouping/join logic).
"""

from __future__ import annotations

from ..functions.dialect import translate_expr
from ..spec.colspec import ColSpec, ColSpecRow


def _xlat(expr: str, dialect: str, safe_cast: bool = True) -> str:
    if dialect == "flink":
        return expr
    return translate_expr(expr, safe_cast=safe_cast)


def render_colspec_views(spec: ColSpec, dialect: str = "flink") -> str:
    parts = ["-- ===== VIEWS ====="]
    raw_col = spec.raw_col
    for src, cols in spec.view_columns().items():
        selects = ",\n  ".join(
            _xlat(f"json_value(cast({raw_col} as string), '$.{c}')", dialect,
                  safe_cast=False)
            for c in cols
        )
        disc = _xlat(
            f"json_value(cast({raw_col} as string), '{spec.table_identifier_field}')",
            dialect, safe_cast=False)
        head = ("create view" if dialect == "flink"
                else "create or replace temporary view")
        name_cols = f" ({', '.join(cols)})" if dialect == "flink" else ""
        sel = (selects if dialect == "flink" else ",\n  ".join(
            f"{s} as {c}" for s, c in zip(selects.split(",\n  "), cols)))
        parts.append(
            f"{head} {spec.view_name(src)}{name_cols} as\n"
            f"select\n  {sel}\nfrom {spec.raw_table}\n"
            f"where\n  {disc} = '{src}';"
        )
    return "\n\n".join(parts) + "\n"


def render_colspec_sinks(spec: ColSpec, dialect: str = "flink") -> str:
    parts = ["-- ===== SINK TABLES ====="]
    for target, rows in spec.targets().items():
        cols: list[tuple[str, str]] = []
        for r in rows:
            if r.target_column and r.target_column not in [c for c, _ in cols]:
                cols.append((r.target_column,
                             (r.target_data_type or "string").strip().lower()))
        body = ",\n  ".join(f"{c} {t}" for c, t in cols)
        props = spec.with_props(target)
        if dialect == "flink":
            kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
            with_clause = f"\nwith ({kv});" if props else ";"
            parts.append(
                f"drop table if exists {target};\n"
                f"create table {target} (\n  {body}\n)"
                f"{with_clause}"
            )
        else:
            from ..functions.exprs import normalize_type

            body = ",\n  ".join(f"{c} {normalize_type(t)}" for c, t in cols)
            kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
            tbl_props = f"\nTBLPROPERTIES ({kv})" if props else ""
            parts.append(
                f"DROP TABLE IF EXISTS {target};\n"
                f"CREATE TABLE {target} (\n  {body}\n) USING parquet{tbl_props};"
            )
    return "\n\n".join(parts) + "\n"


def _select_expr(spec: ColSpec, r: ColSpecRow, multi: bool) -> str:
    if r.expression:
        return r.expression
    if multi:
        return f"{spec.view_name(r.source_table)}.{r.source_column}"
    return r.source_column or "NULL"


_JOIN_NORM = {
    "": "LEFT OUTER", "LEFT": "LEFT OUTER", "LEFT OUTER": "LEFT OUTER",
    "INNER": "INNER", "RIGHT": "RIGHT OUTER", "RIGHT OUTER": "RIGHT OUTER",
    "FULL": "FULL OUTER", "FULL OUTER": "FULL OUTER",
}


def _render_insert(spec: ColSpec, target: str, rows: list[ColSpecRow],
                   dialect: str) -> str:
    import re

    suffix = spec.view_suffix
    tgt_order: list[str] = []
    for r in rows:
        if r.target_column and r.target_column not in tgt_order:
            tgt_order.append(r.target_column)
    arms: dict[tuple, list[ColSpecRow]] = {}
    for r in rows:
        arms.setdefault(((r.filter or ""), (r.join_condition or "NOJOIN")), []).append(r)

    arm_sqls = []
    for (filt, _), grp in arms.items():
        srcs = []
        for r in grp:
            if r.source_table and r.source_table not in srcs:
                srcs.append(r.source_table)
        multi = len(srcs) > 1
        driving = spec.view_name(
            sorted(grp, key=lambda r: (r.join_order_int(), grp.index(r)))[0].source_table)
        conds: dict[str, dict] = {}
        for r in grp:
            jc = (r.join_condition or "").strip()
            if not jc:
                continue
            if jc not in conds:
                refs = [m for m in re.findall(
                    rf"([A-Za-z0-9_]+{re.escape(suffix)})\.", jc)]
                seen = []
                for m in refs:
                    if m not in seen:
                        seen.append(m)
                conds[jc] = {
                    "order": r.join_order_int(),
                    "type": _JOIN_NORM.get((r.join_type or "").strip().upper(),
                                           "LEFT OUTER"),
                    "refs": seen,
                }
            else:
                conds[jc]["order"] = min(conds[jc]["order"], r.join_order_int())
        used = {driving}
        join_lines = []
        for jc, it in sorted(conds.items(), key=lambda kv: (kv[1]["order"], kv[0])):
            candidates = [v for v in it["refs"] if v not in used]
            right = candidates[0] if candidates else None
            if right is None:
                continue
            used.add(right)
            join_lines.append(
                f"{it['type']} JOIN {right} ON {_xlat(jc, dialect, safe_cast=False)}")
        join_block = ("\n" + "\n".join(join_lines)) if join_lines else ""

        expr_by_tgt: dict[str, str] = {}
        for r in grp:
            if r.target_column and r.target_column not in expr_by_tgt:
                expr_by_tgt[r.target_column] = _xlat(
                    _select_expr(spec, r, multi), dialect)
        select_sql = ",\n".join(
            f"  {expr_by_tgt.get(c, 'NULL')} AS {c}" for c in tgt_order)
        where = f"\nWHERE {_xlat(filt, dialect, safe_cast=False)}" if filt else ""
        arm_sqls.append(f"SELECT\n{select_sql}\nFROM {driving}{join_block}{where}")

    cols_csv = ", ".join(tgt_order)
    ins = "INSERT INTO" if dialect == "flink" else "INSERT INTO TABLE"
    tgt_cols = f" ({cols_csv})" if dialect == "flink" else ""
    return f"{ins} {target}{tgt_cols}\n" + "\nUNION ALL\n".join(arm_sqls) + ";"


def render_colspec_inserts(spec: ColSpec, dialect: str = "flink") -> str:
    inserts = [
        _render_insert(spec, t, rows, dialect)
        for t, rows in spec.targets().items()
    ]
    if dialect == "flink":
        body = "\n\n".join(inserts)
        return f"-- ===== INSERTS =====\nexecute statement set\nbegin\n{body}\nend;\n"
    return "-- ===== INSERTS =====\n" + "\n\n".join(inserts) + "\n"


def render_colspec_script(spec: ColSpec, dialect: str = "flink") -> str:
    return "\n\n".join([
        render_colspec_views(spec, dialect),
        render_colspec_sinks(spec, dialect),
        render_colspec_inserts(spec, dialect),
    ])
