"""Parity artifact emission: render a validated PipelineSpec to an
executable Spark SQL script + YAML statement bundles + a validation report.

Mirrors the reference generator's output surface —
``00_all.sql`` sectioned VIEWS / TABLES / INSERTS with an EXECUTE STATEMENT
SET wrapper (``scripts/sttm_to_flink_v22.py:386-400``), YAML bundles
(``scripts/flinksql_from_sttm_v4_5.py:449-453``), and a per-statement parse
validation report (``:438-447``, sqlglot there; Spark's own parser here) —
but the emitted dialect is Spark SQL, so the script actually RUNS on a
SparkSession (tests execute it and compare against the DataFrame compiler).

The SQL path is a debug/parity artifact: the production execution path is
the DataFrame compiler in ``plans/compiler.py`` (same expression builders,
so the two stay in lock-step by construction).
"""

from __future__ import annotations

from ..functions.dialect import translate_expr
from ..functions.exprs import (
    choose_expr,
    combine_predicates,
    normalize_type,
    rewrite_predicate_as_json,
)
import re

from ..plans.compiler import xref_dedup_spec
from ..spec.models import MappingRow, PipelineSpec

_SIMPLE_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def qident(name: str) -> str:
    """Backtick-quote identifiers that aren't plain (reference ``qident``,
    ``sttm_to_flink_v22.py`` — Kafka topic names contain dashes)."""
    return name if _SIMPLE_IDENT.match(name) else f"`{name}`"


def _view_select_items(spec: PipelineSpec, rows: list[MappingRow]) -> list[str]:
    fmt = (rows[0].message_format or "JSON").upper()
    items = []
    for r in rows:
        sql = choose_expr(
            r.expr_override,
            r.source_transform_expr,
            r.field_selector,
            fmt,
            r.target_data_type,
            payload_col=spec.payload_col,
            delimiter=spec.csv_delimiter,
            source_field=r.source_field,
        )
        items.append(f"{sql} AS {r.target_column}")
    return items


def render_view_sql(spec: PipelineSpec, table: str, rows: list[MappingRow]) -> str:
    src = rows[0].source_table or spec.raw_table
    where = ""
    if rows[0].filter_predicate:
        where = f"\nWHERE {rewrite_predicate_as_json(rows[0].filter_predicate, spec.payload_col)}"
    items = ",\n  ".join(_view_select_items(spec, rows))
    return (
        f"CREATE OR REPLACE TEMPORARY VIEW {qident(table)} AS\n"
        f"SELECT\n  {items}\nFROM {qident(src)}{where};"
    )


def render_table_ddl(spec: PipelineSpec, table: str, rows: list[MappingRow]) -> str:
    cols = ",\n  ".join(
        f"{r.target_column} {normalize_type(r.target_data_type)}" for r in rows
    )
    pks = [r.target_column for r in rows if r.is_target_pk]
    pk_comment = f"\n  -- PRIMARY KEY ({', '.join(pks)}) NOT ENFORCED" if pks else ""
    props = spec.props_for(table)
    tbl_props = ""
    if props:
        kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
        tbl_props = f"\nTBLPROPERTIES ({kv})"
    return (
        f"CREATE TABLE IF NOT EXISTS {qident(table)} (\n  {cols}{pk_comment}\n)"
        f" USING parquet{tbl_props};"
    )


def _select_items(rows: list[MappingRow], passthrough: bool = False) -> list[str]:
    items = []
    for r in rows:
        if r.expr_override and r.expr_override.lower().startswith("mask:"):
            strategy = r.expr_override.split(":", 1)[1]
            base = (r.source_transform_expr or r.source_field
                    or r.field_selector or r.target_column)
            if strategy == "null":
                expr = "CAST(NULL AS STRING)"
            elif strategy == "sha2":
                expr = f"sha2(CAST({base} AS STRING), 256)"
            else:
                expr = strategy
        elif r.expr_override or r.source_transform_expr:
            expr = translate_expr(r.expr_override or r.source_transform_expr)
        elif r.source_field:
            expr = translate_expr(r.source_field, safe_cast=False)
        elif r.field_selector:
            expr = translate_expr(r.field_selector, safe_cast=False)
        elif passthrough:
            expr = r.target_column
        else:
            expr = "NULL"
        items.append(f"{expr} AS {r.target_column}")
    return items


def _join_clause(rows: list[MappingRow]) -> str:
    for r in rows:
        if r.join_table and r.join_condition:
            jtype = (r.join_type or "LEFT").upper()
            alias = r.join_alias or "j"
            cond = translate_expr(r.join_condition, safe_cast=False)
            return f"\n{jtype} JOIN {qident(r.join_table)} {alias} ON {cond}"
    return ""


def render_xref_insert(table: str, rows: list[MappingRow],
                       spec: PipelineSpec | None = None) -> str:
    """Latest-by-key INSERT (the reference's documented ROW_NUMBER pattern,
    ``resources/architecture/sttm-requirements.md:117-134``)."""
    src = rows[0].source_table
    pks, order_fields, del_field, del_values = xref_dedup_spec(rows)
    passthrough = spec is not None and spec.unmapped_policy == "passthrough"
    items = ",\n    ".join(_select_items(rows, passthrough))
    order = ", ".join(f"{c} DESC NULLS LAST" for c in (order_fields or pks))
    where_del = ""
    if del_field:
        vals = ", ".join(f"'{v.lower()}'" for v in del_values)
        where_del = (
            f"\n  WHERE lower(trim(CAST({del_field} AS STRING))) IS NULL"
            f" OR lower(trim(CAST({del_field} AS STRING))) NOT IN ({vals})"
        )
    pred = combine_predicates([r.filter_predicate or "" for r in rows])
    if pred:
        p = translate_expr(pred, safe_cast=False)
        where_del += ("\n  AND " if where_del else "\n  WHERE ") + f"({p})"
    return (
        f"INSERT OVERWRITE TABLE {qident(table)}\n"
        f"SELECT {', '.join(r.target_column for r in rows)} FROM (\n"
        f"  SELECT\n    {items},\n"
        f"    ROW_NUMBER() OVER (PARTITION BY {', '.join(pks)}"
        f" ORDER BY {order}) AS __rn__\n"
        f"  FROM {qident(src)}{where_del}\n"
        f") WHERE __rn__ = 1;"
    )


def render_insert_sql(table: str, rows: list[MappingRow],
                      spec: PipelineSpec | None = None) -> str:
    """FGAC / QUARANTINE INSERT ... SELECT with lookup join and filters."""
    src = rows[0].source_table
    stage = rows[0].pipeline_stage
    alias = rows[0].source_alias or "s"
    passthrough = spec is not None and spec.unmapped_policy == "passthrough"
    items = ",\n  ".join(_select_items(rows, passthrough))
    join = _join_clause(rows)
    pred = combine_predicates([r.filter_predicate or "" for r in rows])
    where = ""
    if pred:
        where = f"\nWHERE {translate_expr(pred, safe_cast=False)}"
    elif stage == "QUARANTINE" and join:
        # anti-join convention: LEFT JOIN + right-key IS NULL
        pass
    return (
        f"INSERT INTO TABLE {qident(table)}\nSELECT\n  {items}\n"
        f"FROM {qident(src)} {alias}{join}{where};"
    )


def emit_bundle(spec: PipelineSpec) -> dict[str, str]:
    """Render the full artifact set: sectioned all.sql + per-section files.

    Returns a dict of filename -> content (caller writes to disk); YAML
    bundles come from :func:`emit_yaml_bundles`.
    """
    views, ddls, inserts = [], [], []
    for table, rows in spec.tables().items():
        stage = rows[0].pipeline_stage
        if stage == "VIEW":
            views.append(render_view_sql(spec, table, rows))
        else:
            ddls.append(render_table_ddl(spec, table, rows))
            if stage == "XREF":
                inserts.append(render_xref_insert(table, rows, spec))
            else:
                inserts.append(render_insert_sql(table, rows, spec))
    sections = []
    if views:
        sections.append("-- ===== VIEWS =====\n" + "\n\n".join(views))
    if ddls:
        sections.append("-- ===== TABLES =====\n" + "\n\n".join(ddls))
    if inserts:
        # Spark has no EXECUTE STATEMENT SET; the statement-set semantics
        # (one job, shared scan) live in streaming/runner.py.  The marker
        # comments keep section parity with the reference output.
        sections.append(
            "-- ===== EXECUTE STATEMENT SET (see streaming/runner.py) =====\n"
            + "\n\n".join(inserts)
        )
    return {
        "views.sql": "\n\n".join(views),
        "tables.sql": "\n\n".join(ddls),
        "inserts.sql": "\n\n".join(inserts),
        "00_all.sql": "\n\n".join(sections),
    }


def emit_yaml_bundles(spec: PipelineSpec) -> dict[str, str]:
    """views.yaml / sinks.yaml / inserts.yaml statement bundles (reference
    v4.5 output surface)."""
    import yaml

    bundle = emit_bundle(spec)

    def stmts(text: str) -> list[str]:
        return [s.strip() + ";" for s in text.split(";") if s.strip()]

    return {
        "views.yaml": yaml.safe_dump({"statements": stmts(bundle["views.sql"])}),
        "sinks.yaml": yaml.safe_dump({"statements": stmts(bundle["tables.sql"])}),
        "inserts.yaml": yaml.safe_dump({"statements": stmts(bundle["inserts.sql"])}),
    }


def validate_statements(spark, sql_text: str) -> list[dict]:
    """Parse every statement with Spark's own SQL parser (the reference uses
    sqlglot; we have the real parser in-process).  Returns one record per
    statement: {statement, ok, error}."""
    report = []
    for stmt in [s.strip() for s in sql_text.split(";") if s.strip()]:
        rec = {"statement": stmt.splitlines()[0][:80], "ok": True, "error": ""}
        err = _parse_error(spark, "spark", stmt)
        if err:
            rec["ok"] = False
            rec["error"] = err
        report.append(rec)
    return report


def _parse_error(spark, dialect: str, stmt: str) -> str:
    """Empty string when ``stmt`` parses under ``dialect``, else the first
    error line.  Both parsers are the REAL in-process ones (Spark's
    Catalyst parser; DuckDB's parse-only ``extract_statements``), not a
    regex approximation."""
    try:
        if dialect == "spark":
            spark._jsparkSession.sessionState().sqlParser().parsePlan(stmt)
        elif dialect == "duckdb":
            import duckdb

            duckdb.extract_statements(stmt)
        else:
            raise ValueError(f"unknown dialect {dialect!r}")
        return ""
    except ValueError:
        raise
    except Exception as e:  # parse failure -> report, don't raise
        # Py4J exceptions can begin with blank lines — take the first
        # non-empty line so a failure never reads as an empty (== ok) error
        lines = [ln for ln in str(e).splitlines() if ln.strip()]
        return (lines[0] if lines else "parse error")[:200]


def validate_statements_multi(
    spark, sql_text: str, dialects: tuple[str, ...] = ("spark", "duckdb")
) -> list[dict]:
    """Per-dialect parse report with fallback-chain semantics — the
    reference validates emitted SQL under sqlglot's ansi→hive→spark→
    presto→postgres chain (``scripts/flinksql_from_sttm_v4_5.py:57-66``)
    and records which dialect accepted each statement; this reproduces
    that report column with the two real parsers available in-process.
    One record per statement: {statement, ok, dialect, <d>_ok, <d>_error
    per dialect}; ``dialect`` is the FIRST accepting dialect in chain
    order, '' if none."""
    report = []
    for stmt in [s.strip() for s in sql_text.split(";") if s.strip()]:
        rec: dict = {"statement": stmt.splitlines()[0][:80]}
        accepted = ""
        for d in dialects:
            err = _parse_error(spark, d, stmt)
            rec[f"{d}_ok"] = not err
            rec[f"{d}_error"] = err
            if not err and not accepted:
                accepted = d
        rec["ok"] = bool(accepted)
        rec["dialect"] = accepted
        report.append(rec)
    return report
