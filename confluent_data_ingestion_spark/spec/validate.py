"""Spec validation rules (fresh implementation of the checks the reference
applies before generating SQL: ``scripts/sttm_validations_v22.py:77-219``).

Each issue is (severity, table, message); severity in {ERROR, WARN}.
ERRORs should block compilation; WARNs are advisory.
"""

from __future__ import annotations

import csv
import re

from .models import STAGES, PipelineSpec

Issue = tuple[str, str, str]


def validate_spec(spec: PipelineSpec) -> list[Issue]:
    issues: list[Issue] = []
    tables = spec.tables()

    seen_cols: set[tuple[str, str]] = set()
    for r in spec.rows:
        key = (r.target_table, r.target_column)
        if key in seen_cols:
            issues.append(("ERROR", r.target_table,
                           f"duplicate target column '{r.target_column}'"))
        seen_cols.add(key)
        if r.pipeline_stage not in STAGES:
            issues.append(("ERROR", r.target_table,
                           f"unknown pipeline stage '{r.pipeline_stage}'"))
        if r.join_condition and not r.join_table:
            issues.append(("WARN", r.target_table,
                           "JoinCondition without JoinTable is ignored"))
        if r.filter_predicate and r.filter_predicate.rstrip().endswith(";"):
            issues.append(("WARN", r.target_table,
                           "FilterPredicate has a trailing ';' (stripped)"))

    for table, rows in tables.items():
        stage = rows[0].pipeline_stage
        fmt = (rows[0].message_format or "JSON").upper()
        pks = [r for r in rows if r.is_target_pk]

        if stage in ("XREF", "FGAC") and not pks:
            issues.append(("ERROR", table, f"{stage} table has no IsTargetPK column"))

        if stage != "VIEW" and not rows[0].source_table:
            issues.append(("ERROR", table,
                           f"{stage} table has no driving source table"))

        if stage == "VIEW":
            for r in rows:
                sel = r.field_selector
                if sel is None or r.expr_override or r.source_transform_expr:
                    continue
                if fmt == "CSV" and not re.fullmatch(r"\d+", sel):
                    issues.append(("ERROR", table,
                                   f"CSV FieldSelector for '{r.target_column}' "
                                   f"must be a non-negative integer, got '{sel}'"))
                if fmt == "JSON" and re.fullmatch(r"\d+", sel):
                    issues.append(("WARN", table,
                                   f"numeric FieldSelector '{sel}' in a JSON view "
                                   f"('{r.target_column}') — did you mean CSV?"))
            src = {r.source_table for r in rows if r.source_table}
            if len(src) > 1:
                issues.append(("ERROR", table,
                               f"VIEW reads from multiple source tables: {sorted(src)}"))

        if stage == "XREF":
            props = spec.props_for(table)
            mode = props.get("changelog.mode", "")
            if props and mode and mode != "upsert":
                issues.append(("ERROR", table,
                               f"XREF table must use changelog.mode=upsert, got '{mode}'"))
            if not any(r.order_by_fields for r in rows):
                issues.append(("WARN", table,
                               "XREF has no OrderByFields; dedup order will "
                               "fall back to arrival order"))

        filters = {r.filter_predicate for r in rows if r.filter_predicate}
        if stage != "VIEW" and len(filters) > 1:
            issues.append(("WARN", table,
                           f"multiple distinct FilterPredicates are AND-joined: "
                           f"{len(filters)} found"))

        joins = {(r.join_table, r.join_condition)
                 for r in rows if r.join_table and r.join_condition}
        if len(joins) > 1 and stage in ("XREF", "FGAC"):
            issues.append(("WARN", table,
                           "multiple join specs; only the first is applied "
                           "(single-lookup join semantics)"))

    for table, props in spec.table_matrix.items():
        if table not in tables:
            issues.append(("WARN", table, "matrix entry for unknown table"))
        for k in props:
            if not k.strip():
                issues.append(("WARN", table, "blank matrix property key"))

    return issues


def write_issues_csv(issues: list[Issue], path: str) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["severity", "table", "message"])
        w.writerows(issues)


def has_errors(issues: list[Issue]) -> bool:
    return any(sev == "ERROR" for sev, _, _ in issues)
