"""Pipeline-spec (STTM) data model.

Mirrors the reference's v22 row-per-target-column mapping sheet
(``resources/STTM_v22.xlsx`` sheet STTM_Mapping; header normalization
``scripts/sttm_to_flink_v22.py:28-33``) as pydantic models, plus the
per-table physical-properties matrix (Config_TableMatrix,
``scripts/sttm_to_flink_v22.py:161-214``) with ``${table_name}`` macro
expansion.

Input formats: list-of-dicts (canonical, programmatic), CSV (pandas), and
Excel when an engine is available (gated import — openpyxl is optional).
"""

from __future__ import annotations

from typing import Any, Optional

from pydantic import AliasChoices, BaseModel, Field, field_validator

STAGES = ("VIEW", "XREF", "FGAC", "QUARANTINE")


class MappingRow(BaseModel):
    pipeline_stage: str = Field(alias="PipelineStage")
    target_table: str = Field(alias="TargetTable")
    target_column: str = Field(alias="TargetColumn")
    target_data_type: str = Field(default="STRING", alias="TargetDataType")
    is_target_pk: bool = Field(default=False, alias="IsTargetPK")
    # v22 workbooks use SourcePrimaryTable/SourcePrimaryAlias; programmatic
    # specs use SourceTable/SourceAlias — both accepted
    source_table: Optional[str] = Field(
        default=None,
        validation_alias=AliasChoices("SourceTable", "SourcePrimaryTable",
                                      "source_table"))
    source_alias: Optional[str] = Field(
        default=None,
        validation_alias=AliasChoices("SourceAlias", "SourcePrimaryAlias",
                                      "source_alias"))
    # JSON views: SourceField is the payload field name (FieldSelector then
    # holds the payload column); CSV views: FieldSelector is the position
    source_field: Optional[str] = Field(default=None, alias="SourceField")
    message_format: str = Field(default="JSON", alias="MessageFormat")
    field_selector: Optional[str] = Field(default=None, alias="FieldSelector")
    source_transform_expr: Optional[str] = Field(default=None, alias="SourceTransformExpr")
    expr_override: Optional[str] = Field(default=None, alias="ExprOverride")
    filter_predicate: Optional[str] = Field(default=None, alias="FilterPredicate")
    join_table: Optional[str] = Field(default=None, alias="JoinTable")
    join_alias: Optional[str] = Field(default=None, alias="JoinAlias")
    join_type: Optional[str] = Field(default=None, alias="JoinType")
    join_condition: Optional[str] = Field(default=None, alias="JoinCondition")
    # XREF dedup spec (reference sttm-requirements.md:66-84, columns 13-17)
    order_by_fields: Optional[str] = Field(default=None, alias="OrderByFields")
    delete_flag_field: Optional[str] = Field(default=None, alias="DeleteFlagField")
    delete_flag_values: Optional[str] = Field(default=None, alias="DeleteFlagValues")

    model_config = {"populate_by_name": True}

    @field_validator("is_target_pk", mode="before")
    @classmethod
    def _pk_flag(cls, v: Any) -> bool:
        if isinstance(v, bool):
            return v
        return str(v or "").strip().upper() in ("Y", "YES", "TRUE", "1")

    @field_validator("pipeline_stage", mode="before")
    @classmethod
    def _stage(cls, v: Any) -> str:
        return str(v or "").strip().upper()

    @field_validator(
        "target_table", "target_column", "source_table", "field_selector",
        "source_field", "source_alias",
        "source_transform_expr", "expr_override", "filter_predicate",
        "join_table", "join_alias", "join_type", "join_condition",
        "order_by_fields", "delete_flag_field", "delete_flag_values",
        mode="before",
    )
    @classmethod
    def _trim(cls, v: Any) -> Any:
        if v is None:
            return None
        s = str(v).strip()
        return s if s and s.lower() != "nan" else None


class PipelineSpec(BaseModel):
    rows: list[MappingRow]
    table_matrix: dict[str, dict[str, str]] = Field(default_factory=dict)
    payload_col: str = "val"
    csv_delimiter: str = ","
    raw_table: str = "raw"
    # target columns with no mapped expression: 'null' (v4.5/UI behavior,
    # NULL literal) or 'passthrough' (v22 behavior, select the same-named
    # source column)
    unmapped_policy: str = "null"

    def tables(self) -> dict[str, list[MappingRow]]:
        """Rows grouped by target table, in deterministic emit order:
        stage (VIEW < XREF < FGAC < QUARANTINE) -> table -> PK-first."""
        stage_rank = {s: i for i, s in enumerate(STAGES)}
        ordered = sorted(
            self.rows,
            key=lambda r: (
                stage_rank.get(r.pipeline_stage, 99),
                r.target_table,
                not r.is_target_pk,
            ),
        )
        out: dict[str, list[MappingRow]] = {}
        for r in ordered:
            out.setdefault(r.target_table, []).append(r)
        return out

    def stage_of(self, table: str) -> str:
        for r in self.rows:
            if r.target_table == table:
                return r.pipeline_stage
        raise KeyError(table)

    def props_for(self, table: str) -> dict[str, str]:
        """Matrix column for a table with ${table_name} macro expansion.

        v21 parity quirk (``scripts/sttm_to_flink_v21.py:256-259``): an
        ``XREF_*`` table with no explicit ``changelog.mode`` gets
        ``changelog.mode=upsert`` added — XREF tables are upsert
        changelogs by construction, so the generator never lets a BA omit
        the property.  An explicit value is always respected (validation
        then errors on non-upsert)."""
        raw = self.table_matrix.get(table, {})
        props = {
            k: v.replace("${table_name}", table) if isinstance(v, str) else v
            for k, v in raw.items()
        }
        if table.upper().startswith("XREF_") and "changelog.mode" not in props:
            props["changelog.mode"] = "upsert"
        return props


def load_spec(
    rows: list[dict[str, Any]] | str,
    table_matrix: dict[str, dict[str, str]] | None = None,
    **opts: Any,
) -> PipelineSpec:
    """Build a PipelineSpec from a list of row dicts, a CSV path, or an
    .xlsx path (read with the built-in dependency-free reader; sheet
    fallback STTM_Mapping -> STTM -> first, like the reference generator).

    When loading a workbook, the Config_TableMatrix sheet (if present) is
    loaded automatically ('na'/'n/a'/'none' cells skipped, reference
    ``scripts/sttm_validations_v22.py:30-64``) and the unmapped-column
    policy defaults to the v22 'passthrough' behavior.
    """
    if isinstance(rows, str):
        if rows.endswith(".xlsx"):
            from . import xlsx

            names = xlsx.sheet_names(rows)
            sheet = next(
                (s for s in ("STTM_Mapping", "STTM") if s in names), names[0]
            )
            records = xlsx.read_records(rows, sheet)
            if table_matrix is None and "Config_TableMatrix" in names:
                table_matrix = _matrix_from_grid(xlsx.read_sheet(rows, "Config_TableMatrix"))
            opts.setdefault("unmapped_policy", "passthrough")
            rows = records
        else:
            from .csvio import read_csv_records

            rows = read_csv_records(rows)
    return PipelineSpec(
        rows=[MappingRow(**r) for r in rows],
        table_matrix=table_matrix or {},
        **opts,
    )


def _matrix_from_grid(grid: list[list]) -> dict[str, dict[str, str]]:
    """Config_TableMatrix grid (Key x table columns) -> per-table props."""
    if not grid:
        return {}
    headers = [str(h).strip() if h is not None else "" for h in grid[0]]
    if not headers or headers[0].lower() != "key":
        return {}
    per_table: dict[str, dict[str, str]] = {}
    for row in grid[1:]:
        if not row:
            continue
        key = str(row[0]).strip() if row[0] is not None else ""
        if not key:
            continue
        for tcol, val in zip(headers[1:], row[1:]):
            v = str(val).strip() if val is not None else ""
            if not tcol or not v or v.lower() in {"na", "n/a", "none"}:
                continue
            per_table.setdefault(tcol, {})[key] = v
    return per_table
