"""v3/v4.5 "column-spec" STTM format: one row per (source column -> target
column) mapping, plus a Config key/value sheet.

Mirrors the reference's first-generation generator input
(``scripts/flinksql_from_sttm_v4_5.py``; template
``resources/STTM_v3_template.xlsx`` sheets Config + STTM):

 - views: rows grouped by Source Table; view name =
   ``{view_prefix}{source_table}{view_suffix}`` (default ``hm_…_vw``);
   discriminator ``table_identifier_field`` (default ``$.tbl``) equals the
   source table name (``:79-110``).
 - targets: rows grouped by Target Table; arms by (Filter, JoinCondition)
   (``:187-189,252-258``); driving view = lowest Join Order; ordered join
   chain with right side inferred from ``…_vw`` references in the
   condition (``:206-244``); arms combined UNION ALL (``:288-292``).
"""

from __future__ import annotations

import re
from typing import Any, Optional

from pydantic import AliasChoices, BaseModel, Field, field_validator


def _snake(h: str) -> str:
    return re.sub(r"\s+", "_", str(h).strip().lower())


class ColSpecRow(BaseModel):
    source_table: Optional[str] = Field(
        default=None, validation_alias=AliasChoices("source_table", "Source Table"))
    source_column: Optional[str] = Field(
        default=None, validation_alias=AliasChoices("source_column", "Source Column"))
    data_type: Optional[str] = Field(
        default=None, validation_alias=AliasChoices("data_type", "Data Type"))
    target_table: str = Field(
        validation_alias=AliasChoices("target_table", "Target Table"))
    target_column: Optional[str] = Field(
        default=None, validation_alias=AliasChoices("target_column", "Target Column"))
    target_data_type: Optional[str] = Field(
        default=None, validation_alias=AliasChoices("target_data_type", "Target Data Type"))
    expression: Optional[str] = Field(
        default=None, validation_alias=AliasChoices("expression", "Expression"))
    filter: Optional[str] = Field(
        default=None, validation_alias=AliasChoices("filter", "Filter"))
    join_order: Optional[str] = Field(
        default=None, validation_alias=AliasChoices("join_order", "Join Order"))
    join_type: Optional[str] = Field(
        default=None, validation_alias=AliasChoices("join_type", "Join Type"))
    join_condition: Optional[str] = Field(
        default=None, validation_alias=AliasChoices("join_condition", "Join Condition"))

    @field_validator("*", mode="before")
    @classmethod
    def _trim(cls, v: Any) -> Any:
        if v is None:
            return None
        s = str(v).strip()
        return s if s and s.lower() != "nan" else None

    def join_order_int(self) -> int:
        try:
            return int(self.join_order)
        except (TypeError, ValueError):
            return 1_000_000


class ColSpec(BaseModel):
    rows: list[ColSpecRow]
    config: dict[str, str] = Field(default_factory=dict)

    @property
    def raw_table(self) -> str:
        return self.config.get("raw_table_name", "hm_db")

    @property
    def raw_col(self) -> str:
        return self.config.get("raw_value_column", "val")

    @property
    def table_identifier_field(self) -> str:
        return self.config.get("table_identifier_field", "$.tbl")

    @property
    def view_prefix(self) -> str:
        return self.config.get("view_prefix", "hm_")

    @property
    def view_suffix(self) -> str:
        return self.config.get("view_suffix", "_vw")

    def view_name(self, source_table: str) -> str:
        return f"{self.view_prefix}{source_table}{self.view_suffix}"

    def view_columns(self) -> dict[str, list[str]]:
        """source table -> distinct source columns, both in row order."""
        out: dict[str, list[str]] = {}
        for r in self.rows:
            if not r.source_table or not r.source_column:
                continue
            cols = out.setdefault(r.source_table, [])
            if r.source_column not in cols:
                cols.append(r.source_column)
        return out

    def targets(self) -> dict[str, list[ColSpecRow]]:
        out: dict[str, list[ColSpecRow]] = {}
        for r in self.rows:
            if r.target_table:
                out.setdefault(r.target_table, []).append(r)
        return out

    def with_props(self, table: str) -> dict[str, str]:
        """Sink WITH options: global target_with.* plus table-scoped
        with.<table>.* (reference ``flinksql_from_sttm_v4_5.py:120-141``)."""
        props: dict[str, str] = {}
        if "sink_value_format" in self.config:
            props["value.format"] = self.config["sink_value_format"]
        for k, v in self.config.items():
            if k.startswith("target_with."):
                props[k[len("target_with."):]] = v
        for k, v in self.config.items():
            scoped = f"with.{table}."
            if k.startswith(scoped):
                props[k[len(scoped):]] = v
        return props


def detect_format(records: list[dict]) -> str:
    """Auto-detect the mapping layout (reference UI generator
    ``sttm2flink-ui-5_4/sttm2flink/generator.py:33-39``): column-spec when
    Target Table/Target Column headers are present, row-per-table when
    schema/table headers are, else column-spec."""
    if not records:
        return "column-spec"
    cols = {_snake(k) for k in records[0].keys()}
    if {"target_table", "target_column"}.issubset(cols):
        return "column-spec"
    if {"schema", "table"}.issubset(cols):
        return "row-per-table"
    return "column-spec"


def row_per_table_ddl(records: list[dict], name_prefix: str = "") -> list[dict]:
    """Row-per-table layout -> one CREATE TABLE (all STRING columns) per
    row (reference ``generator.py:119-129``).  Returns
    [{schema, table, sql}] records."""
    out = []
    for i, rec in enumerate(records):
        get = {_snake(k): v for k, v in rec.items()}
        schema = str(get.get("schema") or "public").strip()
        table = str(get.get("table") or f"table_{i}").strip()
        cols = [k for k in rec.keys() if _snake(k) not in ("schema", "table")]
        body = ",\n  ".join(f"`{c}` STRING" for c in cols) or "`id` STRING"
        out.append({
            "schema": schema,
            "table": name_prefix + table,
            "sql": f"CREATE TABLE `{schema}`.`{name_prefix}{table}` (\n  {body}\n);",
        })
    return out


def load_colspec(
    rows: list[dict[str, Any]] | str,
    config: dict[str, str] | None = None,
) -> ColSpec:
    """Load from a list of row dicts or an .xlsx path (Config + STTM
    sheets, reading via the built-in dependency-free reader)."""
    if isinstance(rows, str):
        if rows.endswith(".xlsx"):
            from . import xlsx

            names = xlsx.sheet_names(rows)
            sheet = "STTM" if "STTM" in names else names[-1]
            records = xlsx.read_records(rows, sheet)
            if config is None and "Config" in names:
                config = {
                    rec.get("Key", ""): rec.get("Value", "")
                    for rec in xlsx.read_records(rows, "Config")
                    if rec.get("Key")
                }
            rows = records
        else:
            # CSV column-spec (no Config sheet: pass ``config`` explicitly),
            # encoding-sniffed like the reference UI's CSV upload path.
            from .csvio import read_csv_records

            rows = read_csv_records(rows)
    parsed = [
        ColSpecRow(**{_snake(k): v for k, v in r.items()}) for r in rows
    ]
    return ColSpec(rows=parsed, config=config or {})
