"""Workbook format auto-detection: one entry point for both STTM dialects.

The reference UI sniffs the uploaded sheet's headers to route between its
generators (``sttm2flink-ui-5_4/sttm2flink/generator.py:33-39``): normalized
column names containing ``target_table``/``target_column`` mean the
v3/v4.5 "column-spec" format, otherwise the row-per-table mapping.  This
module ports that routing to the repo's two loaders:

 - ``mapping`` (v21/v22 row-per-target-column, ``PipelineStage`` header)
   -> :func:`..spec.load_spec` -> :class:`PipelineSpec`
 - ``column-spec`` (v3/v4.5, spaced ``Target Table`` headers + Config
   sheet) -> :func:`..spec.colspec.load_colspec` -> :class:`ColSpec`

Detection precedence: an ``STTM_Mapping`` sheet name is decisive (the v22
template's fixed layout), then normalized headers — ``pipelinestage`` or
``targettable`` (unspaced CamelCase headers) means mapping,
``target_table`` + ``target_column`` (spaced headers) means column-spec,
default column-spec like the reference.
"""

from __future__ import annotations

import re
from typing import Any

from .colspec import ColSpec, load_colspec
from .models import PipelineSpec, load_spec


def _norm(h: Any) -> str:
    return re.sub(r"\s+", "_", str(h).strip().lower())


def detect_spec_format(headers) -> str:
    """'mapping' (v21/v22 PipelineStage rows) or 'column-spec' (v3/v4.5)."""
    cols = {_norm(h) for h in headers}
    if "pipelinestage" in cols or "pipeline_stage" in cols:
        return "mapping"
    if {"target_table", "target_column"} <= cols:
        return "column-spec"
    if {"targettable", "targetcolumn"} <= cols:
        return "mapping"
    return "column-spec"


def load_any_spec(
    src: list[dict[str, Any]] | str, **opts: Any
) -> PipelineSpec | ColSpec:
    """Load either STTM dialect from row dicts, a CSV path, or an .xlsx
    path, routing by :func:`detect_spec_format`.  Returns the loader's
    native spec object (dispatch on type, or feed to the matching
    ``plans.compile_pipeline`` / ``plans.compile_colspec``)."""
    if isinstance(src, str):
        if src.endswith(".xlsx"):
            from . import xlsx

            names = xlsx.sheet_names(src)
            if "STTM_Mapping" in names:
                return load_spec(src, **opts)
            sheet = "STTM" if "STTM" in names else names[0]
            records = xlsx.read_records(src, sheet)
            headers = records[0].keys() if records else []
        else:
            # CSV: decode once with encoding sniffing (reference UI accepts
            # chardet-sniffed CSV STTMs) and route the records directly.
            from .csvio import read_csv_records

            src = read_csv_records(src)
            headers = src[0].keys() if src else []
    else:
        headers = src[0].keys() if src else []
    if detect_spec_format(headers) == "mapping":
        return load_spec(src, **opts)
    return load_colspec(src, **opts)
