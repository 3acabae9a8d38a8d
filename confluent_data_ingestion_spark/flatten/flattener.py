"""Nested-JSON -> relational rows with lineage (the reference's flattener
side-tool, re-expressed for Spark).

Semantics verified against the reference's golden pair
(``resources/json-flattener-input.json`` -> ``resources/rows.ndjson``;
behavior spec ``scripts/json_flattener_v2.py:123-208``):

 - Only ARRAYS produce rows (a document without arrays yields none).
 - Scalars on each dict along the path inherit downward into every row below
   them, prefixed with the underscore-joined path ("scoped inheritance" —
   sibling branches never leak).
 - Array of scalars: one row per element; the value lands in a column named
   by the full path; tableName = that path.
 - Array of dicts: the element's own scalars form a parent row (emitted only
   if it has scalars, or ``emit_empty_parent`` and it has nested children)
   and inherit into the element's nested arrays/dicts, whose rows carry
   ``_parent_id`` = the parent row's ``_row_id``.
 - List-of-lists: inner lists expand recursively at the same table name with
   the element index appended to the JSON-pointer path.
 - Lineage columns: tableName, _row_id (1-based emit order), _parent_id,
   _path (JSON pointer), _elem_index, _depth (nesting segments).
 - Guards: max_depth prunes traversal; max_rows stops emission; max_cols
   trims non-lineage columns.

Spark mapping: one document is one row of a payload column; ``flatten_df``
runs the per-document flatten inside ``mapInPandas`` (Arrow-batched, no
per-row Python UDF calls), emitting lineage columns plus the row payload as
a JSON string.  Row ids are scoped PER DOCUMENT — a global counter cannot
exist in a distributed run; (doc key, _row_id) is the stable lineage key.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any


def _is_scalar(v: Any) -> bool:
    return not isinstance(v, (dict, list))


def flatten_json(
    doc: Any,
    joiner: str = "_",
    max_depth: int | None = None,
    max_rows: int | None = None,
    max_cols: int | None = None,
    emit_empty_parent: bool = False,
    numeric_to_float: bool = False,
) -> list[dict[str, Any]]:
    """Flatten one parsed JSON document into a list of row dicts."""
    rows: list[dict[str, Any]] = []
    counter = {"n": 0}
    meta_keys = {"tableName", "_row_id", "_parent_id", "_path", "_elem_index", "_depth"}

    def conv(v: Any) -> Any:
        if numeric_to_float and isinstance(v, int) and not isinstance(v, bool):
            return float(v)
        return v

    def own_scalars(d: dict, path: str) -> dict[str, Any]:
        pfx = f"{path}{joiner}" if path else ""
        return {f"{pfx}{k}": v for k, v in d.items() if _is_scalar(v)}

    def emit(row: dict[str, Any]) -> int | None:
        if max_rows is not None and len(rows) >= max_rows:
            return None
        if max_cols is not None and len(row) > max_cols:
            data_keys = [k for k in row if k not in meta_keys]
            keep_n = max(0, max_cols - len(meta_keys))
            kept = set(data_keys[:keep_n]) | meta_keys
            row = {k: v for k, v in row.items() if k in kept}
        rows.append(row)
        return row["_row_id"]

    def new_row(table: str, ptr: str, inherited: dict, idx: int, depth: int,
                parent: int | None) -> dict[str, Any]:
        counter["n"] += 1
        row = dict(inherited)
        row["tableName"] = table
        row["_elem_index"] = idx
        row["_depth"] = depth
        row["_row_id"] = counter["n"]
        row["_parent_id"] = parent
        row["_path"] = ptr or "/"
        return row

    def walk_dict(node: dict, path: str, ptr: str, depth: int,
                  inherited: dict, parent: int | None) -> None:
        if max_depth is not None and depth > max_depth:
            return
        inherited = {**inherited, **{k: conv(v) for k, v in own_scalars(node, path).items()}}
        for k, v in node.items():
            if _is_scalar(v):
                continue
            child_path = f"{path}{joiner}{k}" if path else k
            child_ptr = f"{ptr}/{k}"
            if isinstance(v, dict):
                walk_dict(v, child_path, child_ptr, depth + 1, inherited, parent)
            else:
                walk_list(v, child_path, child_ptr, depth + 1, inherited, parent)

    def walk_list(arr: list, path: str, ptr: str, depth: int,
                  inherited: dict, parent: int | None) -> None:
        if max_depth is not None and depth > max_depth:
            return
        for i, el in enumerate(arr):
            elem_ptr = f"{ptr}/{i}"
            if _is_scalar(el):
                row = new_row(path, elem_ptr, inherited, i, depth, parent)
                row[path] = conv(el)
                emit(row)
            elif isinstance(el, dict):
                scalars = {k: conv(v) for k, v in own_scalars(el, path).items()}
                nested = {k: v for k, v in el.items() if not _is_scalar(v)}
                has_children = bool(nested)
                elem_parent = parent
                if scalars or (emit_empty_parent and has_children):
                    row = new_row(path, elem_ptr, {**inherited, **scalars}, i, depth, parent)
                    rid = emit(row)
                    if rid is not None:
                        elem_parent = rid
                next_inherited = {**inherited, **scalars}
                for k, v in nested.items():
                    child_path = f"{path}{joiner}{k}"
                    child_ptr = f"{elem_ptr}/{k}"
                    if isinstance(v, list):
                        walk_list(v, child_path, child_ptr, depth + 1,
                                  next_inherited, elem_parent)
                    else:
                        walk_dict(v, child_path, child_ptr, depth + 1,
                                  next_inherited, elem_parent)
            else:  # list-of-lists
                walk_list(el, path, elem_ptr, depth + 1, inherited, parent)

    if isinstance(doc, dict):
        walk_dict(doc, "", "", 0, {}, None)
    elif isinstance(doc, list):
        walk_list(doc, "", "", 1, {}, None)
    return rows


def schema_manifest(rows_by_doc: list[list[dict[str, Any]]]) -> dict[str, Any]:
    """Observed columns + python types per emitted tableName (manifest parity
    with the reference's --schema-out)."""
    cols: dict[str, set] = {}
    types: dict[str, dict[str, set]] = {}
    for rows in rows_by_doc:
        for row in rows:
            t = row["tableName"]
            cols.setdefault(t, set())
            types.setdefault(t, {})
            for k, v in row.items():
                cols[t].add(k)
                types[t].setdefault(k, set()).add(type(v).__name__)
    return {
        t: {
            "columns": sorted(cs),
            "types": {c: sorted(types[t][c]) for c in sorted(cs)},
        }
        for t, cs in cols.items()
    }


FLATTEN_SCHEMA = (
    "doc_key string, tableName string, _row_id long, _parent_id long, "
    "_path string, _elem_index int, _depth int, row_json string"
)


def flatten_df(
    df,
    payload_col: str = "val",
    key_col: str | None = None,
    **flatten_opts,
):
    """Distributed flatten: each row's ``payload_col`` JSON document becomes
    0..n flattened rows.

    Output columns: doc_key (from ``key_col`` or the payload's partition
    offset), lineage columns, and ``row_json`` — the full flattened row
    (including inherited scalars) as a JSON string, queryable downstream via
    ``get_json_object``/``from_json`` once a per-table schema is chosen.

    Runs as mapInPandas (Arrow batches); malformed documents yield no rows.
    Scale: embarrassingly parallel, no shuffle, no driver involvement.
    """
    import pandas as pd

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_key": [], "tableName": [], "_row_id": [], "_parent_id": [],
                "_path": [], "_elem_index": [], "_depth": [], "row_json": [],
            }
            # materialize columns once; per-row .iloc dominates otherwise
            payloads = pdf[payload_col].tolist()
            keys = (
                [str(k) for k in pdf[key_col].tolist()]
                if key_col else [str(i) for i in range(len(pdf))]
            )
            for key, raw in zip(keys, payloads):
                if raw is None:
                    continue
                try:
                    doc = json.loads(raw)
                except (ValueError, TypeError):
                    continue
                for row in flatten_json(doc, **flatten_opts):
                    out["doc_key"].append(key)
                    out["tableName"].append(row["tableName"])
                    out["_row_id"].append(row["_row_id"])
                    out["_parent_id"].append(row["_parent_id"])
                    out["_path"].append(row["_path"])
                    out["_elem_index"].append(row["_elem_index"])
                    out["_depth"].append(row["_depth"])
                    out["row_json"].append(json.dumps(row, ensure_ascii=False))
            yield pd.DataFrame(out)

    return df.mapInPandas(process, schema=FLATTEN_SCHEMA)
