"""Typed per-table extraction after a discovery flatten.

Completes the reference flattener's ``--schema-out`` workflow
(``scripts/json_flattener_v2.py:285-296``): the discovery pass
(``flatten_df``) emits lineage columns plus ``row_json``; this module turns
the observed (table, column, type) manifest into per-table DataFrames with
REAL column types — the step the reference leaves to the user.

Spark mapping:
 - ``discover_manifest``: one Arrow-batched pass over ``row_json`` emitting
   (tableName, column, pytype) triples, reduced by ``collect_set`` — the
   collected result is schema metadata (#tables x #columns rows), the same
   driver-side footprint as ``spark.read.json`` schema inference, never
   data.
 - ``extract_tables``: per table, a pure-JVM ``from_json`` against the
   manifest-derived StructType — typed columns, whole-stage codegen, no
   Python in the data path.

Type widening: {int} -> bigint, {int,float} -> double, {bool} -> boolean,
anything involving strings or mixed scalar kinds -> string (the JSON value
re-rendered verbatim).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .flattener import FLATTEN_SCHEMA  # noqa: F401  (shape documented there)

META_COLS = ("tableName", "_row_id", "_parent_id", "_path", "_elem_index",
             "_depth")


def spark_type_for(pytypes: set[str]) -> str:
    """Observed python type names -> widened Spark SQL type string."""
    t = {p for p in pytypes if p != "NoneType"}
    if not t:
        return "string"
    if t == {"bool"}:
        return "boolean"
    if t == {"int"}:
        return "bigint"
    if t <= {"int", "float"}:
        return "double"
    return "string"


def discover_manifest(flat_df: DataFrame) -> dict[str, dict[str, Any]]:
    """Distributed schema discovery over a ``flatten_df`` output: the same
    manifest shape as :func:`..flatten.schema_manifest` (tables -> observed
    columns + python type names), computed with one Arrow-batched scan +
    a collect_set aggregation."""
    import pandas as pd

    def types(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import json

        for pdf in batches:
            tabs, cols, pts = [], [], []
            for table, raw in zip(pdf["tableName"].tolist(),
                                  pdf["row_json"].tolist()):
                for k, v in json.loads(raw).items():
                    tabs.append(table)
                    cols.append(k)
                    pts.append(type(v).__name__)
            yield pd.DataFrame({"tableName": tabs, "column": cols, "pytype": pts})

    triples = (
        flat_df.select("tableName", "row_json")
        .mapInPandas(types, schema="tableName string, column string, pytype string")
        .groupBy("tableName", "column")
        .agg(F.collect_set("pytype").alias("pytypes"))
        .collect()  # schema metadata only: #tables x #columns rows
    )
    manifest: dict[str, dict[str, Any]] = {}
    for r in triples:
        m = manifest.setdefault(r["tableName"], {"columns": [], "types": {}})
        m["columns"].append(r["column"])
        m["types"][r["column"]] = sorted(r["pytypes"])
    for m in manifest.values():
        m["columns"] = sorted(m["columns"])
        m["types"] = {c: m["types"][c] for c in m["columns"]}
    return manifest


def manifest_schema(table_manifest: dict[str, Any]) -> StructType:
    """Manifest entry for one table -> StructType over its DATA columns
    (lineage/meta columns excluded — they are real columns already)."""
    parts = [
        f"`{c}` {spark_type_for(set(table_manifest['types'].get(c, ())))}"
        for c in table_manifest["columns"]
        if c not in META_COLS
    ]
    return StructType.fromDDL(", ".join(parts))


def extract_tables(
    flat_df: DataFrame,
    manifest: dict[str, dict[str, Any]] | None = None,
) -> dict[str, DataFrame]:
    """Discovery-flatten output -> {tableName: typed DataFrame}.

    Each table keeps ``doc_key`` + the lineage columns and gains its data
    columns with manifest types via ``from_json`` (JVM-side; rows missing a
    column yield NULL).  Pass a ``schema_manifest``/``discover_manifest``
    result to skip re-discovery."""
    manifest = manifest if manifest is not None else discover_manifest(flat_df)
    out: dict[str, DataFrame] = {}
    for table, tman in manifest.items():
        schema = manifest_schema(tman)
        out[table] = (
            flat_df.filter(F.col("tableName") == table)
            .select(
                "doc_key", *META_COLS,
                F.from_json(F.col("row_json"), schema).alias("__d__"),
            )
            .select("doc_key", *META_COLS, "__d__.*")
        )
    return out
