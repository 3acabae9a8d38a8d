from .compiled import flatten_with_schema
from .extract import discover_manifest, extract_tables, manifest_schema
from .flattener import flatten_df, flatten_json, schema_manifest

__all__ = [
    "flatten_json",
    "flatten_df",
    "flatten_with_schema",
    "schema_manifest",
    "discover_manifest",
    "extract_tables",
    "manifest_schema",
]
