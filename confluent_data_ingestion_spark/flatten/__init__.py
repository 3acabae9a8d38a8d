from .compiled import flatten_with_schema
from .flattener import flatten_df, flatten_json, schema_manifest

__all__ = ["flatten_json", "flatten_df", "flatten_with_schema", "schema_manifest"]
