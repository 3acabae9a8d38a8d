from .flattener import flatten_df, flatten_json, schema_manifest

__all__ = ["flatten_json", "flatten_df", "schema_manifest"]
