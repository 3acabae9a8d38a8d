from .render import (
    emit_bundle,
    emit_yaml_bundles,
    render_insert_sql,
    render_table_ddl,
    render_view_sql,
    render_xref_insert,
    validate_statements,
    validate_statements_multi,
)

__all__ = [
    "emit_bundle",
    "emit_yaml_bundles",
    "render_view_sql",
    "render_table_ddl",
    "render_xref_insert",
    "render_insert_sql",
    "validate_statements",
    "validate_statements_multi",
]
