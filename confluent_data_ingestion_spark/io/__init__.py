from .connect_json import (
    load_connect_spec,
    normalize_connect_config,
    render_connect_json,
)
from .template import load_template_rows, make_connector_template
from .connectors import (
    SinkConnectorSpec,
    SourceConnectorSpec,
    compile_sink,
    compile_source,
    open_source,
    partition_cols_from_path_format,
    split_corrupt_json,
    with_time_partitions,
    write_sink,
)

__all__ = [
    "SourceConnectorSpec",
    "SinkConnectorSpec",
    "compile_source",
    "compile_sink",
    "open_source",
    "write_sink",
    "with_time_partitions",
    "partition_cols_from_path_format",
    "split_corrupt_json",
    "load_connect_spec",
    "normalize_connect_config",
    "render_connect_json",
    "make_connector_template",
    "load_template_rows",
]
