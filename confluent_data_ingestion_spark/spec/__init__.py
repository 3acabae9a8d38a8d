from .detect import detect_spec_format, load_any_spec
from .models import MappingRow, PipelineSpec, load_spec
from .validate import validate_spec

__all__ = [
    "MappingRow",
    "PipelineSpec",
    "load_spec",
    "validate_spec",
    "detect_spec_format",
    "load_any_spec",
]
