from .colspec_compiler import compile_colspec, compile_colspec_views
from .compiler import PipelineCompiler, compile_pipeline

__all__ = [
    "PipelineCompiler",
    "compile_pipeline",
    "compile_colspec",
    "compile_colspec_views",
]
