from .compiler import PipelineCompiler, compile_pipeline

__all__ = ["PipelineCompiler", "compile_pipeline"]
