from .pipeline import DumpPipeline, RestorePipeline  # noqa: F401
