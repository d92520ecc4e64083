from .transformers import TRANSFORMERS, transformer_sql, apply_transformers  # noqa: F401
