"""Source/sink connectors beyond parquet (JSONL — the LLM-corpus
interchange format)."""

from . import jsonl  # noqa: F401
