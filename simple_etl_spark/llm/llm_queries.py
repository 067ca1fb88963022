"""LLM-data-pipeline queries (filled in next)."""
