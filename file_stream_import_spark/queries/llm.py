"""LLM-data-pipeline operators: dedup family, similarity search, text
analysis, multimodal columns. Populated incrementally; see operators/."""

from __future__ import annotations
