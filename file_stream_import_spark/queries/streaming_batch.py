"""Batch-equivalent forms of the streaming window queries (tumbling /
sliding / session windows) so the DuckDB oracle can check their semantics.
The true streaming forms live in file_stream_import_spark/streaming/."""

from __future__ import annotations
