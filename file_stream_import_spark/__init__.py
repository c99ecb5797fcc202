"""file_stream_import_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``elijah688/file-stream-import`` (a Go CSV→Postgres streaming importer with
paginated JSON reads) as an idiomatic Spark engine, widened per the project
north star with a full relational query surface and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns),
all designed for 100 TB scale.

Layout:
    session    — tuned SparkSession builder
    io         — sources/sinks: CSV ingest (reference O1/O2), parquet tables,
                 JDBC upsert sink (reference O5 parity)
    operators  — upsert, pagination, dedup family, similarity search,
                 text analysis, as-of/range joins, multimodal plumbing
    queries    — the registry consumed by __spark_entry__.py: named
                 (spark, sf_dir) -> DataFrame callables + DuckDB oracle SQL
    streaming  — Structured Streaming: windows, watermarks, sessionization
"""

__version__ = "0.1.0"
