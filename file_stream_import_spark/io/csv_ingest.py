"""CSV ingestion — the reference's streaming CSV scan + header projection
(O1+O2) as Spark readers.

Reference behavior (internal/writer/writer.go:47-48, 74-99):
  * RFC-4180 CSV parsed record-at-a-time from a byte stream.
  * The header row builds a name→position map, so COLUMN ORDER MUST NOT
    MATTER; fields are extracted by header name (LOCID, LOCTIMEZONE,
    COUNTRY, LOCNAME, BUSINESS).
  * All values are strings; no type inference (model.go:5-12).
  * Deliberate deviation: a missing header in the reference silently
    mis-reads column 0 (writer.go:93-99 with a zero-value map hit) — we
    raise instead (SURVEY.md §1.3 flags this as a latent bug).

Scale: ``spark.read.csv`` splits large files by byte ranges, so one
100 GB CSV parses in parallel; the streaming variant watches a drop
directory (replacing the reference's HTTP push, SURVEY.md O10) with
``maxFilesPerTrigger`` for backpressure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOCATION_COLUMNS = ("locid", "loctimezone", "country", "locname", "business")

LOCATION_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in LOCATION_COLUMNS]
)


def ingest_locations_csv(
    spark: SparkSession, path: str, multiline: bool = False
) -> DataFrame:
    """Read a locations CSV with header-order independence (O1+O2).

    Returns the canonical 5 payload columns, lower-cased, all strings.
    Raises ValueError on missing headers instead of silently mis-reading.

    RFC-4180 parity with the reference's Go ``encoding/csv`` reader
    (writer.go:48): quotes are escaped by DOUBLING inside quoted fields,
    so ``escape`` is set to ``"`` (Spark's default ``\\`` is not 4180).
    ``multiline=True`` additionally allows embedded newlines in quoted
    fields — correct but unsplittable (one task per file), so leave it
    off unless the data needs it; at 100 TB prefer line-safe exports.
    """
    raw = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", multiline)
        .csv(path)
    )
    by_upper = {c.upper(): c for c in raw.columns}
    missing = [c for c in LOCATION_COLUMNS if c.upper() not in by_upper]
    if missing:
        raise ValueError(
            f"CSV at {path} is missing required headers {missing}; "
            f"found {list(raw.columns)}"
        )
    return raw.select(
        *[F.col(by_upper[c.upper()]).alias(c) for c in LOCATION_COLUMNS]
    )


def ingest_locations_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    """Streaming variant: watch a directory for CSV drops (replaces the
    reference's HTTP POST /process ingest, writer.go:40-129).

    Structured Streaming requires a fixed schema (no per-file header
    remapping); files must use the canonical column order. Pair with
    ``writeStream.foreachBatch`` + ``merge_upsert`` for the full O5 path.
    """
    return (
        spark.readStream.option("header", True)
        .schema(LOCATION_SCHEMA)
        .option("maxFilesPerTrigger", 10)
        .csv(drop_dir)
    )
