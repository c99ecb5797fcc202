"""JSON source/sink — the reference's wire format (model.go:6-11,
db.go:113-118) as a first-class table format.

The reference emits pages as a JSON array document built by Postgres
``json_agg`` and consumed by ``json.Unmarshal``. Distributed equivalents:

  * line-delimited JSON (one object per line) is the scalable at-rest
    form — splittable, appendable, schema-inferrable;
  * a single JSON array document (the reference's exact page shape) is a
    driver-side rendering of a BOUNDED page, never of a table.

Scale: JSONL reads split by byte range like CSV; schema inference scans
the data once, so pass an explicit schema in production paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write line-delimited JSON (the distributed form of O8's output)."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read line-delimited JSON; explicit schema skips the inference scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
