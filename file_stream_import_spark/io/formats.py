"""Columnar and raw-text formats beyond parquet/CSV/JSONL.

ORC: Spark's second built-in columnar format — same vectorized reader,
predicate pushdown (including Bloom filters when written), and partition
layout semantics as parquet, so a deployment standardized on ORC (Hive
shops) gets the identical plan properties. Avro is NOT wired: the
spark-avro module isn't on this container's classpath; `read_avro` below
fails fast with the standard deploy instruction rather than stubbing.

Raw text: `.txt` shard ingestion for training-data pipelines — one row
per line with the source file attached, the entry point that feeds the
documents-table operators (dedup / quality / language-ID). Splittable by
byte range exactly like CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink; optional hive-style partition directories (same pruning
    semantics as io/layout.py's parquet layout)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — vectorized, with filter pushdown and column pruning
    (asserted in tests/test_layout.py, same contract as the parquet
    plan tests)."""
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Explicitly unsupported here: spark-avro is an external module not
    present on this container. Fails fast with the standard remedy."""
    raise NotImplementedError(
        "Avro requires the external spark-avro package "
        "(--packages org.apache.spark:spark-avro_2.13:<spark-version>); "
        "it is not on this container's classpath."
    )


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw text shards → (source_file, line_no, text) rows.

    line_no is the 0-based line index WITHIN its file: a window ordered
    by (block byte offset, read order) — blocks of a file sort by their
    offset, and monotonically_increasing_id preserves row order inside
    each scan partition, so the composite is the file's true line order.
    No RDD zipWithIndex (which would force an extra job and a driver
    barrier). At 100 TB the window shuffles on file name; shard sizes
    (100s of MB) keep partitions bounded, and the common pipeline drops
    line_no after assembling documents anyway.
    """
    from pyspark.sql import Window as W

    lines = spark.read.text(path).select(
        F.col("_metadata.file_path").alias("source_file"),
        F.col("_metadata.file_block_start").alias("_blk"),
        F.monotonically_increasing_id().alias("_ri"),
        F.col("value").alias("text"),
    )
    w = W.partitionBy("source_file").orderBy("_blk", "_ri")
    return lines.select(
        "source_file",
        (F.row_number().over(w) - 1).cast("bigint").alias("line_no"),
        "text",
    )
