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
    """The JVM (vectorized, full-type-matrix) Avro path: unsupported
    here because spark-avro is an external module not on this
    container's classpath. Fails fast with the standard remedy — and
    points at the working fallback: io/avro_local.py reads real Avro
    container files (records of primitives, nullable unions,
    date/timestamp-micros; null+deflate codecs) through a stdlib codec
    whose spec compliance is proven BOTH directions against the
    reference Java implementation in tests/test_layout.py."""
    raise NotImplementedError(
        "JVM Avro requires the external spark-avro package "
        "(--packages org.apache.spark:spark-avro_2.13:<spark-version>); "
        "it is not on this container's classpath. For common record "
        "shapes use spark.read.format('avro_local') after "
        "spark.dataSource.register(io.avro_local.AvroLocalDataSource)."
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


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (Spark 4 built-in, the former Databricks spark-xml
    merged upstream): one element per row under ``root_tag``."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema=None,
) -> DataFrame:
    """XML scan. Pass an explicit ``schema`` in production: inference
    costs a full extra pass over the data (same rule as JSON/CSV), and
    XML's text-only leaves otherwise all infer as permissive types.
    Splittability caveat vs the columnar formats: one XML FILE is one
    input split (the parser can't start mid-document), so shard size —
    not block size — bounds parallelism; keep shards in the 100s of MB
    like the reference's CSV chunks (writer.go chunking)."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file scan (built-in ``binaryFile`` source): one row per
    file — (path, modificationTime, length, content) — THE ingestion
    path for multimodal payloads (images/audio/video as opaque bytes):
    feed ``content`` straight into operators/multimodal.py's
    Arrow-batched kernels. Reads are lazy per file and column-pruned
    (selecting only ``length`` never loads content); pair with
    spark.sql.files.maxPartitionBytes so a partition of media files
    fits executor memory at 100 TB."""
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
