"""Physical table layout: partitioned + sorted parquet sinks.

The reference accelerates reads with a B-tree index per payload column
(internal/db/db.go:97-103). A distributed columnar store has no secondary
indexes; the equivalents are
  * hive-style partition directories  → partition PRUNING (directories
    never listed, let alone read) for equality/IN predicates on the
    partition column;
  * sortWithinPartitions before write → tight parquet row-group min/max
    bounds on the sort column, so row-group SKIPPING approximates a
    clustered index for range predicates;
  * column statistics in footers      → free predicate pushdown on every
    column, the analog of "index everything" without write amplification.

Scale: choose the partition column by (a) query predicates, (b) bounded
cardinality — a 100 TB table partitioned by a 1M-cardinality key makes
1M tiny directories and kills the driver's file listing; date or
low-cardinality enums are right, high-cardinality keys belong in the
sort order instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str],
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_by``; within each
    partition, rows are clustered on ``sort_by`` for row-group skipping."""
    pcols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    out = df
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        # repartition on the partition columns first so each output dir is
        # written by few tasks (fewer, larger files), then cluster
        out = df.repartition(*pcols).sortWithinPartitions(*pcols, *scols)
    out.write.partitionBy(*pcols).mode(mode).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; any filter on the partition column(s) in
    the downstream plan prunes directories (check explain() for
    ``PartitionFilters``)."""
    return spark.read.parquet(path)


def explain_has_partition_pruning(df: DataFrame) -> bool:
    """True when the physical plan carries a non-empty PartitionFilters
    list — i.e. Catalyst will skip whole directories, not filter rows."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    return bool(m and m.group(1).strip())


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: str | list[str],
    num_buckets: int = 32,
    sort_by: str | list[str] | None = None,
) -> None:
    """Bucketed managed table: pre-hash-partitioned on the join key.

    Two tables bucketed on the same key with the same bucket count join
    with NO exchange — the shuffle was paid once at write time and every
    subsequent join/aggregation on that key reuses it. This is the
    co-located-join answer for fact⋈fact joins (lineitem⋈orders at
    100 TB) where neither side can broadcast; same role as the
    reference's Postgres PK index making its upsert-by-key cheap
    (internal/db/db.go:86).

    sort_by additionally orders within buckets → sort-merge join without
    even the sort step.
    """
    bcols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.format("parquet").bucketBy(num_buckets, *bcols)
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*scols)
    w.mode("overwrite").saveAsTable(table_name)
