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


def add_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "__zkey"
) -> DataFrame:
    """Append a Z-order (Morton) key interleaving ``cols``.

    Each column is min/max-scaled onto an integer [0, 2^bits) grid (the
    per-column extrema come from one aggregate row, cross-joined back —
    a broadcast of a single row, never a collect), then bit j of column
    i lands at position j·n_cols + i. Sorting by the key clusters rows
    so that parquet row-group min/max bounds are tight in EVERY
    interleaved dimension at once — multi-column row-group skipping, the
    closest columnar analog of the reference's index-every-column
    strategy (internal/db/db.go:97-103) for multi-predicate scans.

    The whole computation is a codegen'd integer projection; min/max
    scaling (vs rank) keeps it one pass, at the cost of skew sensitivity
    — acceptable for clustering, where only relative order matters.

    ``bits`` is auto-capped so bits*len(cols) <= 63: past that the top
    interleaved bit would land in the bigint sign bit (negative keys
    sorting first breaks the Morton order), and JVM shiftleft wraps its
    shift amount mod 64, silently clobbering low bits. The cap only
    coarsens the grid — relative clustering order is preserved.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n == 0:
        raise ValueError("add_zorder_key needs at least one column")
    bits = min(bits, 63 // n)
    if bits < 1:
        raise ValueError(f"too many z-order columns ({n}): 63 bits / {n} < 1")
    lo = [F.min(F.col(c)).alias(f"__lo_{i}") for i, c in enumerate(cols)]
    hi = [F.max(F.col(c)).alias(f"__hi_{i}") for i, c in enumerate(cols)]
    stats = df.agg(*lo, *hi)
    out = df.crossJoin(F.broadcast(stats))
    scaled = []
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        rng = F.col(f"__hi_{i}") - F.col(f"__lo_{i}")
        s = F.when(rng == 0, F.lit(0)).otherwise(
            F.floor(
                (F.col(c) - F.col(f"__lo_{i}"))
                / rng
                * F.lit(top)
            )
        )
        scaled.append(F.least(s.cast("bigint"), F.lit(top)))
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for i in range(n):
            bit = F.shiftright(scaled[i], j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return out.withColumn(key_col, z).drop(
        *[f"__lo_{i}" for i in range(n)], *[f"__hi_{i}" for i in range(n)]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-order-clustered on ``zorder_by``.

    repartitionByRange on the Z-key gives each output file a disjoint
    key range (range exchange with sampled bounds); sortWithinPartitions
    then tightens row-group stats inside each file. Filters on ANY of
    the interleaved columns skip row groups — vs a single-column sort,
    which only helps its leading column.
    """
    zdf = add_zorder_key(df, zorder_by, bits)
    parts = [num_files] if num_files else []
    zdf = zdf.repartitionByRange(*parts, "__zkey").sortWithinPartitions(
        "__zkey"
    )
    zdf.drop("__zkey").write.mode(mode).parquet(path)


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 << 20,
    mode: str = "overwrite",
) -> tuple[int, int]:
    """Rewrite a parquet directory into ~``target_bytes`` files.

    The small-files problem is the dominant read-side tax of incremental
    ingest (every micro-batch appends a file per task; a year of
    15-minute batches × 32 tasks = a million tiny files whose open/footer
    costs dwarf the data read). Compaction = read + repartition(n) +
    rewrite, with n sized from the actual on-disk bytes. Returns
    (files_before, files_after).

    At 100 TB this runs per partition-directory (compact yesterday's
    partition, not the table); the byte measurement comes from the
    Hadoop FileSystem the path actually lives on (file://, s3a://,
    hdfs:// alike), no extra scan. Raises if no file could be statted —
    silently defaulting to n=1 would rewrite the directory into one
    giant file at exactly the scale compaction exists to serve.
    """
    import math

    df = spark.read.parquet(in_path)
    files = df.inputFiles()
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    statted = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        try:
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
            statted += 1
        except Exception:
            continue
    if files and not statted:
        raise IOError(
            f"compact_small_files: could not stat any of {len(files)} input "
            f"files under {in_path}; refusing to guess an output file count"
        )
    n = max(1, math.ceil(total / target_bytes))
    df.repartition(n).write.mode(mode).parquet(out_path)
    after = spark.read.parquet(out_path).inputFiles()
    return len(files), len(after)


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
