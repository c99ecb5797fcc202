"""A/B: the table changefeed's executor-parallel partitioned reader
(r9b default, io/pysource.py::TableChangefeedPartitionedReader) vs the
driver-materialized SimpleDataSourceStreamReader contract form
(.option("reader", "simple")).

Build ONE large multi-file commit (N_ROWS rows in N_FILES parquet
files — the "stream restarted after a day of ingest" catch-up shape),
then drain it into a noop-ish sink through each reader and report wall
time. The simple reader funnels every row through the driver as Python
tuples (pq.read_table -> to_pylist -> pickled back out); the
partitioned reader plans one InputPartition per file and the rows move
as Arrow batches on executors — the difference IS the driver
serialization tax, and it grows linearly with commit size while the
partitioned cost is a parallel parquet scan.

Measured (2026-08-15, local[32], 2M rows / 16 files, sha256 payload):
partitioned 5.29s vs simple 11.80s — 2.23x, with the absolute gap the
driver's to_pylist + pickle round-trip. Local mode understates it: on
a real cluster the simple path ALSO moves every byte driver->executor
over the network and is bounded by one python process; the partitioned
path is a plain parallel parquet scan.

Run: python tools/ab_changefeed.py [N_ROWS] [N_FILES]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession, functions as F

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def drain(spark, path: str, tag: str, **opts) -> tuple[float, int]:
    """Drain the feed through foreachBatch + count() — the count runs
    as a Spark job (no driver materialization in the SINK, so the A/B
    isolates the READER's data path)."""
    ckpt = tempfile.mkdtemp(prefix=f"ab_cf_ck_{tag}_")
    delivered: list[int] = []
    reader = spark.readStream.format("table_changefeed").option(
        "path", path
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    t0 = time.perf_counter()
    q = (
        reader.load()
        .writeStream.foreachBatch(
            lambda df, _id: delivered.append(df.count())
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dt = time.perf_counter() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return dt, sum(delivered)


def main() -> None:
    from file_stream_import_spark.io.pysource import (
        TableChangefeedDataSource,
    )
    from file_stream_import_spark.io.versioned import VersionedTable

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(TableChangefeedDataSource)

    base = tempfile.mkdtemp(prefix="ab_cf_")
    t = VersionedTable(os.path.join(base, "t"))
    df = (
        spark.range(N_ROWS)
        .repartition(N_FILES)
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
        .withColumn("v", (F.col("id") % 1000).cast("long"))
    )
    t.commit(df, mode="overwrite")
    print(f"table: {N_ROWS} rows in {N_FILES} files, one commit")

    results = {}
    for tag, opts in [
        ("partitioned", {}),
        ("simple", {"reader": "simple"}),
    ]:
        dt, n = drain(spark, t.path, tag, **opts)
        assert n == N_ROWS, (tag, n)
        results[tag] = dt
        print(f"{tag:12s} {dt:7.2f}s  ({n} rows, all delivered)")
    print(
        f"speedup: {results['simple'] / results['partitioned']:.2f}x "
        "(simple / partitioned)"
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
