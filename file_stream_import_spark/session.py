"""SparkSession builder tuned for this engine.

Local-mode testing runs on local[32] with 128 GiB; production target is a
1000-executor cluster over ~100 TB. The session config below is the
local operating point; every scale-sensitive knob is overridable via
env vars so the same code runs unchanged on a real cluster, where
``spark-submit --conf`` takes over.

Key choices (and why they survive a 100x scale-up):
  * AQE on — runtime coalescing/skew-join handling replaces hand-tuned
    shuffle partition counts when data volume per stage varies wildly.
  * shuffle.partitions sized to cores locally; on a cluster AQE's
    coalescePartitions makes the initial number mostly irrelevant.
  * UTC session timezone — required for oracle comparison and the only
    sane choice for a multi-region 100 TB lake.
  * Arrow enabled — every pandas_udf / toPandas crossing is vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "file_stream_import_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Env overrides: SPARK_GRAFT_CPUS (local parallelism),
    SPARK_GRAFT_SHUFFLE_PARTITIONS.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The events fixture stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read nanos as long and convert in io.tables
        # (truncation to micros matches DuckDB's internal precision).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Wide aggregates (128-column MinHash signatures) exceed the
        # default 100-field codegen cutoff and drop to interpreted
        # evaluation; 200 keeps the widest repo plan inside codegen.
        .config("spark.sql.codegen.maxFields", "200")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
