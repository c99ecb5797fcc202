"""Capture the MV-merge group write's physical plan under the r16
REBALANCE hint (SPARK_GRAFT_WRITE_REBALANCE=force reproduces it for
small deltas) vs the r17 sub-advisory coalesce(1) default — evidence
for plans/r17/mv_group_write_{before,after}.txt.

The capture hooks _write_group_with_stats at the write call, on a real
refresh_mv cycle over the sf0.1 orders projection (the bench's
lake_mv_refresh_cycle shape).

Usage: python tools/gen_r17_mv_plans.py before|after
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

suffix = sys.argv[1]
assert suffix in ("before", "after"), suffix
if suffix == "before":
    os.environ["SPARK_GRAFT_WRITE_REBALANCE"] = "force"
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from file_stream_import_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark(app_name=f"gen_mv_plans_{suffix}")
spark.sparkContext.setLogLevel("ERROR")

import file_stream_import_spark.io.versioned as V  # noqa: E402
from file_stream_import_spark.operators.curation import (  # noqa: E402
    dense_sequence,
)
from file_stream_import_spark.operators.mv import refresh_mv  # noqa: E402

captured: list[str] = []
orig = V._write_group_with_stats


def hooked(df, full_path, **kw):
    # re-apply the gate exactly as the real function will, purely to
    # capture the plan it is about to execute
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    gated = df
    if V._WRITE_REBALANCE == "force":
        gated = df.hint("rebalance")
    elif V._WRITE_REBALANCE != "0":
        est = V._write_size_estimate(df)
        if est is not None and est > V._WRITE_REBALANCE_MAX_BYTES:
            pass
        elif est is not None and est <= V._advisory_bytes(df.sparkSession):
            gated = df.coalesce(1)
        else:
            gated = df.hint("rebalance")
    captured.append(gated._jdf.queryExecution().explainString(mode))
    return orig(df, full_path, **kw)


V._write_group_with_stats = hooked
import file_stream_import_spark.operators.mv as MV  # noqa: E402

MV._write_group_with_stats = getattr(MV, "_write_group_with_stats", None)

tmp = tempfile.mkdtemp(prefix=f"gen_mv_{suffix}_")
om = dense_sequence(
    spark.read.parquet("/root/testdata/sf0.1/orders.parquet").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ),
    "o_orderkey",
    out_col="k",
).select("k", "status", "cents").localCheckpoint(eager=True)
tm = V.VersionedTable(os.path.join(tmp, "t"))
tm.commit(om, mode="overwrite")
mv = V.VersionedTable(os.path.join(tmp, "mv"))
refresh_mv(
    tm, mv, spark, name="m", group_cols=["status"],
    sum_cols=["cents"], key="k",
)
upd = om.filter(F.col("k") <= 2000).withColumn(
    "cents", F.col("cents") + F.lit(1)
)
V.merge_into(tm, spark, upd, key="k")
captured.clear()  # keep only the MV-merge group write
refresh_mv(
    tm, mv, spark, name="m", group_cols=["status"],
    sum_cols=["cents"], key="k",
)
out = f"plans/r17/mv_group_write_{suffix}.txt"
os.makedirs("plans/r17", exist_ok=True)
with open(out, "w") as f:
    f.write(captured[-1])
print("wrote", out, len(captured[-1]), "bytes;", len(captured), "writes captured")
import shutil  # noqa: E402

shutil.rmtree(tmp, ignore_errors=True)
