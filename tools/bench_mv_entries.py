"""Quick bench of ONLY the MV/lake entries, mirroring bench.py's
methodology (1 warm-up + 4 timed passes, min) — for iterating on the
refresh path without paying the full bench. Not a bench.py
replacement; the driver's numbers come from bench.py."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from file_stream_import_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark(app_name="bench_mv_entries")
spark.sparkContext.setLogLevel("ERROR")

from file_stream_import_spark.io.versioned import (  # noqa: E402
    VersionedTable,
    merge_into,
)
from file_stream_import_spark.operators.curation import (  # noqa: E402
    dense_sequence,
)
from file_stream_import_spark.operators.mv import (  # noqa: E402
    refresh_mv,
    refresh_rollup_mv,
)


def bench_one(label, run, n=4):
    run()  # warm-up
    times = []
    for _ in range(n):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    print(
        f"{label}: min {min(times):.3f}s passes "
        + " ".join(f"{t:.3f}" for t in times)
    )


tmp5 = tempfile.mkdtemp(prefix="bench_mv_")
om = dense_sequence(
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ),
    "o_orderkey",
    out_col="k",
).select("k", "status", "cents").localCheckpoint(eager=True)

tm = VersionedTable(os.path.join(tmp5, "t"))
tm.commit(om, mode="overwrite")
mvb = VersionedTable(os.path.join(tmp5, "mv"))
refresh_mv(
    tm, mvb, spark, name="bench_mv", group_cols=["status"],
    sum_cols=["cents"], key="k",
)
upd_mv = om.filter(F.col("k") <= 2_000).localCheckpoint(eager=True)
wave = {"i": 0}


def mv_cycle():
    wave["i"] += 1
    merge_into(
        tm, spark,
        upd_mv.withColumn("cents", F.col("cents") + F.lit(wave["i"])),
        key="k",
    )
    return refresh_mv(
        tm, mvb, spark, name="bench_mv", group_cols=["status"],
        sum_cols=["cents"], key="k",
    )


bench_one("lake_mv_refresh_cycle", mv_cycle)

om2 = om.withColumn("bucket", (F.col("k") % 32).cast("int")).localCheckpoint(
    eager=True
)
tmf = VersionedTable(os.path.join(tmp5, "t2"))
tmf.commit(om2, mode="overwrite")
fine2 = VersionedTable(os.path.join(tmp5, "fine2"))
roll2 = VersionedTable(os.path.join(tmp5, "roll2"))
fkw = dict(
    name="bench_fine2", group_cols=["status", "bucket"],
    sum_cols=["cents"], key="k",
)
refresh_mv(tmf, fine2, spark, **fkw)
refresh_rollup_mv(fine2, roll2, spark, name="bench_roll2", group_cols=["status"])
upd2 = om2.filter(F.col("k") <= 2_000).localCheckpoint(eager=True)
wave2 = {"i": 0}


def rollup_ladder():
    wave2["i"] += 1
    merge_into(
        tmf, spark,
        upd2.withColumn("cents", F.col("cents") + F.lit(wave2["i"])),
        key="k",
    )
    refresh_mv(tmf, fine2, spark, **fkw)
    return refresh_rollup_mv(
        fine2, roll2, spark, name="bench_roll2", group_cols=["status"]
    )


bench_one("lake_mv_rollup_ladder", rollup_ladder)

import shutil  # noqa: E402

shutil.rmtree(tmp5, ignore_errors=True)
