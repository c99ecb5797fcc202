"""Measure the file-pruned MERGE: build a versioned table from N
disjoint-key-range commits, then MERGE a small update batch that
touches exactly one group's key range, comparing

  A) pruned merge (stats present — rewrites only the touched group)
  B) full-rewrite merge (stats stripped from the manifest — the
     conservative legacy path that rewrites the whole snapshot)

Prints per-arm times and the rewritten-bytes ratio. The pruned arm's
cost should track the DELTA (one group + updates), not the table —
the property that keeps an incremental merge alive at 100 TB.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from file_stream_import_spark.io.versioned import (  # noqa: E402
    VersionedTable,
    _manifest_path,
    merge_into,
)
from file_stream_import_spark.session import get_spark  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_GROUPS = 16
ROWS_PER_GROUP = int(os.environ.get("MERGE_AB_ROWS", "1000000"))
UPDATE_ROWS = 1_000


def build(spark, path: str) -> VersionedTable:
    t = VersionedTable(path)
    for g in range(N_GROUPS):
        lo = g * ROWS_PER_GROUP
        df = spark.range(lo, lo + ROWS_PER_GROUP).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        t.commit(df, mode="append" if g else "overwrite")
    return t


def strip_stats(t: VersionedTable) -> None:
    v = t.latest_version()
    p = _manifest_path(t.path, v)
    # materialize first (the file may be a format-2 delta) and write
    # the stripped FULL form back
    m = t._load_manifest(v)
    m.pop("stats", None)
    json.dump(m, open(p, "w"))


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def run_merge(spark, t: VersionedTable) -> tuple[float, int]:
    upd = spark.range(0, UPDATE_ROWS).select(
        # keys inside group 7's range only
        (F.col("id") + 7 * ROWS_PER_GROUP).alias("k"),
        F.lit("UPDATED").alias("payload"),
    )
    before = du(os.path.join(t.path, "data"))
    t0 = time.time()
    merge_into(t, spark, upd, key="k")
    dt = time.time() - t0
    written = du(os.path.join(t.path, "data")) - before
    return dt, written


def main() -> None:
    spark = get_spark(
        "ab_merge_pruned",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="merge_ab_")
    try:
        # JIT/shuffle warmup on a throwaway table so the first measured
        # arm doesn't absorb one-time session costs
        global ROWS_PER_GROUP
        real_rows = ROWS_PER_GROUP
        ROWS_PER_GROUP = 10_000
        tw = build(spark, os.path.join(work, "warm"))
        run_merge(spark, tw)
        ROWS_PER_GROUP = real_rows

        results = {}
        for arm in ("full", "pruned"):
            path = os.path.join(work, arm)
            t = build(spark, path)
            if arm == "full":
                strip_stats(t)
            dt, written = run_merge(spark, t)
            n_rows = t.read(spark).count()
            results[arm] = (dt, written)
            print(
                f"{arm:7s} merge: {dt:6.2f}s, {written/1e6:8.1f} MB "
                f"rewritten, table rows {n_rows}"
            )
        (pt, pw), (ft, fw) = results["pruned"], results["full"]
        print(
            f"speedup {ft/pt:.1f}x, bytes ratio {fw/max(pw,1):.1f}x "
            f"({N_GROUPS} groups x {ROWS_PER_GROUP} rows, "
            f"{UPDATE_ROWS}-row update)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
