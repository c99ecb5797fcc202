#!/usr/bin/env python3
"""A/B: commit-metadata cost vs table width (r15 VERDICT #1).

Pre-r15, every commit serialized the FULL manifest — group list +
per-group stats/bloom refs — so fixed-size commits paid O(table width)
in metadata (measured: `compact` of a fixed 20-group backlog 0.46 s ->
4.0 s at 100x groups). Delta manifests (format 2) write only the
commit's diff; this tool shows the fixed-delta commit cost is ~flat in
table width.

Two tables, identical except width: W groups vs 100xW groups (bootstrap
via one partitioned commit; rows scale WITH width so every bootstrap
group stays above compact's min_bytes — otherwise "compact" would
swallow the whole table and measure an O(table) rewrite, not a fixed
backlog). On each: K single-group appends (the fixed-delta op), then a
fixed 20-group backlog + compact of exactly that backlog. Reports
per-op wall seconds and on-disk manifest bytes; arms:
  delta  — the shipping encoder (_SNAP_EVERY=32)
  full   — _SNAP_EVERY=1 (every manifest full: the pre-r15 layout)

Run: python tools/ab_manifest.py [--narrow 20] [--wide 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .appName("ab_manifest")
        .getOrCreate()
    )


def run_arm(
    spark, path: str, groups: int, rows_per_group: int, appends: int
) -> dict:
    from pyspark.sql import functions as F

    from file_stream_import_spark.io import versioned as V
    from file_stream_import_spark.io.versioned import VersionedTable

    shutil.rmtree(path, ignore_errors=True)
    t = VersionedTable(path)
    wide = spark.range(0, groups * rows_per_group).select(
        F.col("id"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % groups).cast("string").alias("k"),
    )
    t0 = time.time()
    t.commit(wide, partition_by=["k"])
    bootstrap_s = time.time() - t0

    small = lambda i: spark.range(i * 10, i * 10 + 10).select(  # noqa: E731
        F.col("id"), (F.col("id") * 2).alias("v"), F.lit("z").alias("k")
    )
    append_s, append_bytes = [], []
    for i in range(appends):
        df = small(i)
        df.collect()  # materialize outside the timed window
        t0 = time.time()
        ver = t.commit(df)
        append_s.append(time.time() - t0)
        append_bytes.append(os.path.getsize(V._manifest_path(path, ver)))

    # the BASELINE.md shape: fixed 20-group backlog, then compact of
    # exactly that backlog (bootstrap groups sit ABOVE min_bytes and
    # must be carried by reference, not rewritten)
    for i in range(20):
        t.commit(small(100 + i))
    before = len(t._load_manifest(t.latest_version())["groups"])
    t0 = time.time()
    t.compact(spark, min_bytes=16 * 1024)
    compact_s = time.time() - t0
    after = len(t._load_manifest(t.latest_version())["groups"])
    assert after >= groups, (
        f"compact rewrote bootstrap groups ({before}->{after}, "
        f"expected >= {groups}) — raise rows_per_group"
    )

    return {
        "groups": groups,
        "bootstrap_s": round(bootstrap_s, 3),
        "append_s_median": round(statistics.median(append_s), 4),
        "append_bytes_median": int(statistics.median(append_bytes)),
        "compact_s": round(compact_s, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--narrow", type=int, default=20)
    ap.add_argument("--wide", type=int, default=2000)
    ap.add_argument("--rows-per-group", type=int, default=2_000)
    ap.add_argument("--appends", type=int, default=8)
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()

    from file_stream_import_spark.io import versioned as V

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"arms": {}}
    arms = [("delta", 32)] if args.skip_full else [
        ("delta", 32),
        ("full", 1),
    ]
    for name, snap_every in arms:
        V._SNAP_EVERY = snap_every
        rows = {}
        for label, g in (("narrow", args.narrow), ("wide", args.wide)):
            rows[label] = run_arm(
                spark,
                f"/tmp/ab_manifest_{name}_{label}",
                g,
                args.rows_per_group,
                args.appends,
            )
        rows["append_ratio"] = round(
            rows["wide"]["append_s_median"]
            / max(rows["narrow"]["append_s_median"], 1e-9),
            2,
        )
        rows["compact_ratio"] = round(
            rows["wide"]["compact_s"] / max(rows["narrow"]["compact_s"], 1e-9),
            2,
        )
        rows["bytes_ratio"] = round(
            rows["wide"]["append_bytes_median"]
            / max(rows["narrow"]["append_bytes_median"], 1),
            2,
        )
        out["arms"][name] = rows
        print(json.dumps({name: rows}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
