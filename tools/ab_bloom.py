"""A/B: MERGE on a hash-keyed table with vs without per-group Bloom
filters (r7 feature) — the point-lookup analog of ab_merge_pruned.py.

The table's key is md5(id): every group's [min, max] stats box spans
the whole hex space, so WITHOUT blooms the touch test must rewrite
every group on any merge; WITH blooms only the groups actually holding
the update keys rewrite. Build N_GROUPS groups of ROWS_PER_GROUP
hash-keyed rows, merge N_UPDATES point updates drawn from ONE group,
and report wall time, groups rewritten, and bytes written.

`--sweep-bits` additionally sweeps the r8 bits-per-key knob
(set_bloom_columns(bits_per_key=...)): lower bits -> smaller sidecars
but more false positives (unnecessary group rewrites); the standard
estimate with k=6 hashes is fpp ~ (1 - e^(-6/bits_per_key))^6.

Run: python tools/ab_bloom.py [--sweep-bits]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

N_GROUPS = 16
ROWS_PER_GROUP = 60_000
N_UPDATES = 100
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def group_bytes(path: str, groups: list[str]) -> int:
    total = 0
    for g in groups:
        d = os.path.join(path, g)
        for name in os.listdir(d):
            total += os.path.getsize(os.path.join(d, name))
    return total


def run(spark: SparkSession, with_bloom: bool, bits_per_key: int = 10) -> dict:
    from file_stream_import_spark.io.versioned import VersionedTable, merge_into

    t = VersionedTable(tempfile.mkdtemp(prefix="ab_bloom_"))
    try:
        for i in range(N_GROUPS):
            df = (
                spark.range(i * ROWS_PER_GROUP, (i + 1) * ROWS_PER_GROUP)
                .select(
                    F.md5(F.col("id").cast("string")).alias("k"),
                    F.col("id").alias("payload"),
                )
            )
            t.commit(df, mode="append")
        if with_bloom:
            t0 = time.time()
            t.set_bloom_columns(spark, ["k"], bits_per_key=bits_per_key)
            build_s = time.time() - t0
        else:
            build_s = 0.0
        pre = set(t._load_manifest(t.latest_version())["groups"])
        upd = (
            spark.range(0, N_UPDATES * 13, 13)  # keys inside group 0
            .select(
                F.md5(F.col("id").cast("string")).alias("k"),
                (F.col("id") + 1_000_000).alias("payload"),
            )
        )
        t0 = time.time()
        merge_into(t, spark, upd, key="k")
        merge_s = time.time() - t0
        m = t._load_manifest(t.latest_version())
        rewritten = pre - set(m["groups"])
        added = [g for g in m["groups"] if g not in pre]
        sidecar = 0
        for g in m["groups"]:
            d = os.path.join(t.path, g)
            sidecar += sum(
                os.path.getsize(os.path.join(d, n))
                for n in os.listdir(d)
                if n.startswith("_bloom_")
            )
        return {
            "bloom": with_bloom,
            "bits_per_key": bits_per_key,
            "sidecar_bytes": sidecar,
            "bloom_build_s": round(build_s, 2),
            "merge_s": round(merge_s, 2),
            "groups_rewritten": len(rewritten),
            "bytes_written": group_bytes(t.path, added),
            "rows": t.read(spark).count(),
        }
    finally:
        shutil.rmtree(t.path, ignore_errors=True)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab_bloom")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--sweep-bits" in sys.argv:
        print("| bits/key | est. fpp | bloom build | merge wall | groups rewritten | sidecar bytes |")
        print("|---|---|---|---|---|---|")
        import math
        for bits in (5, 10, 16, 20):
            r = run(spark, with_bloom=True, bits_per_key=bits)
            est = (1 - math.exp(-6 / bits)) ** 6
            print(
                f"| {bits} | {est:.2%} | {r['bloom_build_s']}s |"
                f" {r['merge_s']}s | {r['groups_rewritten']}/{N_GROUPS} |"
                f" {r['sidecar_bytes'] / 1e6:.2f} MB |"
            )
        return
    a = run(spark, with_bloom=False)
    b = run(spark, with_bloom=True)
    print("| variant | bloom build | merge wall | groups rewritten | bytes written |")
    print("|---|---|---|---|---|")
    for r in (a, b):
        tag = "bloom" if r["bloom"] else "no bloom (box only)"
        print(
            f"| {tag} | {r['bloom_build_s']}s | {r['merge_s']}s |"
            f" {r['groups_rewritten']}/{N_GROUPS} |"
            f" {r['bytes_written'] / 1e6:.1f} MB |"
        )
    assert a["rows"] == b["rows"]
    print(
        f"speedup: {a['merge_s'] / b['merge_s']:.1f}x wall, "
        f"{a['bytes_written'] / max(1, b['bytes_written']):.1f}x bytes"
    )


if __name__ == "__main__":
    main()
