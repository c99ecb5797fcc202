#!/usr/bin/env python3
"""A/B: cascaded-rollup refresh cost vs base-table size (r16).

The claim refresh_rollup_mv makes: once the ladder is bootstrapped, a
FIXED-size base delta costs the COARSE level O(fine delta) — the
rollup folds only the fine MV's CDF (plus a group-pruned read of the
fine MV for endangered extremes), never touching the base. At 100 TB
the base is the only thing the FINE level ever scans; every coarser
level's refresh is sized by how many FINE GROUPS changed, not by how
many base rows exist.

Two ladders, identical except base size: N rows vs SCALE*N rows over
the SAME fine-group universe (days x sites), both bootstrapped, then a
fixed-size append (same row count, same touched fine groups) + ladder
refresh, and a fixed delete wave touching the stored minima (forcing
the endangered recompute against the FINE MV). Reports per-wave wall
seconds for the fine refresh and the rollup refresh separately, plus
the 'naive' arm — recomputing the coarse aggregate from the base —
whose cost IS linear in base size, for contrast.

Expectation: rollup-refresh wall ~flat across arms (ratio ~1x);
naive-recompute ratio ~linear with SCALE.

Run: python tools/ab_rollup.py [--rows 20000] [--scale 20]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
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
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "12g")
        .appName("ab_rollup")
        .getOrCreate()
    )


DAYS, SITES = 60, 8  # fine-group universe: 480 groups in every arm


def _df(spark, lo: int, hi: int):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % DAYS).cast("int").alias("d"),
            F.concat(
                F.lit("s"), (F.col("id") % SITES).cast("string")
            ).alias("site"),
            (((F.col("id") * 37) % 199 - 99).cast("double") / 100.0)
            .alias("x"),
        )
    )


def run_arm(spark, root: str, base_rows: int, delta_rows: int) -> dict:
    from pyspark.sql import functions as F

    from file_stream_import_spark.io.versioned import VersionedTable
    from file_stream_import_spark.operators.mv import (
        refresh_mv,
        refresh_rollup_mv,
    )

    base = VersionedTable(os.path.join(root, "base"))
    fine = VersionedTable(os.path.join(root, "fine"))
    coarse = VersionedTable(os.path.join(root, "coarse"))
    kw = dict(
        name="fine", group_cols=["d", "site"], sum_cols=[], key="k",
        min_cols=["x"], max_cols=["x"], sumsq_cols=["x"],
        percentile_cols=["x"],
    )
    base.commit(
        _df(spark, 0, base_rows).repartition(32), mode="overwrite"
    )
    refresh_mv(base, fine, spark, **kw)
    refresh_rollup_mv(fine, coarse, spark, name="c",
                      group_cols=["site"])
    out = {"base_rows": base_rows}
    # fixed-size append: same rows, same touched fine groups, per arm
    base.commit(
        _df(spark, base_rows, base_rows + delta_rows), mode="append"
    )
    t0 = time.monotonic()
    refresh_mv(base, fine, spark, **kw)
    t1 = time.monotonic()
    refresh_rollup_mv(fine, coarse, spark, name="c",
                      group_cols=["site"])
    t2 = time.monotonic()
    out["append_fine_s"] = round(t1 - t0, 3)
    out["append_rollup_s"] = round(t2 - t1, 3)
    # fixed delete wave touching stored minima -> endangered recompute
    # at BOTH levels (fine recomputes from base pruned; rollup from
    # the fine MV pruned). The slice is a FIXED absolute k-range so
    # the deleted-row count is identical in both arms — a fractional
    # predicate would scale the delta with base size and measure the
    # delta, not the machinery
    base.delete_where(
        spark,
        (F.col("x") <= -0.97) & (F.col("k") < 20000),
        prune_where="auto",
    )
    t0 = time.monotonic()
    refresh_mv(base, fine, spark, **kw)
    t1 = time.monotonic()
    refresh_rollup_mv(fine, coarse, spark, name="c",
                      group_cols=["site"])
    t2 = time.monotonic()
    out["delete_fine_s"] = round(t1 - t0, 3)
    out["delete_rollup_s"] = round(t2 - t1, 3)
    # the naive contrast: recompute the coarse aggregate from base
    t0 = time.monotonic()
    base.read(spark).groupBy("site").agg(
        F.count("*").alias("n"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    ).collect()
    out["naive_base_agg_s"] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--delta", type=int, default=5000)
    args = ap.parse_args()
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for label, rows in (
        ("warmup", 2000),  # discarded: JVM/codegen warm-up
        ("small", args.rows),
        ("large", args.rows * args.scale),
    ):
        root = tempfile.mkdtemp(prefix=f"ab_rollup_{label}_")
        try:
            results[label] = run_arm(spark, root, rows, args.delta)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    results.pop("warmup", None)
    s, l = results["small"], results["large"]
    summary = {
        "scale": args.scale,
        "append_rollup_ratio": round(
            l["append_rollup_s"] / max(s["append_rollup_s"], 1e-9), 2
        ),
        "delete_rollup_ratio": round(
            l["delete_rollup_s"] / max(s["delete_rollup_s"], 1e-9), 2
        ),
        "naive_agg_ratio": round(
            l["naive_base_agg_s"] / max(s["naive_base_agg_s"], 1e-9), 2
        ),
    }
    print(json.dumps({"arms": results, "summary": summary}))


if __name__ == "__main__":
    main()
