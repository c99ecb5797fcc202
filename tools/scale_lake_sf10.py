"""sf10 scale points for the r9/r10 lake surface — VERDICT r9 #5.

The r9 lake DRIVER queries pin hash-stable outputs via fixed key
subsets, so re-running them at sf10 would measure constant work. The
O(delta) claims they embody are measured here directly instead: a
versioned table built from the FULL orders fixture at sf0.1 and at
sf10 (tools/scale_sf10.py's 100x key-shifted build), laid out with
CONSTANT group size — so the group count grows 100x (4 -> 400) while
each operation's DELTA stays fixed. The claim under test: MERGE with
clauses, auto-pruned UPDATE/DELETE, metadata COUNT/aggregates,
incremental compaction of a fixed small-group backlog, and
metadata-only RENAME all cost O(delta + metadata), so their wall time
should stay near-FLAT across the 100x — only the one honest
full-data op (the partitioned commit that builds the table) may scale
linearly.

Run: python tools/scale_lake_sf10.py   (builds /tmp/sf10 via
tools/scale_sf10.py's builder if absent; ~5 min). Prints a
BASELINE.md-ready table.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SRC01 = "/root/testdata/sf0.1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CHUNK = 37_500  # rows per group — constant across scales


def _orders(spark, sf_dir):
    from file_stream_import_spark.operators.curation import dense_sequence

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # r13: two-level range-bucketed rank, not the single-partition
    # row_number window (45M rows through one task at sf10)
    return dense_sequence(o, "o_orderkey", out_col="k").select(
        "k", "status", "cents"
    )


def campaign(spark, sf_dir, label):
    import bench

    from file_stream_import_spark.io.versioned import (
        VersionedTable,
        merge_into,
        table_changes_rows,
    )

    # r16 escalation of the r15 calibration discipline: the host's
    # steal bursts can start and end BETWEEN the campaign-level
    # probes, so the three historically phase-hostage rows each get
    # their own immediately-preceding probe reading (recorded in the
    # meta dict) — a high row next to a quiet row-probe is a real
    # regression; next to a noisy one it's weather.
    row_cal = {}

    def row_probe(name):
        row_cal[name] = bench.calibration_probe(spark)

    o = _orders(spark, sf_dir).localCheckpoint(eager=True)
    n = o.count()
    root = tempfile.mkdtemp(prefix=f"lake_scale_{label}_")
    t = VersionedTable(os.path.join(root, "t"))
    out = {}

    row_probe("partitioned_commit")
    t0 = time.time()
    t.commit(o, mode="overwrite", partition_by=[f"truncate({CHUNK}, k)"])
    out["partitioned_commit (full data — honest linear)"] = time.time() - t0
    n_groups = len(t._load_manifest(t.latest_version())["groups"])

    # fixed 2k-key delta inside the first group, full clause engine
    upd = (
        o.filter(F.col("k") <= 2000)
        .withColumn("status", F.lit("M"))
        .localCheckpoint(eager=True)
    )
    row_probe("merge_clauses")
    t0 = time.time()
    merge_into(
        t, spark, upd, key="k",
        when_matched={"status": F.col("s.status")},
        matched_condition=F.col("t.cents") >= 0,
    )
    out["merge_clauses (fixed 2k delta)"] = time.time() - t0

    t0 = time.time()
    t.update_where(
        spark,
        F.col("k").between(100, 1200),
        {"cents": F.col("cents") + 1},
        prune_where="auto",
    )
    out["auto_pruned_update (fixed window)"] = time.time() - t0

    t0 = time.time()
    t.delete_where(
        spark, F.col("k").between(40_000, 41_000), prune_where="auto"
    )
    out["auto_pruned_delete (fixed window)"] = time.time() - t0

    # --- r13: CDF + replication scale points (VERDICT item 8) ---
    # the O(delta) claim for the row-level CDF: versions 1..3 above
    # are FIXED-SIZE deltas (2k merge, 1.1k update, 1k delete), so
    # reading their exact row changes must stay flat while table rows
    # and group count grow 100x (per-pair snapshot_diff, shared-group
    # skip)
    t0 = time.time()
    n_cdf = table_changes_rows(t, spark, 1, 3, key="k").count()
    out["table_changes_rows (3 fixed-delta commits)"] = time.time() - t0

    # --- r13 (continued): the BATCH changefeed datasource over the
    # same fixed 3-delta range — one metadata-planned job (one Arrow
    # diff task per rewrite); delta-bound, so flat at 100x
    from file_stream_import_spark.io.pysource import (
        TableChangefeedDataSource as _CF,
    )

    spark.dataSource.register(_CF)
    t0 = time.time()
    n_bcdf = (
        spark.read.format("table_changefeed")
        .option("path", t.path)
        .option("readchangedata", "true")
        .option("key", "k")
        .option("startingversion", "1")
        .option("endingversion", "3")
        .load()
        .count()
    )
    out["batch_cdf_datasource (same 3-delta range)"] = time.time() - t0

    # one replication convergence cycle: replica pre-seeded with the
    # v0 state (untimed bootstrap, like the initial load of any CDC
    # pipeline), then a readchangedata catch-up replays versions 1..4
    # (the three deltas + one fresh 2k merge) through the idempotent
    # CDC writer. Timed: the catch-up — micro-batch machinery + CDF
    # diffs + one pruned MERGE into a replica whose group count also
    # grew 100x. Delta-bound, so ~flat.
    from file_stream_import_spark.io.pysource import (
        TableChangefeedDataSource,
    )
    from file_stream_import_spark.io.versioned import (
        make_cdf_replicator,
    )

    spark.dataSource.register(TableChangefeedDataSource)
    rep = VersionedTable(os.path.join(root, "replica"))
    rep.commit(o, mode="overwrite", partition_by=[f"truncate({CHUNK}, k)"])
    merge_into(
        t, spark,
        o.filter(F.col("k").between(5_000, 7_000))
        .withColumn("status", F.lit("R"))
        .localCheckpoint(eager=True),
        key="k",
    )  # v4: the fresh delta the catch-up lands
    ck = os.path.join(root, "rep_ck")
    row_probe("cdf_replication_catchup")
    t0 = time.time()
    q = (
        spark.readStream.format("table_changefeed")
        .option("path", t.path)
        .option("readchangedata", "true")
        .option("key", "k")
        .option("startingversion", "1")
        .load()
        .writeStream.foreachBatch(
            make_cdf_replicator(rep, "scale_rep", "k")
        )
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out["cdf_replication_catchup (4 fixed deltas)"] = time.time() - t0
    # pruned convergence probe (reads ~1 group each side)
    src_w = t.read(spark, where={"k": (5_500, 5_600)}).agg(
        F.sum("cents")
    ).first()[0]
    rep_w = rep.read(spark, where={"k": (5_500, 5_600)}).agg(
        F.sum("cents")
    ).first()[0]
    assert src_w == rep_w, (src_w, rep_w)

    # --- r13: incremental MV refresh at 100x ---
    # bootstrap (untimed, the MV's one full aggregate), then one more
    # fixed 2k-key merge on the source; timed: the refresh folding
    # exactly that delta — CDF of one version + a grouped MERGE into a
    # <=4-row MV. Delta-bound, so ~flat at 100x.
    from file_stream_import_spark.operators.mv import refresh_mv

    mvt = VersionedTable(os.path.join(root, "mv"))
    refresh_mv(
        t, mvt, spark,
        name="scale_mv", group_cols=["status"], sum_cols=["cents"],
        key="k",
    )
    merge_into(
        t, spark,
        o.filter(F.col("k").between(20_000, 22_000))
        .withColumn("status", F.lit("V"))
        .localCheckpoint(eager=True),
        key="k",
    )
    t0 = time.time()
    refresh_mv(
        t, mvt, spark,
        name="scale_mv", group_cols=["status"], sum_cols=["cents"],
        key="k",
    )
    out["mv_refresh (one fixed 2k-delta commit)"] = time.time() - t0

    # --- r13 (continued): MIN/MAX MV — an extreme-touching delete
    # endangers ONLY status 'V' (the 2k synthetic keys above), whose
    # rows live in the few groups the merge rewrote; the exact
    # recompute is group-pruned to them via the status stats boxes,
    # so the refresh stays delta-bound at 100x.
    from file_stream_import_spark.operators.mv import refresh_join_mv

    mm = VersionedTable(os.path.join(root, "mv_mm"))
    refresh_mv(
        t, mm, spark, name="scale_mm", group_cols=["status"],
        sum_cols=["cents"], key="k", min_cols=["cents"],
    )
    vmin = (
        t.read(spark, where={"k": (20_000, 22_000)})
        .filter(F.col("status") == "V")
        .agg(F.min("cents"))
        .first()[0]
    )
    t.delete_where(
        spark,
        (F.col("status") == "V") & (F.col("cents") == vmin),
        prune_where="auto",
    )
    t0 = time.time()
    refresh_mv(
        t, mm, spark, name="scale_mm", group_cols=["status"],
        sum_cols=["cents"], key="k", min_cols=["cents"],
    )
    out["mv_minmax_refresh (extreme-delete, pruned recompute)"] = (
        time.time() - t0
    )

    # --- r13 (continued): JOIN-MV — one window with 2k-key deltas on
    # BOTH sides; each delta joins the other side's snapshot pruned to
    # its join keys (k-stats point reads), so neither 45M-row snapshot
    # is rescanned and the refresh stays flat at 100x.
    bt = VersionedTable(os.path.join(root, "dim"))
    bt.commit(
        o.filter(F.col("k") <= 5_000)
        .select("k", (F.col("k") % 5).cast("string").alias("seg"))
        .localCheckpoint(eager=True),
        mode="overwrite",
    )
    jmv = VersionedTable(os.path.join(root, "mv_j"))
    refresh_join_mv(
        t, bt, jmv, spark, name="scale_jmv", on=["k"],
        group_cols=["seg"], sum_cols=["cents"], key_a="k", key_b="k",
    )
    merge_into(
        t, spark,
        o.filter(F.col("k").between(2_000, 4_000))
        .withColumn("cents", F.col("cents") + 1)
        .localCheckpoint(eager=True),
        key="k",
    )
    merge_into(
        bt, spark,
        o.filter(F.col("k").between(1_000, 3_000))
        .select("k", F.lit("9").alias("seg"))
        .localCheckpoint(eager=True),
        key="k",
    )
    t0 = time.time()
    refresh_join_mv(
        t, bt, jmv, spark, name="scale_jmv", on=["k"],
        group_cols=["seg"], sum_cols=["cents"], key_a="k", key_b="k",
    )
    out["join_mv_refresh (2k-delta each side, pruned)"] = (
        time.time() - t0
    )

    t0 = time.time()
    total, detail = t.count_where(
        spark, where={"k": (10_000, 50_000)}, detail=True
    )
    out["count_where (boundary window)"] = time.time() - t0

    t0 = time.time()
    agg, adetail = t.agg_where(
        spark, "cents", where={"k": (10_000, 50_000)}, detail=True
    )
    out["agg_where min/max/sum (same window)"] = time.time() - t0

    # fixed backlog of 20 tiny appends, then incremental compaction —
    # bin-packing must select ONLY the small groups regardless of how
    # many big ones exist
    for i in range(20):
        t.commit(
            o.filter(
                F.col("k").between(n + 1 + 50 * i, n + 50 * (i + 1))
            ).withColumn("k", F.col("k") + F.lit(0)),
            mode="append",
        )
    before = len(t._load_manifest(t.latest_version())["groups"])
    t0 = time.time()
    t.compact(spark, min_bytes=64 * 1024)
    out["compact (fixed 20-group backlog)"] = time.time() - t0
    after = len(t._load_manifest(t.latest_version())["groups"])

    # --- r13 (continued): incremental clustering — a fixed 2-commit
    # unclustered tail re-clustered against a base whose clustered
    # group count grew 100x; O(new data), so flat
    t.optimize(spark, cluster_by="k", target_groups=max(4, n_groups))
    for i in range(2):
        t.commit(
            o.filter(
                F.col("k").between(3_000 + 1_000 * i, 3_999 + 1_000 * i)
            ),
            mode="append",
        )
    t0 = time.time()
    t.optimize_incremental(spark, target_groups=1)
    out["optimize_incremental (fixed 2-commit tail)"] = time.time() - t0

    t0 = time.time()
    t.rename_column("cents", "amount")
    out["rename_column (metadata-only)"] = time.time() - t0

    t0 = time.time()
    t.read(spark, where={"k": (500, 600)}).count()
    out["point_window_read (1-group scan)"] = time.time() - t0

    shutil.rmtree(root, ignore_errors=True)
    meta = {
        "rows": n,
        "groups": n_groups,
        "win_detail": detail,
        "agg_detail": adetail,
        "compact": f"{before}->{after}",
        "cdf_rows": n_cdf,
        "batch_cdf_rows": n_bcdf,
        "row_cal": row_cal,
    }
    return out, meta


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale_lake_sf10")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import scale_sf10

    scale_sf10.build(spark)  # no-op when /tmp/sf10 already exists

    # r16 (VERDICT #5): the campaign's OPENING rows (partitioned_commit,
    # merge_clauses) have been the most host-phase-sensitive measurements
    # two rounds running — gate on bench.py's calibration probe exactly
    # like bench.py does (wait-and-reprobe on a noisy start), and record
    # a reading before each campaign and one at the end so every section
    # of the table carries its own weather report.
    import json

    import bench

    cal = {"first": bench.calibrate(spark, "first")}
    r01, m01 = campaign(spark, SRC01, "sf01")
    cal["mid"] = bench.calibrate(spark, "mid")
    r10, m10 = campaign(spark, scale_sf10.DST, "sf10")
    cal["last"] = bench.calibrate(spark, "last")
    noisy = any(
        c["drift"] > bench.CAL_DRIFT_MAX for c in cal.values()
    )
    print(f"sf0.1: {m01}")
    print(f"sf10 : {m10}")
    print(
        "calibration: "
        + json.dumps(
            {
                **cal,
                "baseline_s": bench.CAL_BASELINE_S,
                "host_phase": "noisy" if noisy else "quiet",
            }
        )
    )
    print()
    print("| operation | sf0.1 | sf10 (100x rows, 100x groups) | ratio |")
    print("|---|---|---|---|")
    for k in r01:
        print(
            f"| {k} | {r01[k]:.3f} | {r10[k]:.3f} "
            f"| {r10[k] / r01[k]:.1f}x |"
        )
    if noisy:
        print(
            "\nNOTE: a calibration reading exceeded the quiet "
            "threshold — in-campaign ratios for the opening rows are "
            "phase-hostage; prefer a quiet-window re-run before "
            "recording them."
        )


if __name__ == "__main__":
    main()
