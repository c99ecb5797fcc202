"""Round-13 driver queries: rename evolution REPLAYED through the
streaming change-data-feed.

* stream_cdf_after_rename — a readchangedata stream whose replay range
  contains a rename commit BETWEEN diffed pairs: versions before the
  rename (including a group REWRITTEN AWAY before the rename ever
  happened, so no manifest records its routing) must still surface
  their inserts and pre/postimages under the pinned post-rename column
  name. Pins the renamed column's SUM per (commit, change_type) — the
  value-hash catches a NULLed-out rename column, not just row counts.
  The r13 fix: io/pysource._resolved_map synthesizes file->pinned
  routing from each walked manifest's own schema through the rename
  chain after it, and folds recorded entries through later renames.

Reference parity: the reference holds schema constant (SURVEY §3,
internal/db/db.go locations DDL); rename-through-replay is north-star
lakehouse surface (Delta readChangeFeed + Iceberg field identity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from .round11 import _densified_orders


@register(
    "stream_cdf_after_rename",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) AS n, COUNT(*) // 10 AS u FROM base)
    SELECT * FROM (
      SELECT 0 AS commit_version, 'insert' AS change_type,
             CAST((SELECT n FROM p) AS BIGINT) AS n_rows,
             CAST((SELECT SUM(cents) FROM base) AS BIGINT) AS pennies
      UNION ALL
      SELECT 1, 'update_preimage',
             CAST((SELECT u FROM p) AS BIGINT),
             CAST((SELECT SUM(cents) FROM base b, p
                   WHERE b.k <= p.u) AS BIGINT)
      UNION ALL
      SELECT 1, 'update_postimage',
             CAST((SELECT u FROM p) AS BIGINT),
             CAST((SELECT SUM(cents) + u FROM base b, p
                   WHERE b.k <= p.u GROUP BY p.u) AS BIGINT)
      UNION ALL
      SELECT 3, 'update_preimage',
             CAST((SELECT u FROM p) AS BIGINT),
             CAST((SELECT SUM(cents) FROM base b, p
                   WHERE b.k > p.u AND b.k <= 2 * p.u) AS BIGINT)
      UNION ALL
      SELECT 3, 'update_postimage',
             CAST((SELECT u FROM p) AS BIGINT),
             CAST((SELECT SUM(cents) + 2 * u FROM base b, p
                   WHERE b.k > p.u AND b.k <= 2 * p.u GROUP BY p.u)
                  AS BIGINT)
    )
    CROSS JOIN (SELECT CAST(4 AS INT) AS n_batches,
                       CAST(3 AS INT) AS nonempty_batches)
    """,
)
def stream_cdf_after_rename(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming CDF with a RENAME inside the replayed range
    (io/pysource.py::_resolved_map rename-chain synthesis, r13).
    History: v0 inserts every densified order (k, cents); v1 MERGE
    bumps the first u keys (+1 cent) — rewriting v0's only group, so
    that group is DEAD before v2 renames cents->pennies; v3 MERGE
    bumps keys (u, 2u] (+2). The stream replays from earliest with the
    schema pinned post-rename: v0's inserts and v1's pre/postimages
    must surface their cent values under ``pennies`` even though their
    files are named ``cents`` and no manifest ever recorded routing
    for the dead group. Counts AND pennies-sums are pinned per
    (commit, change_type); batch counts pin the rename commit's empty
    micro-batch (4 planned, 3 non-empty at 1 version/trigger)."""
    import shutil
    import tempfile

    from ..io.pysource import TableChangefeedDataSource
    from ..io.versioned import VersionedTable, merge_into

    o = _densified_orders(spark, sf_dir).select("k", "cents")
    u = o.count() // 10
    o = o.localCheckpoint(eager=True)
    spark.dataSource.register(TableChangefeedDataSource)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_cdf_ren_"))
    ckpt = tempfile.mkdtemp(prefix="lake_cdf_ren_ck_")
    batches: list[int] = []
    rows: list[tuple] = []
    try:
        t.commit(o, mode="overwrite")
        merge_into(
            t,
            spark,
            o.filter(F.col("k") <= u).withColumn(
                "cents", F.col("cents") + F.lit(1)
            ),
            key="k",
        )
        t.rename_column("cents", "pennies")
        merge_into(
            t,
            spark,
            o.filter(F.col("k").between(u + 1, 2 * u)).select(
                "k", (F.col("cents") + F.lit(2)).alias("pennies")
            ),
            key="k",
        )

        def sink(df, _bid):
            got = [
                (r["_commit_version"], r["_change_type"], r["pennies"])
                for r in df.collect()
            ]
            batches.append(len(got))
            rows.extend(got)

        q = (
            spark.readStream.format("table_changefeed")
            .option("path", t.path)
            .option("readchangedata", "true")
            .option("key", "k")
            .option("maxversionspertrigger", "1")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            spark.createDataFrame(
                rows,
                "commit_version int, change_type string, pennies bigint",
            )
            .groupBy("commit_version", "change_type")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("pennies").cast("bigint").alias("pennies"),
            )
            .withColumn("n_batches", F.lit(len(batches)).cast("int"))
            .withColumn(
                "nonempty_batches",
                F.lit(sum(1 for n in batches if n)).cast("int"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


@register(
    "stream_cdf_midstream_rename",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) AS n, COUNT(*) // 10 AS u FROM base)
    SELECT 0 AS commit_version, 'insert' AS change_type,
           CAST((SELECT n FROM p) AS BIGINT) AS n_rows,
           CAST((SELECT SUM(cents) FROM base) AS BIGINT) AS cents
    UNION ALL
    SELECT 2, 'insert',
           CAST((SELECT u FROM p) AS BIGINT),
           CAST((SELECT SUM(cents) + 5 * u FROM base b, p
                 WHERE b.k <= p.u GROUP BY p.u) AS BIGINT)
    UNION ALL
    SELECT 3, 'update_preimage',
           CAST((SELECT u FROM p) AS BIGINT),
           CAST((SELECT SUM(cents) FROM base b, p
                 WHERE b.k <= p.u) AS BIGINT)
    UNION ALL
    SELECT 3, 'update_postimage',
           CAST((SELECT u FROM p) AS BIGINT),
           CAST((SELECT SUM(cents) + 3 * u FROM base b, p
                 WHERE b.k <= p.u GROUP BY p.u) AS BIGINT)
    """,
)
def stream_cdf_midstream_rename(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A rename landing MID-STREAM, after the CDF stream pinned its
    schema (io/pysource.py::_post_pin_overlay, r13): the stream starts
    on (k, cents), drains v0, and THEN the table renames
    cents->pennies, appends u shifted rows, and merges +3 onto the
    first u keys — all under the NEW name. The stream's output schema
    stays pinned, and every post-rename value must flow under
    ``cents`` (pre-overlay they surfaced as NULL — silent data loss;
    Delta stops the stream instead). Counts and the pinned column's
    SUM are hashed per (commit, change_type)."""
    import shutil
    import tempfile

    from ..io.pysource import TableChangefeedDataSource
    from ..io.versioned import VersionedTable, merge_into

    o = _densified_orders(spark, sf_dir).select("k", "cents")
    n = o.count()
    u = n // 10
    o = o.localCheckpoint(eager=True)
    spark.dataSource.register(TableChangefeedDataSource)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_cdf_mid_"))
    ckpt = tempfile.mkdtemp(prefix="lake_cdf_mid_ck_")
    rows: list[tuple] = []
    try:
        t.commit(o, mode="overwrite")

        def sink(df, _bid):
            rows.extend(
                (r["_commit_version"], r["_change_type"], r["cents"])
                for r in df.collect()
            )

        q = (
            spark.readStream.format("table_changefeed")
            .option("path", t.path)
            .option("readchangedata", "true")
            .option("key", "k")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()  # v0 inserts, schema now pinned
            t.rename_column("cents", "pennies")          # v1
            t.commit(
                o.filter(F.col("k") <= u).select(
                    (F.col("k") + n).alias("k"),
                    (F.col("cents") + 5).alias("pennies"),
                ),
                mode="append",
            )                                            # v2
            merge_into(
                t,
                spark,
                o.filter(F.col("k") <= u).select(
                    "k", (F.col("cents") + 3).alias("pennies")
                ),
                key="k",
            )                                            # v3
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            spark.createDataFrame(
                rows,
                "commit_version int, change_type string, cents bigint",
            )
            .groupBy("commit_version", "change_type")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


@register(
    "lake_incremental_mv",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) AS n, COUNT(*) // 3 AS third,
                 COUNT(*) // 10 AS u
          FROM base),
    final AS (
      SELECT b.k,
             CASE WHEN b.k <= p.u THEN 'MV' ELSE b.status END AS status,
             CASE WHEN b.k <= p.u THEN b.cents + 7 ELSE b.cents END
               AS cents
      FROM base b, p
      WHERE NOT (b.k > p.u AND b.k <= 2 * p.u)
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(0 AS INT) AS bootstrap_src_version,
           CAST(3 AS INT) AS final_src_version,
           CAST(1 AS INT) AS incremental_refreshes
    FROM final GROUP BY status
    """,
)
def lake_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (operators/mv.py::refresh_mv, r13): a (status -> count, cent-sum)
    MV bootstrapped at v0 (two-thirds of the densified orders), then
    the source APPENDS the last third (v1), a MERGE moves the first u
    keys into a NEW group 'MV' with +7 cents (v2 — the
    group-membership move: -1 old group / +1 new), and a CoW DELETE
    drops keys (u, 2u] (v3). ONE incremental refresh folds v1..v3's
    CDF into signed grouped deltas and MERGEs them in — O(delta), the
    source is never rescanned. The MV content (counts AND sums per
    group, including the vanished-group sweep) is hashed against the
    oracle's full recompute; the watermark versions and the refresh
    count are PINNED."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.mv import refresh_mv

    o = _densified_orders(spark, sf_dir)
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_mv_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_mv_"))
    try:
        src.commit(
            o.filter(F.col("k") <= 2 * third).select(
                "k", "status", "cents"
            ),
            mode="overwrite",
        )                                                   # v0
        boot_v = refresh_mv(
            src, mv, spark,
            name="orders_by_status",
            group_cols=["status"], sum_cols=["cents"], key="k",
        )
        src.commit(
            o.filter(F.col("k") > 2 * third).select(
                "k", "status", "cents"
            ),
            mode="append",
        )                                                   # v1
        merge_into(
            src, spark,
            o.filter(F.col("k") <= u).select(
                "k",
                F.lit("MV").alias("status"),
                (F.col("cents") + 7).alias("cents"),
            ),
            key="k",
        )                                                   # v2
        src.delete_where(
            spark, F.col("k").between(u + 1, 2 * u), prune_where="auto"
        )                                                   # v3
        final_v = refresh_mv(
            src, mv, spark,
            name="orders_by_status",
            group_cols=["status"], sum_cols=["cents"], key="k",
        )
        out = (
            mv.read(spark)
            .select("status", "n_rows", "cents")
            .withColumn(
                "bootstrap_src_version", F.lit(int(boot_v)).cast("int")
            )
            .withColumn(
                "final_src_version", F.lit(int(final_v)).cast("int")
            )
            .withColumn("incremental_refreshes", F.lit(1).cast("int"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out


@register(
    "lake_mv_minmax",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 3 AS third, COUNT(*) // 10 AS u
          FROM base),
    merged AS (
      SELECT b.k,
             CASE WHEN b.k <= p.u THEN 'MV' ELSE b.status END AS status,
             CASE WHEN b.k <= p.u THEN b.cents + 7 ELSE b.cents END
               AS cents
      FROM base b, p
    ),
    final AS (
      SELECT * FROM merged
      WHERE cents >= 5000000 AND cents <= 40000000
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           MIN(cents) AS cents_min,
           MAX(cents) AS cents_max,
           CAST(0 AS INT) AS bootstrap_src_version,
           CAST(3 AS INT) AS final_src_version
    FROM final GROUP BY status
    """,
)
def lake_mv_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX incremental MV maintenance (operators/mv.py, r13
    continued): a (status -> count, sum, MIN, MAX of cents) MV
    bootstrapped at v0 (two-thirds of the densified orders), then the
    source APPENDS the last third (v1 — extremes fold via
    LEAST/GREATEST, no rescan), a MERGE moves the lowest u keys into a
    new group 'MV' at +7 cents (v2 — their old groups lose rows whose
    values may touch the stored minima -> endangered), and a CoW
    DELETE drops both tails (cents < 5e6 OR cents > 4e7, v3 —
    guaranteed to remove per-group extremes, forcing the exact
    endangered-group recompute). ONE incremental refresh folds
    v1..v3; the MV content — including the recomputed extremes — is
    hashed against the oracle's full recompute."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.mv import refresh_mv

    o = _densified_orders(spark, sf_dir)
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_mvmm_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_mvmm_"))
    try:
        src.commit(
            o.filter(F.col("k") <= 2 * third).select(
                "k", "status", "cents"
            ),
            mode="overwrite",
        )                                                   # v0
        boot_v = refresh_mv(
            src, mv, spark,
            name="orders_mm",
            group_cols=["status"], sum_cols=["cents"], key="k",
            min_cols=["cents"], max_cols=["cents"],
        )
        src.commit(
            o.filter(F.col("k") > 2 * third).select(
                "k", "status", "cents"
            ),
            mode="append",
        )                                                   # v1
        merge_into(
            src, spark,
            o.filter(F.col("k") <= u).select(
                "k",
                F.lit("MV").alias("status"),
                (F.col("cents") + 7).alias("cents"),
            ),
            key="k",
        )                                                   # v2
        src.delete_where(
            spark,
            (F.col("cents") < 5_000_000)
            | (F.col("cents") > 40_000_000),
            prune_where="auto",
        )                                                   # v3
        final_v = refresh_mv(
            src, mv, spark,
            name="orders_mm",
            group_cols=["status"], sum_cols=["cents"], key="k",
            min_cols=["cents"], max_cols=["cents"],
        )
        out = (
            mv.read(spark)
            .select("status", "n_rows", "cents", "cents_min", "cents_max")
            .withColumn(
                "bootstrap_src_version", F.lit(int(boot_v)).cast("int")
            )
            .withColumn(
                "final_src_version", F.lit(int(final_v)).cast("int")
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out


@register(
    "lake_join_mv",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_custkey AS ck,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 10 AS u FROM base),
    a AS (
      SELECT b.k, b.ck,
             CASE WHEN b.k <= p.u THEN b.cents + 7 ELSE b.cents END
               AS cents
      FROM base b, p
    ),
    b AS (
      SELECT c_custkey AS ck,
             CASE WHEN c_custkey % 10 = 0 THEN 'MV'
                  ELSE c_mktsegment END AS seg
      FROM customer
      WHERE c_custkey % 7 <> 0
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(2 AS INT) AS final_va,
           CAST(2 AS INT) AS final_vb
    FROM a JOIN b USING (ck)
    GROUP BY seg
    """,
)
def lake_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-MV maintenance
    (operators/mv.py::refresh_join_mv, r13 continued): a (mktsegment
    -> count, cent-sum) MV over orders |><| customer, bootstrapped at
    (a=v0, b=v0) with two-thirds of the densified orders, then BOTH
    sides change in one window — A appends the last third (a=v1) and
    merges +7 cents into the lowest u keys (a=v2); B moves every
    custkey % 10 == 0 into segment 'MV' (b=v1) and deletes custkey %
    7 == 0 (b=v2, cascading their orders out of the view). ONE
    incremental refresh folds the delta-join decomposition
    dA|><|B_new UNION A_old|><|dB — neither snapshot is rescanned
    (group-pruned point reads against the delta's join keys) — and
    the MV content is hashed against the oracle's full recompute.
    Both watermarks are PINNED."""
    import shutil
    import tempfile

    from ..io.tables import load_table
    from ..io.versioned import VersionedTable, merge_into
    from ..operators.curation import dense_sequence
    from ..operators.mv import refresh_join_mv

    o = dense_sequence(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.col("o_custkey").alias("ck"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        ),
        "o_orderkey",
        out_col="k",
    ).select("k", "ck", "cents")
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    c = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        )
        .localCheckpoint(eager=True)
    )
    a = VersionedTable(tempfile.mkdtemp(prefix="lake_jmv_a_"))
    b = VersionedTable(tempfile.mkdtemp(prefix="lake_jmv_b_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_jmv_"))
    try:
        a.commit(
            o.filter(F.col("k") <= 2 * third), mode="overwrite"
        )                                                   # a v0
        b.commit(c, mode="overwrite")                       # b v0
        refresh_join_mv(
            a, b, mv, spark,
            name="rev_by_seg", on=["ck"], group_cols=["seg"],
            sum_cols=["cents"], key_a="k", key_b="ck",
        )
        a.commit(o.filter(F.col("k") > 2 * third), mode="append")
        merge_into(
            a, spark,
            o.filter(F.col("k") <= u).withColumn(
                "cents", F.col("cents") + 7
            ),
            key="k",
        )                                                   # a v2
        merge_into(
            b, spark,
            c.filter(F.col("ck") % 10 == 0).withColumn(
                "seg", F.lit("MV")
            ),
            key="ck",
        )                                                   # b v1
        b.delete_where(
            spark, F.col("ck") % 7 == 0, prune_where="auto"
        )                                                   # b v2
        va, vb = refresh_join_mv(
            a, b, mv, spark,
            name="rev_by_seg", on=["ck"], group_cols=["seg"],
            sum_cols=["cents"], key_a="k", key_b="ck",
        )
        out = (
            mv.read(spark)
            .select("seg", "n_rows", "cents")
            .withColumn("final_va", F.lit(int(va)).cast("int"))
            .withColumn("final_vb", F.lit(int(vb)).cast("int"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(a.path, ignore_errors=True)
        shutil.rmtree(b.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out


@register(
    "stream_mv_maintenance",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (
      SELECT COUNT(*) // 3 AS third,
             (COUNT(*) // 3) // 3 AS u,
             2 * ((COUNT(*) // 3) // 3) AS d
      FROM base
    ),
    final AS (
      SELECT b.k,
             CASE WHEN b.k <= p.u THEN 'MV' ELSE b.status END AS status,
             CASE WHEN b.k <= p.u THEN b.cents + 5 ELSE b.cents END
               AS cents
      FROM base b, p
      WHERE b.k <= p.third AND NOT (b.k > p.u AND b.k <= p.d)
      UNION ALL
      SELECT b.k, b.status, b.cents
      FROM base b, p
      WHERE b.k > p.third AND b.k <= p.third + p.u
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(1 AS INT) AS matches_recompute
    FROM final GROUP BY status
    """,
)
def stream_mv_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING IVM (operators/mv.py::make_mv_maintainer, r13
    continued): a REAL readchangedata stream folds the source's CDF
    straight into a (status -> count, cent-sum) MV in foreachBatch —
    batch_id as the atomic txn epoch (exactly-once), NO bootstrap scan
    (the empty MV plus the replayed v0 inserts IS the aggregate). The
    source history: v0 inserts two-thirds, a MERGE moves the first u
    keys into group 'MV' at +5 cents, a CoW DELETE drops (u, d], and
    an append lands the next u keys — drained at one version per
    trigger, so every DML kind crosses a batch boundary. The MV
    content is hashed against the oracle's full recompute, and
    MV == batch recompute of the final source is pinned as a flag."""
    import shutil
    import tempfile

    from ..io.pysource import TableChangefeedDataSource
    from ..io.versioned import VersionedTable, merge_into
    from ..operators.mv import make_mv_maintainer

    o = _densified_orders(spark, sf_dir)
    third = o.count() // 3
    u, d = third // 3, 2 * (third // 3)
    o = o.filter(F.col("k") <= 3 * third).localCheckpoint(eager=True)
    spark.dataSource.register(TableChangefeedDataSource)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_smv_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_smv_mv_"))
    ckpt = tempfile.mkdtemp(prefix="lake_smv_ck_")
    try:
        src.commit(o.filter(F.col("k") <= third), mode="overwrite")
        merge_into(
            src,
            spark,
            o.filter(F.col("k") <= u).select(
                "k",
                F.lit("MV").alias("status"),
                (F.col("cents") + 5).alias("cents"),
            ),
            key="k",
        )
        src.delete_where(spark, F.col("k").between(u + 1, d))
        src.commit(
            o.filter(F.col("k").between(third + 1, third + u)),
            mode="append",
        )
        q = (
            spark.readStream.format("table_changefeed")
            .option("path", src.path)
            .option("readchangedata", "true")
            .option("key", "k")
            .option("maxversionspertrigger", "1")
            .load()
            .writeStream.foreachBatch(
                make_mv_maintainer(
                    mv, "smv", group_cols=["status"],
                    sum_cols=["cents"],
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        recompute = (
            src.read(spark)
            .groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.coalesce(F.sum("cents"), F.lit(0))
                .cast("bigint")
                .alias("cents"),
            )
        )
        mv_df = mv.read(spark).select("status", "n_rows", "cents")
        matches = int(
            mv_df.exceptAll(recompute).isEmpty()
            and recompute.exceptAll(mv_df).isEmpty()
        )
        out = (
            mv_df.withColumn(
                "matches_recompute", F.lit(matches).cast("int")
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


@register(
    "batch_cdf_backfill",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (
      SELECT COUNT(*) // 3 AS third,
             (COUNT(*) // 3) // 3 AS u,
             2 * ((COUNT(*) // 3) // 3) AS d
      FROM base
    )
    SELECT * FROM (
      SELECT 'insert' AS change_type,
             CAST((SELECT third + u FROM p) AS BIGINT) AS n_rows,
             CAST((SELECT SUM(cents) FROM base b, p
                   WHERE b.k <= p.third + p.u) AS BIGINT) AS cents
      UNION ALL
      SELECT 'update_preimage',
             CAST((SELECT u FROM p) AS BIGINT),
             CAST((SELECT SUM(cents) FROM base b, p
                   WHERE b.k <= p.u) AS BIGINT)
      UNION ALL
      SELECT 'update_postimage',
             CAST((SELECT u FROM p) AS BIGINT),
             CAST((SELECT SUM(cents) + 5 * u FROM base b, p
                   WHERE b.k <= p.u GROUP BY p.u) AS BIGINT)
      UNION ALL
      SELECT 'delete',
             CAST((SELECT d - u FROM p) AS BIGINT),
             CAST((SELECT SUM(cents) FROM base b, p
                   WHERE b.k > p.u AND b.k <= p.d) AS BIGINT)
    )
    CROSS JOIN (SELECT CAST(4 AS INT) AS n_versions)
    """,
)
def batch_cdf_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH change-data-feed read through the Python DataSource
    (io/pysource.py::TableChangefeedBatchReader, r13 continued) —
    Delta's batch-CDF surface, sharing the streaming partitioned
    reader's planner and Arrow diff kernels verbatim. The source
    history: v0 inserts two-thirds of the densified orders, a MERGE
    adds +5 cents to the first u keys (v1), a CoW DELETE drops (u, d]
    (v2), an append lands the next u keys (v3). One
    ``spark.read.format("table_changefeed")`` with readchangedata
    reads the whole range as ONE metadata-planned job — one task per
    added file, one Arrow diff task per rewrite — and the per-kind
    row counts + cent sums are hashed against the oracle. This is the
    executor-parallel historical-backfill path (~10x faster than the
    per-pair join plans at 300-version ranges, BASELINE)."""
    import shutil
    import tempfile

    from ..io.pysource import TableChangefeedDataSource
    from ..io.versioned import VersionedTable, merge_into

    o = _densified_orders(spark, sf_dir)
    third = o.count() // 3
    u, d = third // 3, 2 * (third // 3)
    o = (
        o.filter(F.col("k") <= 3 * third)
        .select("k", "cents")
        .localCheckpoint(eager=True)
    )
    spark.dataSource.register(TableChangefeedDataSource)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_bcdf_"))
    try:
        src.commit(o.filter(F.col("k") <= third), mode="overwrite")
        merge_into(
            src, spark,
            o.filter(F.col("k") <= u).withColumn(
                "cents", F.col("cents") + 5
            ),
            key="k",
        )
        src.delete_where(spark, F.col("k").between(u + 1, d))
        src.commit(
            o.filter(F.col("k").between(third + 1, third + u)),
            mode="append",
        )
        out = (
            spark.read.format("table_changefeed")
            .option("path", src.path)
            .option("readchangedata", "true")
            .option("key", "k")
            .load()
            .groupBy(F.col("_change_type").alias("change_type"))
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .withColumn(
                "n_versions",
                F.lit(int(src.latest_version()) + 1).cast("int"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
    return out


@register(
    "lake_optimize_incremental",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 2 AS half FROM base),
    capped AS (SELECT b.* FROM base b, p WHERE b.k <= 2 * p.half)
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(1 AS INT) AS base_groups_carried,
           CAST(1 AS INT) AS only_tail_rewritten,
           CAST(1 AS INT) AS probe_pruned
    FROM capped GROUP BY status
    """,
)
def lake_optimize_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental clustering
    (io/versioned.py::optimize_incremental, r13 continued): commit
    half the densified orders, OPTIMIZE range-clustered on k into 4
    groups, append the second half in two commits (the unclustered
    tail), then ONE incremental run — it must carry every clustered
    group BY REFERENCE (pinned: base_groups_carried), rewrite only the
    tail (pinned: only_tail_rewritten via the added-set check), and
    leave a k point-probe pruning to <= one group per layer (pinned:
    probe_pruned via count_where detail). Content hashed against the
    oracle. At 100 TB this is continuous ingest + periodic
    re-clustering at O(new data) per run instead of O(table)."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable

    o = _densified_orders(spark, sf_dir)
    half = o.count() // 2
    o = o.filter(F.col("k") <= 2 * half).localCheckpoint(eager=True)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_optinc_"))
    try:
        t.commit(o.filter(F.col("k") <= half), mode="overwrite")
        t.optimize(spark, cluster_by="k", target_groups=4)
        m0 = t._load_manifest(t.latest_version())
        clustered0 = set(m0["clustered"]["groups"])
        mid = half + (half // 2)
        t.commit(
            o.filter(F.col("k").between(half + 1, mid)), mode="append"
        )
        t.commit(o.filter(F.col("k") > mid), mode="append")
        v = t.optimize_incremental(spark, target_groups=2)
        m = t._load_manifest(v)
        carried = int(clustered0 <= set(m["groups"]))
        only_tail = int(
            sorted(m["added"])
            == sorted(set(m["groups"]) - clustered0)
        )
        lo = half // 3
        total, detail = t.count_where(
            spark, where={"k": (lo, lo + 50)}, detail=True
        )
        # 4 base + 2 layer groups: the 51-key probe inside the base
        # range must prune at least 4 of the 6
        pruned = int(
            total == 51 and detail["pruned"] >= 4
        )
        out = (
            t.read(spark)
            .groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .withColumn("base_groups_carried", F.lit(carried).cast("int"))
            .withColumn("only_tail_rewritten", F.lit(only_tail).cast("int"))
            .withColumn("probe_pruned", F.lit(pruned).cast("int"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out
