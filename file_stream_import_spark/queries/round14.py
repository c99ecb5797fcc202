"""Round-14 driver queries: the incremental-MV family extended to
EXACT COUNT DISTINCT (support-table IVM) and exact decimal SUM
folding.

* lake_mv_distinct — a (status -> count, sum, COUNT DISTINCT) MV
  maintained O(delta) through appends, group-moving merges, and
  deletes that remove both duplicate and last-occurrence values; the
  final MV is hashed against the oracle's full recompute.
* lake_mv_decimal — SUM over a decimal(38,3) measure whose magnitude
  (~23 significant digits) exceeds double precision: the incremental
  fold must be EXACT decimal arithmetic or the hash visibly drifts.

Reference parity: the reference aggregates in Postgres at query time
(SURVEY §3); incremental maintenance of distinct counts and exact
decimal sums is north-star lakehouse surface (Delta Live Tables /
classic IVM support-count construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from .round11 import _densified_orders


@register(
    "lake_mv_distinct",
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
             CASE WHEN b.k <= p.u THEN b.cents + 3 ELSE b.cents END
               AS cents
      FROM base b, p
      WHERE NOT (b.k > p.u AND b.k <= 2 * p.u)
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(COUNT(DISTINCT CAST(cents % 97 AS VARCHAR)) AS BIGINT)
             AS v_nd,
           CAST(0 AS INT) AS bootstrap_src_version,
           CAST(3 AS INT) AS final_src_version
    FROM final GROUP BY status
    """,
)
def lake_mv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT DISTINCT in the incremental MV
    (operators/mv.py::refresh_mv distinct_cols, r14): the MV keeps a
    per-(group, value) support table (nd_aux_table) folded O(delta)
    from the same CDF walk as the sums — an insert only grows the
    count when the value is NEW to the group, a delete only shrinks
    it when the LAST occurrence left, and both cases are decided from
    the support counts, never a source rescan. History: v0 bootstraps
    two-thirds of the densified orders with v = cents % 97 (97 values
    per group -> heavy duplication, the case support counts exist
    for); v1 appends the last third; v2 MERGEs the first u keys into
    group 'MV' at +3 cents (the value column moves with the cents);
    v3 CoW-DELETEs keys (u, 2u] — removing duplicate occurrences in
    some (group, value) buckets and last occurrences in others. ONE
    incremental refresh folds v1..v3; counts, sums, AND distinct
    counts are hashed against the oracle's full recompute."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.mv import refresh_mv

    def with_v(df):
        return df.withColumn(
            "v", (F.col("cents") % 97).cast("string")
        )

    o = _densified_orders(spark, sf_dir)
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_mvnd_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_mvnd_"))
    kw = dict(
        name="orders_nd", group_cols=["status"], sum_cols=["cents"],
        key="k", distinct_cols=["v"],
    )
    try:
        src.commit(
            with_v(o.filter(F.col("k") <= 2 * third)).select(
                "k", "status", "cents", "v"
            ),
            mode="overwrite",
        )                                                   # v0
        boot_v = refresh_mv(src, mv, spark, **kw)
        src.commit(
            with_v(o.filter(F.col("k") > 2 * third)).select(
                "k", "status", "cents", "v"
            ),
            mode="append",
        )                                                   # v1
        merge_into(
            src, spark,
            with_v(
                o.filter(F.col("k") <= u).select(
                    "k",
                    F.lit("MV").alias("status"),
                    (F.col("cents") + 3).alias("cents"),
                )
            ).select("k", "status", "cents", "v"),
            key="k",
        )                                                   # v2
        src.delete_where(
            spark, F.col("k").between(u + 1, 2 * u), prune_where="auto"
        )                                                   # v3
        final_v = refresh_mv(src, mv, spark, **kw)
        out = (
            mv.read(spark)
            .select("status", "n_rows", "cents", "v_nd")
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
        shutil.rmtree(f"{mv.path.rstrip('/')}_nd", ignore_errors=True)
    return out


@register(
    "lake_mv_decimal",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 3 AS third, COUNT(*) // 10 AS u
          FROM base),
    final AS (
      SELECT b.k,
             CASE WHEN b.k <= p.u THEN 'MV' ELSE b.status END AS status,
             CAST(b.cents AS HUGEINT) * 100000000000 + (b.k % 7)
               + CASE WHEN b.k <= p.u THEN 7 ELSE 0 END AS millis
      FROM base b, p
      WHERE NOT (b.k > p.u AND b.k <= 2 * p.u)
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(millis) AS VARCHAR) AS d_millis
    FROM final GROUP BY status
    """,
)
def lake_mv_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal SUM in the incremental MV (operators/mv.py::
    _sum_fold_types, r14 — replacing the r13 loud rejection): the
    measure is cents * 1e8 + (k % 7)/1000 as decimal(38,3), whose
    group sums carry ~23 significant digits — past double precision,
    so only an exact decimal(38,s) fold matches the oracle (DuckDB
    folds the same values in HUGEINT millis). History mirrors the MV
    family: bootstrap two-thirds (v0), append (v1), group-moving
    MERGE at +0.007 (v2), CoW DELETE (v3), ONE incremental refresh.
    The summed millis are compared as exact integer STRINGS (the
    values exceed bigint)."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.mv import refresh_mv

    def with_d(df, bump=0):
        millis = (
            F.col("cents").cast("decimal(38,0)")
            * F.lit(100000000000)
            + (F.col("k") % 7).cast("decimal(38,0)")
            + F.lit(bump)
        )
        return df.withColumn(
            "d", (millis / 1000).cast("decimal(38,3)")
        )

    o = _densified_orders(spark, sf_dir)
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_mvdec_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_mvdec_"))
    kw = dict(
        name="orders_dec", group_cols=["status"], sum_cols=["d"],
        key="k",
    )
    try:
        src.commit(
            with_d(o.filter(F.col("k") <= 2 * third)).select(
                "k", "status", "d"
            ),
            mode="overwrite",
        )                                                   # v0
        refresh_mv(src, mv, spark, **kw)
        src.commit(
            with_d(o.filter(F.col("k") > 2 * third)).select(
                "k", "status", "d"
            ),
            mode="append",
        )                                                   # v1
        merge_into(
            src, spark,
            with_d(o.filter(F.col("k") <= u), bump=7).select(
                "k", F.lit("MV").alias("status"), "d"
            ),
            key="k",
        )                                                   # v2
        src.delete_where(
            spark, F.col("k").between(u + 1, 2 * u), prune_where="auto"
        )                                                   # v3
        refresh_mv(src, mv, spark, **kw)
        out = (
            mv.read(spark)
            .select(
                "status",
                "n_rows",
                (F.col("d") * 1000)
                .cast("decimal(38,0)")
                .cast("string")
                .alias("d_millis"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out


@register(
    "stream_mv_minmax_distinct",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (
      SELECT COUNT(*) // 3 AS third,
             (COUNT(*) // 3) // 3 AS u
      FROM base
    ),
    merged AS (
      SELECT b.k,
             CASE WHEN b.k <= p.u THEN 'MV' ELSE b.status END AS status,
             CASE WHEN b.k <= p.u THEN b.cents + 5 ELSE b.cents END
               AS cents
      FROM base b, p
      WHERE b.k <= p.third
    ),
    final AS (
      SELECT k, status, cents FROM merged
      WHERE cents >= 5000000 AND cents <= 40000000
      UNION ALL
      SELECT b.k, b.status, b.cents
      FROM base b, p
      WHERE b.k > p.third AND b.k <= p.third + p.u
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           MIN(cents) AS cents_min,
           MAX(cents) AS cents_max,
           CAST(COUNT(DISTINCT CAST(cents % 97 AS VARCHAR)) AS BIGINT)
             AS v_nd,
           CAST(1 AS INT) AS matches_recompute
    FROM final GROUP BY status
    """,
)
def stream_mv_minmax_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING IVM measure parity (operators/mv.py::
    make_mv_maintainer, r14): the full measure set — SUM, COUNT,
    MIN/MAX, exact COUNT DISTINCT — maintained by a REAL
    readchangedata stream at one version per trigger, so every DML
    kind crosses a batch boundary. The source history is built to
    endanger stored state between batches: v0 inserts two-thirds, a
    MERGE moves the first u keys into group 'MV' at +5 cents (v1),
    a CoW DELETE drops both cent tails (v2 — guaranteed to remove
    per-group extremes, forcing the endangered recompute against the
    BATCH-PINNED source snapshot, and to remove last occurrences of
    distinct values), and an append lands the next u keys (v3). The
    MV content is hashed against the oracle's full recompute and
    MV == batch recompute is pinned as a flag."""
    import shutil
    import tempfile

    from ..io.pysource import TableChangefeedDataSource
    from ..io.versioned import VersionedTable, merge_into
    from ..operators.mv import make_mv_maintainer

    def with_v(df):
        return df.withColumn(
            "v", (F.col("cents") % 97).cast("string")
        )

    o = _densified_orders(spark, sf_dir)
    third = o.count() // 3
    u = third // 3
    o = o.filter(F.col("k") <= 3 * third).localCheckpoint(eager=True)
    spark.dataSource.register(TableChangefeedDataSource)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_smvf_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_smvf_mv_"))
    ckpt = tempfile.mkdtemp(prefix="lake_smvf_ck_")
    try:
        src.commit(
            with_v(o.filter(F.col("k") <= third)).select(
                "k", "status", "cents", "v"
            ),
            mode="overwrite",
        )                                                   # v0
        merge_into(
            src,
            spark,
            with_v(
                o.filter(F.col("k") <= u).select(
                    "k",
                    F.lit("MV").alias("status"),
                    (F.col("cents") + 5).alias("cents"),
                )
            ).select("k", "status", "cents", "v"),
            key="k",
        )                                                   # v1
        src.delete_where(
            spark,
            (F.col("cents") < 5_000_000)
            | (F.col("cents") > 40_000_000),
            prune_where="auto",
        )                                                   # v2
        src.commit(
            with_v(
                o.filter(F.col("k").between(third + 1, third + u))
            ).select("k", "status", "cents", "v"),
            mode="append",
        )                                                   # v3
        q = (
            spark.readStream.format("table_changefeed")
            .option("path", src.path)
            .option("readchangedata", "true")
            .option("key", "k")
            .option("maxversionspertrigger", "1")
            .load()
            .writeStream.foreachBatch(
                make_mv_maintainer(
                    mv, "smvf", group_cols=["status"],
                    sum_cols=["cents"], source=src,
                    min_cols=["cents"], max_cols=["cents"],
                    distinct_cols=["v"],
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
                F.min("cents").alias("cents_min"),
                F.max("cents").alias("cents_max"),
                F.count_distinct("v").cast("bigint").alias("v_nd"),
            )
        )
        mv_df = mv.read(spark).select(
            "status", "n_rows", "cents", "cents_min", "cents_max",
            "v_nd",
        )
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
        shutil.rmtree(f"{mv.path.rstrip('/')}_nd", ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


@register(
    "lake_merge_evolution",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 3 AS third, COUNT(*) // 10 AS u
          FROM base),
    final AS (
      SELECT b.k,
             b.cents + CASE WHEN b.k <= p.u THEN 9 ELSE 0 END AS cents,
             CASE WHEN b.k <= p.u THEN 'HIGH'
                  WHEN b.k > 2 * p.third THEN 'NEW'
                  ELSE NULL END AS priority
      FROM base b, p
    )
    SELECT COALESCE(priority, 'LEGACY') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(1 AS INT) AS final_version
    FROM final GROUP BY COALESCE(priority, 'LEGACY')
    """,
)
def lake_merge_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE schema evolution (io/versioned.py::merge_into
    allow_evolution, r14 — Delta's schema.autoMerge): ONE MERGE commit
    carries a source with an ADDITIVE 'priority' column — updating the
    first u keys (matched: +9 cents, priority HIGH), inserting the
    last third (not matched: priority NEW), and widening the table
    schema in the same atomic publish. Untouched legacy rows surface
    priority NULL (the additive-evolution read path), pinned in the
    hash as the LEGACY group. The oracle recomputes the final state
    from scratch; final_version pins that evolution + DML was one
    commit."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into

    o = _densified_orders(spark, sf_dir)
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_mev_"))
    try:
        t.commit(
            o.filter(F.col("k") <= 2 * third).select(
                "k", "status", "cents"
            ),
            mode="overwrite",
        )                                                   # v0
        changelog = (
            o.filter(F.col("k") <= u)
            .select(
                "k",
                "status",
                (F.col("cents") + 9).alias("cents"),
                F.lit("HIGH").alias("priority"),
            )
            .unionByName(
                o.filter(F.col("k") > 2 * third).select(
                    "k",
                    "status",
                    "cents",
                    F.lit("NEW").alias("priority"),
                )
            )
        )
        fv = merge_into(
            t, spark, changelog, key="k", allow_evolution=True
        )                                                   # v1
        out = (
            t.read(spark)
            .groupBy(
                F.coalesce(F.col("priority"), F.lit("LEGACY")).alias(
                    "priority"
                )
            )
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .withColumn("final_version", F.lit(int(fv)).cast("int"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "lake_mv_approx_distinct",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 3 AS third, COUNT(*) // 10 AS u
          FROM base),
    final AS (
      SELECT b.k,
             CASE WHEN b.k <= p.u THEN 'MV' ELSE b.status END AS status,
             CASE WHEN b.k <= p.u THEN b.cents + 3 ELSE b.cents END
               AS cents
      FROM base b, p
      WHERE NOT (b.k > p.u AND b.k <= 2 * p.u)
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(COUNT(DISTINCT CAST(cents % 997 AS VARCHAR)) AS BIGINT)
             AS exact_nd,
           CAST(1 AS INT) AS est_within_5pct
    FROM final GROUP BY status
    """,
)
def lake_mv_approx_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """APPROX COUNT DISTINCT in the incremental MV (operators/mv.py
    approx_distinct_cols, r14): a mergeable HLL sketch per group —
    inserts fold by sketch union with NO aux state; the CoW DELETE
    endangers its groups (a sketch cannot forget) and exactly those
    re-sketch from the source, group-pruned. The MV's estimates are
    checked against the oracle-matched EXACT recompute with a 5%
    tolerance flag (pinned at 1); counts, sums, and the exact distinct
    counts are hashed directly. Same DML shape as lake_mv_distinct
    with v = cents % 997 (~997 values/group, real sketch territory)."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.mv import refresh_mv

    def with_v(df):
        return df.withColumn(
            "v", (F.col("cents") % 997).cast("string")
        )

    o = _densified_orders(spark, sf_dir)
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_mvah_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_mvah_"))
    kw = dict(
        name="orders_ah", group_cols=["status"], sum_cols=["cents"],
        key="k", approx_distinct_cols=["v"],
    )
    try:
        src.commit(
            with_v(o.filter(F.col("k") <= 2 * third)).select(
                "k", "status", "cents", "v"
            ),
            mode="overwrite",
        )                                                   # v0
        refresh_mv(src, mv, spark, **kw)
        src.commit(
            with_v(o.filter(F.col("k") > 2 * third)).select(
                "k", "status", "cents", "v"
            ),
            mode="append",
        )                                                   # v1
        merge_into(
            src, spark,
            with_v(
                o.filter(F.col("k") <= u).select(
                    "k",
                    F.lit("MV").alias("status"),
                    (F.col("cents") + 3).alias("cents"),
                )
            ).select("k", "status", "cents", "v"),
            key="k",
        )                                                   # v2
        src.delete_where(
            spark, F.col("k").between(u + 1, 2 * u), prune_where="auto"
        )                                                   # v3
        refresh_mv(src, mv, spark, **kw)
        exact = (
            src.read(spark)
            .groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("cents"),
                F.count_distinct("v").cast("bigint").alias("exact_nd"),
            )
        )
        est = mv.read(spark).select(
            "status",
            F.hll_sketch_estimate("v_hll").alias("__est"),
        )
        joined = exact.join(est, on="status", how="inner")
        ok = int(
            joined.filter(
                F.abs(F.col("__est") - F.col("exact_nd"))
                > 0.05 * F.col("exact_nd")
            ).isEmpty()
        )
        out = (
            joined.select("status", "n_rows", "cents", "exact_nd")
            .withColumn("est_within_5pct", F.lit(ok).cast("int"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out
