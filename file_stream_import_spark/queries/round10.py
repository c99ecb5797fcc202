"""Round-10 queries: the r10 lake surfaces under the driver's
value-hash gate.

* lake_rename_evolution — METADATA-ONLY column rename (VERDICT r9 #2):
  pre-rename groups are read through the NEW name via the per-group
  column name maps; the group count after the rename is pinned in the
  value hash, proving zero data IO (a rewrite would change it).
* lake_metadata_agg — agg_where (VERDICT r9 #4): MIN/MAX/SUM/COUNT
  answered from manifest stats with the pruned/metadata/scanned
  classification pinned, like lake_metadata_count pins COUNT's.
* lake_hidden_partitioning — commit(partition_by=["years(date)"])
  (VERDICT r9 #8): Iceberg-style transform partitioning; a one-year
  range predicate on the SOURCE column classifies one-metadata /
  rest-pruned / zero-scanned, pinned.
* stream_changefeed_bounded — catch-up admission control (VERDICT r9
  #1): a real stream from `earliest` over 3 commits with
  maxversionspertrigger=1 must deliver every row exactly once across
  >= 3 micro-batches; the batch count is pinned in the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import load_table
from . import register


@register(
    "lake_rename_evolution",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amount
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(amount) AS BIGINT) AS amount,
           CAST(MIN(amount) AS BIGINT) AS min_amount,
           CAST(2 AS INT) AS n_groups_at_rename,
           CAST(3 AS INT) AS n_groups_final
    FROM base GROUP BY status
    """,
)
def lake_rename_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column RENAME (io/versioned.py::rename_column —
    Iceberg field-identity via per-group name maps; the reference's
    header projection, internal/writer/writer.go:86-91, resolves
    columns by name the same way). Two groups are committed with the
    column named ``cents``, the column renames to ``amount`` (ZERO
    data IO — the pinned group count proves no rewrite), a third group
    appends under the NEW schema, and the final aggregate reads ALL
    three groups through ``amount``: pre-rename files route via
    colmap, post-rename files natively. SUM/MIN over the renamed
    column make silent NULL-routing (the failure mode of losing the
    map) break the value hash, not just a row count."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_rename_"))
    try:
        t.commit(o.filter(F.col("k") <= 1000), mode="overwrite")
        t.commit(
            o.filter(F.col("k").between(1001, 2000)), mode="append"
        )
        v = t.rename_column("cents", "amount")
        m = t._load_manifest(v)
        n_at_rename = len(m["groups"])
        t.commit(
            o.filter(F.col("k") > 2000).withColumnRenamed(
                "cents", "amount"
            ),
            mode="append",
        )
        n_final = len(t._load_manifest(t.latest_version())["groups"])
        out = (
            t.read(spark)
            .groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum("amount").cast("bigint").alias("amount"),
                F.min("amount").cast("bigint").alias("min_amount"),
            )
            .withColumn("n_groups_at_rename", F.lit(n_at_rename))
            .withColumn("n_groups_final", F.lit(n_final))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "lake_metadata_agg",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) AS n, COUNT(*) // 4 AS q FROM base),
    win AS (
      SELECT b.cents FROM base b, p
      WHERE b.k BETWEEN p.q // 2 + 1 AND 2 * p.q + p.q // 2
    )
    SELECT
      CAST((SELECT MIN(cents) FROM base) AS BIGINT) AS total_min,
      CAST((SELECT SUM(cents) FROM base) AS BIGINT) AS total_sum,
      CAST((SELECT COUNT(cents) FROM base) AS BIGINT) AS total_count,
      CAST(4 AS INT) AS total_metadata_groups,
      CAST(0 AS INT) AS total_scanned_groups,
      CAST(MIN(cents) AS BIGINT) AS win_min,
      CAST(MAX(cents) AS BIGINT) AS win_max,
      CAST(SUM(cents) AS BIGINT) AS win_sum,
      CAST(1 AS INT) AS win_pruned,
      CAST(1 AS INT) AS win_metadata,
      CAST(2 AS INT) AS win_scanned
    FROM win
    """,
)
def lake_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only MIN/MAX/SUM (VersionedTable.agg_where — VERDICT
    r9 #4, extending count_where's classification to the distributive
    aggregates; Iceberg/DuckDB both answer these from manifest stats).
    Same scale-stable quartile layout as lake_metadata_count: the
    no-predicate aggregate is PURE metadata (per-group SUMs observed
    at write time — 4 metadata groups, 0 scans, pinned), and the
    window aggregate splits one-pruned / one-contained / two-boundary
    with values exact across the boundary scans."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable
    from ..operators.curation import dense_sequence

    o = dense_sequence(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        ),
        "o_orderkey",
        out_col="k",
    ).select("k", "cents")
    n = o.count()
    q = n // 4
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_agg_"))
    try:
        for i, (lo, hi) in enumerate(
            [(1, q), (q + 1, 2 * q), (2 * q + 1, 3 * q), (3 * q + 1, n)]
        ):
            t.commit(
                o.filter(F.col("k").between(lo, hi)),
                mode="append" if i else "overwrite",
            )
        tot, d_tot = t.agg_where(spark, "cents", detail=True)
        win, d_win = t.agg_where(
            spark,
            "cents",
            where={"k": (q // 2 + 1, 2 * q + q // 2)},
            detail=True,
        )
        out = spark.createDataFrame(
            [
                (
                    int(tot["min"]),
                    int(tot["sum"]),
                    int(tot["count"]),
                    d_tot["metadata"],
                    d_tot["scanned"],
                    int(win["min"]),
                    int(win["max"]),
                    int(win["sum"]),
                    d_win["pruned"],
                    d_win["metadata"],
                    d_win["scanned"],
                )
            ],
            "total_min bigint, total_sum bigint, total_count bigint,"
            " total_metadata_groups int, total_scanned_groups int,"
            " win_min bigint, win_max bigint, win_sum bigint,"
            " win_pruned int, win_metadata int, win_scanned int",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "lake_hidden_partitioning",
    oracle="""
    WITH y AS (
      SELECT CAST(COUNT(DISTINCT YEAR(o_orderdate)) AS INT) AS n_years
      FROM orders
    )
    SELECT
      y.n_years AS n_groups,
      CAST((SELECT COUNT(*) FROM orders
            WHERE YEAR(o_orderdate) = 1996)
        AS BIGINT) AS n_mid,
      CAST(y.n_years - 1 AS INT) AS pruned,
      CAST(1 AS INT) AS metadata,
      CAST(0 AS INT) AS scanned
    FROM y
    """,
)
def lake_hidden_partitioning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hidden partitioning (commit(partition_by=["years(col)"]) —
    VERDICT r9 #8, Iceberg's transform ergonomic): orders commits as
    one group per ORDER YEAR without materializing a year column; a
    plain range predicate on o_orderdate then answers COUNT with the
    1994 group provably contained, every other year pruned, and zero
    scans — the classification and the group count are pinned, so a
    transform that silently degraded to one-group-per-date (or one
    group total) breaks the hash."""
    import datetime
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_hidden_"))
    try:
        t.commit(o, mode="overwrite", partition_by=["years(d)"])
        n_groups = len(t._load_manifest(t.latest_version())["groups"])
        n_mid, detail = t.count_where(
            spark,
            where={
                "d": (
                    datetime.date(1996, 1, 1),
                    datetime.date(1996, 12, 31),
                )
            },
            detail=True,
        )
        out = spark.createDataFrame(
            [
                (
                    n_groups,
                    n_mid,
                    detail["pruned"],
                    detail["metadata"],
                    detail["scanned"],
                )
            ],
            "n_groups int, n_mid bigint, pruned int, metadata int,"
            " scanned int",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "stream_changefeed_bounded",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 3 AS third FROM base),
    capped AS (
      SELECT b.* FROM base b, p WHERE b.k <= 3 * p.third
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(3 AS INT) AS n_batches
    FROM capped GROUP BY status
    """,
)
def stream_changefeed_bounded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Changefeed catch-up ADMISSION CONTROL (VERDICT r9 #1 — the
    Delta maxFilesPerTrigger analog): three commits, then a REAL
    stream from `earliest` with maxversionspertrigger=1 must plan
    exactly three bounded micro-batches (pinned in the value hash —
    one backlog-sized batch would pin 1) while the per-status totals
    prove every committed row arrived exactly once."""
    import shutil
    import tempfile

    from ..io.pysource import TableChangefeedDataSource
    from ..io.versioned import VersionedTable

    from ..operators.curation import dense_sequence

    # row_number-densified thirds: every commit is NON-EMPTY at every
    # scale factor (fixed o_orderkey ranges left the third commit empty
    # at sf0.001, making the pinned batch count scale-dependent);
    # densified two-level (dense_sequence), not via the
    # single-partition global window
    o = dense_sequence(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.col("o_orderstatus").alias("status"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        ),
        "o_orderkey",
        out_col="k",
    ).select("k", "status", "cents")
    third = o.count() // 3
    o = o.filter(F.col("k") <= 3 * third)
    spark.dataSource.register(TableChangefeedDataSource)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_cfb_"))
    ckpt = tempfile.mkdtemp(prefix="lake_cfb_ck_")
    batches: list[list] = []
    try:
        for i, (lo, hi) in enumerate(
            [
                (1, third),
                (third + 1, 2 * third),
                (2 * third + 1, 3 * third),
            ]
        ):
            t.commit(
                o.filter(F.col("k").between(lo, hi)),
                mode="append" if i else "overwrite",
            )

        def sink(df, _bid):
            rows = [
                (r["k"], r["status"], r["cents"]) for r in df.collect()
            ]
            if rows:
                batches.append(rows)

        q = (
            spark.readStream.format("table_changefeed")
            .option("path", t.path)
            .option("startingversion", "earliest")
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
        n_batches = len(batches)
        all_rows = [r for b in batches for r in b]
        out = (
            spark.createDataFrame(
                all_rows, "k bigint, status string, cents bigint"
            )
            .groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .withColumn("n_batches", F.lit(n_batches))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


@register(
    "lake_widen_evolution",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CASE WHEN o_orderkey > 2000
                  THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                       + 3000000000
                  ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT)
             END AS cents
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents,
           CAST(3 AS INT) AS n_groups_final
    FROM base GROUP BY status
    """,
)
def lake_widen_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only type WIDENING (io/versioned.py::widen_column —
    Iceberg's int->long promotion, r10): two groups commit with INT
    cents, the column widens to LONG with zero data IO (the pinned
    group count proves no rewrite), and a third group appends values
    that CANNOT fit in int (cents + 3e9) — so the final SUM/MAX read
    both widths through the per-group castmap, and a lost cast would
    overflow/typo the hash, not just a row count."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents64"),
        )
    )
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_widen_"))
    try:
        narrow = o.filter(F.col("k") <= 2000).select(
            "k", "status", F.col("cents64").cast("int").alias("cents")
        )
        t.commit(narrow.filter(F.col("k") <= 1000), mode="overwrite")
        t.commit(
            narrow.filter(F.col("k") > 1000), mode="append"
        )
        t.widen_column("cents", "long")
        t.commit(
            o.filter(F.col("k") > 2000).select(
                "k",
                "status",
                (F.col("cents64") + F.lit(3_000_000_000)).alias("cents"),
            ),
            mode="append",
        )
        n_final = len(t._load_manifest(t.latest_version())["groups"])
        out = (
            t.read(spark)
            .groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum("cents").cast("bigint").alias("cents"),
                F.max("cents").cast("bigint").alias("max_cents"),
            )
            .withColumn("n_groups_final", F.lit(n_final))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out
