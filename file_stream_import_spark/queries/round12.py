"""Round-12 queries: rebase publish and streaming CDF under the
driver's value-hash gate.

* lake_rebase_publish — the r12 WAP friction fix: publish_branch over
  a main that ADVANCED past the fork by pure appends REBASES the
  staged groups on top (appends commute) instead of forcing
  recreate-and-re-audit. The rebased_from lineage and head version are
  PINNED, and the final aggregate reads MAIN holding both sides' rows.
* stream_rewrite_cdf — a REAL changefeed stream with
  readchangedata=true across a publish_branch_rewrite commit: the
  branch's merge/delete/append net delta arrives as row-level CDC
  (update_preimage/update_postimage/delete/insert — Delta's CDF read),
  and a pure compaction diffs to ZERO rows (batch counts pinned).
* lake_branch_changes — branch-aware batch CDC (opportunity-ledger
  item 4): table_changes on a BRANCH handle walks branch-local
  versions, per-commit counts and sums pinned.
* stream_cdc_replication — the readChangeFeed -> MERGE loop closed:
  a CDF stream drives make_cdf_replicator into a REPLICA table with
  exactly-once apply_changes batches; replica == source pinned.
* lake_changes_after_rename — evolution-map routing across a rewrite:
  a renamed column's historical group (rewritten away, so only
  historical manifests hold its routing) must still SUM correctly
  through batch CDC (the r12 _resolved_map fix, value-hash-visible).

Reference parity: the reference's writer lifecycle (SURVEY §3.1,
internal/writer/writer.go) stages rows before readers see them;
rebase publish removes the stage-blocks-ingest coupling, and the CDF
stream is the consumer-side mirror of its batch upsert semantics
(internal/db/db.go ON CONFLICT updates become
update_preimage/postimage pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from .round11 import _densified_orders


@register(
    "lake_rebase_publish",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 3 AS third FROM base),
    capped AS (SELECT b.* FROM base b, p WHERE b.k <= 3 * p.third)
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(1 AS INT) AS rebased_from_fork,
           CAST(1 AS INT) AS additive_mode,
           CAST(2 AS INT) AS head_version
    FROM capped GROUP BY status
    """,
)
def lake_rebase_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebase publish (io/versioned.py::publish_branch, r12): branch
    'stage' forks at v0 and stages the SECOND third; main keeps
    ingesting and appends the THIRD third (the production WAP shape —
    audits take long enough that main advancing is the common case).
    The publish proves both histories are pure appends (commit-mode
    walk; appends commute), lands the staged groups ON TOP of main's
    interim state in one atomic commit (mode publish_branch:, PINNED
    additive), records rebased_from = the fork version (PINNED), and
    main's head is exactly v2 = v0 + interim append + publish
    (PINNED). The aggregate reads MAIN: all three thirds present —
    nothing dropped, nothing re-audited."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable

    o = _densified_orders(spark, sf_dir)
    third = o.count() // 3
    o = o.filter(F.col("k") <= 3 * third).localCheckpoint(eager=True)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_rp_"))
    try:
        t.commit(o.filter(F.col("k") <= third), mode="overwrite")
        b = t.create_branch("stage")
        b.commit(
            o.filter(F.col("k").between(third + 1, 2 * third)),
            mode="append",
        )
        # main ingests while the audit runs
        t.commit(o.filter(F.col("k") > 2 * third), mode="append")
        pv = t.publish_branch("stage")
        m = t._load_manifest(pv)
        rebased = int(m.get("rebased_from") == 0)
        additive = int(m["mode"] == "publish_branch:stage")
        out = (
            t.read(spark)
            .groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .withColumn("rebased_from_fork", F.lit(rebased))
            .withColumn("additive_mode", F.lit(additive))
            .withColumn("head_version", F.lit(int(pv)).cast("int"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "stream_rewrite_cdf",
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
    v0 AS (SELECT b.* FROM base b, p WHERE b.k <= p.third),
    newrows AS (
      SELECT b.* FROM base b, p
      WHERE b.k > p.third AND b.k <= p.third + p.u
    )
    SELECT * FROM (
      SELECT 'insert' AS change_type,
             CAST((SELECT COUNT(*) FROM v0)
                  + (SELECT COUNT(*) FROM newrows) AS BIGINT) AS n_rows,
             CAST((SELECT SUM(cents) FROM v0)
                  + (SELECT SUM(cents) FROM newrows) AS BIGINT) AS cents
      UNION ALL
      SELECT 'delete',
             CAST((SELECT d - u FROM p) AS BIGINT),
             CAST((SELECT SUM(cents) FROM v0 v, p
                   WHERE v.k > p.u AND v.k <= p.d) AS BIGINT)
      UNION ALL
      SELECT 'update_preimage',
             CAST((SELECT u FROM p) AS BIGINT),
             CAST((SELECT SUM(cents) FROM v0 v, p
                   WHERE v.k <= p.u) AS BIGINT)
      UNION ALL
      SELECT 'update_postimage',
             CAST((SELECT u FROM p) AS BIGINT),
             CAST((SELECT SUM(cents) + u FROM v0 v, p
                   WHERE v.k <= p.u GROUP BY p.u) AS BIGINT)
    )
    CROSS JOIN (SELECT CAST(3 AS INT) AS n_batches,
                       CAST(2 AS INT) AS nonempty_batches)
    """,
)
def stream_rewrite_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming change-data-feed across a REWRITE publish
    (io/pysource.py readchangedata, r12 — Delta's readChangeFeed). The
    r11 changefeed had to reject a publish_branch_rewrite: commit (or
    skip it under ignorechanges, silently losing the retractions);
    now the stream EXPLAINS it: branch 'fix' updates the first u keys
    (merge +1 cent), deletes keys (u, d], and appends u new rows — one
    audited rewrite publish whose micro-batch arrives as exact
    update_preimage/update_postimage/delete/insert rows (counts and
    cent-sums PINNED per type). A compaction after the publish plans a
    batch that diffs to ZERO rows (Delta CDF semantics; batch counts
    PINNED: 3 planned, 2 non-empty). Each non-append diff reads
    O(delta) via the manifest shared-group skip — never the table."""
    import shutil
    import tempfile

    from ..io.pysource import TableChangefeedDataSource
    from ..io.versioned import VersionedTable, merge_into

    o = _densified_orders(spark, sf_dir)
    third = o.count() // 3
    u, d = third // 3, 2 * (third // 3)
    o = o.filter(F.col("k") <= 3 * third).localCheckpoint(eager=True)
    spark.dataSource.register(TableChangefeedDataSource)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_cdf_"))
    ckpt = tempfile.mkdtemp(prefix="lake_cdf_ck_")
    batches: list[int] = []
    rows: list[tuple] = []
    try:
        t.commit(o.filter(F.col("k") <= third), mode="overwrite")
        b = t.create_branch("fix")
        merge_into(
            b,
            spark,
            o.filter(F.col("k") <= u).withColumn(
                "cents", F.col("cents") + F.lit(1)
            ),
            key="k",
        )
        b.delete_where(spark, F.col("k").between(u + 1, d))
        b.commit(
            o.filter(F.col("k").between(third + 1, third + u)),
            mode="append",
        )
        t.publish_branch("fix")
        t.compact(spark, min_bytes=1 << 40)

        def sink(df, _bid):
            got = [
                (r["_change_type"], r["cents"]) for r in df.collect()
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
                rows, "change_type string, cents bigint"
            )
            .groupBy("change_type")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .withColumn(
                "n_batches", F.lit(len(batches)).cast("int")
            )
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
    "lake_branch_changes",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (
      SELECT COUNT(*) // 2 AS half, (COUNT(*) // 2) // 2 AS q
      FROM base
    )
    SELECT 1 AS commit_version,
           CAST((SELECT q FROM p) AS BIGINT) AS n_rows,
           CAST((SELECT SUM(cents) FROM base b, p
                 WHERE b.k > p.half AND b.k <= p.half + p.q)
                AS BIGINT) AS cents
    UNION ALL
    SELECT 2,
           CAST((SELECT q FROM p) AS BIGINT),
           CAST((SELECT SUM(cents) FROM base b, p
                 WHERE b.k > p.half + p.q AND b.k <= p.half + 2 * p.q)
                AS BIGINT)
    """,
)
def lake_branch_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch-aware batch CDC (io/versioned.py::table_changes on a
    BRANCH handle — opportunity-ledger item 4 made driver-visible):
    the staging branch's commits walk BRANCH-LOCAL versions, so an
    audit job can ask "what landed on staging since my last pass"
    with the same O(delta) TVF the main chain gets. Two staged appends
    -> two per-commit (count, cent-sum) rows, both PINNED; the fork's
    metadata-copy v0 contributes nothing by construction."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, table_changes

    o = _densified_orders(spark, sf_dir).select("k", "cents")
    half = o.count() // 2
    q = half // 2
    o = o.filter(F.col("k") <= half + 2 * q).localCheckpoint(eager=True)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_bc_"))
    try:
        t.commit(o.filter(F.col("k") <= half), mode="overwrite")
        b = t.create_branch("stage")
        b.commit(
            o.filter(F.col("k").between(half + 1, half + q)),
            mode="append",
        )
        b.commit(
            o.filter(F.col("k").between(half + q + 1, half + 2 * q)),
            mode="append",
        )
        out = (
            table_changes(b, spark, 1)
            .groupBy(
                F.col("_commit_version").cast("int").alias(
                    "commit_version"
                )
            )
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "stream_cdc_replication",
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
      SELECT b.k, b.status,
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
           CAST(1 AS INT) AS replica_matches_source
    FROM final GROUP BY status
    """,
)
def stream_cdc_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CDC replication (io/versioned.py::make_cdf_replicator
    — Delta's readChangeFeed -> MERGE pattern closed on this engine): a
    REAL changefeed stream with readchangedata tails the source through
    a merge (+5 cents on the first u keys), a CoW delete of (u, d], and
    an append, and the replicator lands each micro-batch on a REPLICA
    table via apply_changes with atomic txn-epoch exactly-once. The
    aggregate reads the REPLICA; replica == source is additionally
    pinned as a flag (exceptAll both ways). At 100 TB the replica
    rewrite is file-pruned per batch (apply_changes' touched-group
    split), and a compaction on the source diffs to zero rows — the
    replica never pays for source maintenance."""
    import shutil
    import tempfile

    from ..io.pysource import TableChangefeedDataSource
    from ..io.versioned import (
        VersionedTable,
        make_cdf_replicator,
        merge_into,
    )

    o = _densified_orders(spark, sf_dir)
    third = o.count() // 3
    u, d = third // 3, 2 * (third // 3)
    o = o.filter(F.col("k") <= 3 * third).localCheckpoint(eager=True)
    spark.dataSource.register(TableChangefeedDataSource)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_repl_src_"))
    rep = VersionedTable(tempfile.mkdtemp(prefix="lake_repl_rep_"))
    ckpt = tempfile.mkdtemp(prefix="lake_repl_ck_")
    try:
        src.commit(o.filter(F.col("k") <= third), mode="overwrite")
        merge_into(
            src,
            spark,
            o.filter(F.col("k") <= u).withColumn(
                "cents", F.col("cents") + F.lit(5)
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
                make_cdf_replicator(rep, "repl", key="k")
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        s_df = src.read(spark)
        r_df = rep.read(spark)
        matches = int(
            s_df.exceptAll(r_df).isEmpty()
            and r_df.exceptAll(s_df).isEmpty()
        )
        out = (
            r_df.groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .withColumn("replica_matches_source", F.lit(matches))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
        shutil.rmtree(rep.path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


@register(
    "lake_changes_after_rename",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (
      SELECT COUNT(*) // 3 AS third, (COUNT(*) // 3) // 3 AS u
      FROM base
    ),
    v0 AS (SELECT b.* FROM base b, p WHERE b.k <= p.third)
    SELECT 0 AS commit_version,
           CAST((SELECT third FROM p) AS BIGINT) AS n_rows,
           CAST((SELECT SUM(cents) FROM v0) AS BIGINT) AS c_sum
    UNION ALL
    SELECT 2,
           CAST((SELECT third - u FROM p) AS BIGINT),
           CAST((SELECT SUM(cents) FROM v0 v, p WHERE v.k > p.u)
                AS BIGINT)
    """,
)
def lake_changes_after_rename(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch CDC through column evolution ACROSS a rewrite
    (io/versioned.py::table_changes + pysource._resolved_map, r12
    hardening): the table renames cents -> c, then a CoW delete
    rewrites the original group AWAY — so the end manifest no longer
    carries that group's rename routing, and only the ranged
    newest-wins colmap union can align its historical rows to the
    post-rename name. The per-commit SUM of the renamed column is
    PINNED — before the fix those rows read NULL and the value hash
    (not just a weak row count) catches it."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, table_changes

    o = _densified_orders(spark, sf_dir).select("k", "cents")
    third = o.count() // 3
    u = third // 3
    o = o.filter(F.col("k") <= third).localCheckpoint(eager=True)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_ren_"))
    try:
        t.commit(o, mode="overwrite")
        t.rename_column("cents", "c")
        t.delete_where(spark, F.col("k") <= u)
        out = (
            table_changes(t, spark, 0, ignore_changes=True)
            .groupBy(
                F.col("_commit_version").cast("int").alias(
                    "commit_version"
                )
            )
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("c").cast("bigint").alias("c_sum"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out
