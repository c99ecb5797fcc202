"""Round-11 queries: branch/tag refs (write-audit-publish) under the
driver's value-hash gate.

* lake_branch_wap — the WAP lifecycle end-to-end: stage appends on an
  isolated branch (main's row count mid-audit is PINNED, proving
  isolation), fast-forward publish, and a diverged second branch whose
  publish raises CommitConflictError (pinned as a flag). The final
  aggregate reads MAIN after publish.
* lake_tag_retention — tags pin history through vacuum: a tagged v0
  survives vacuum(keep_versions=1) (retained-version count pinned),
  reads back bit-identical via read(tag=), and expires once the tag is
  deleted (post-delete retained count pinned).
* stream_changefeed_wap — a REAL changefeed stream across a
  publish_branch commit: the additive publish passes the append-only
  contract (the stream would RAISE otherwise) and delivers the
  published rows exactly once, in its own bounded micro-batch (batch
  count pinned).
* lake_table_changes — batch CDC (Delta's table_changes TVF shape):
  per-commit insert counts/sums since a version, O(delta) IO.
* lake_inspect_files — metadata inspection ($files shape): group
  counts, stats-served row totals, pending-delete coverage, and the
  small-files compaction query, all without opening a data file.
* market_basket_lift — association mining (co-occurrence/lift) with
  the distinct-(order,brand)-first shape that bounds pair generation.
* events_markov_transitions — first-order Markov transition matrix
  over per-user event sequences, exact integer-ppm probabilities.
* stream_branch_audit — the audit side of WAP as a REAL stream: a
  changefeed tails the staging branch (branch-local offsets), two
  staged commits arrive as two bounded micro-batches (pinned), and
  main's isolation during the audit is pinned.
* lake_row_changes — row-level CDF (table_changes_rows, Delta's CDF
  read shape): exact I/U/D per commit with old/new payload SUMs
  pinned; each pair diff reads O(delta) via the shared-group skip.

Reference parity: the reference's writer lifecycle (SURVEY §3.1,
internal/writer/writer.go) stages rows before they become visible to
readers; branches generalize that staging to audited, atomically
published multi-commit units at lake scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import load_table
from . import register


def _densified_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number-densified orders so every k-range slice is non-empty
    at every scale factor (the round-10 lesson: fixed o_orderkey
    ranges go empty at sf0.001 and make pinned counts scale-dependent).

    Densified via operators.curation.dense_sequence — the two-level
    range-bucketed rank, NOT ``row_number().over(W.orderBy(...))``,
    whose unpartitioned window funnels every order through one task
    (r12 verdict item; the mapping is identical on the unique
    o_orderkey, so every pinned oracle hash is unchanged)."""
    from ..operators.curation import dense_sequence

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return dense_sequence(o, "o_orderkey", out_col="k").select(
        "k", "status", "cents"
    )


@register(
    "lake_branch_wap",
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
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST((SELECT half FROM p) AS BIGINT) AS main_rows_mid_audit,
           CAST(1 AS INT) AS additive_publish,
           CAST(1 AS INT) AS diverged_publish_conflicts
    FROM capped GROUP BY status
    """,
)
def lake_branch_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish on the versioned lake table
    (io/versioned.py::create_branch/publish_branch — Iceberg refs over
    the linear-manifest layout). Main holds the first half; the second
    half stages on branch 'audit' — a metadata-only fork sharing data
    groups, so branching costs zero data IO at any table size. While
    the branch holds the staged rows, main's row count (PINNED) proves
    readers never see unaudited data. publish_branch fast-forwards
    main atomically; the commit is additive (every fork group
    retained, no new delete entries -> mode publish_branch:, PINNED),
    so downstream changefeeds keep streaming. A second branch forked
    before an interim main REWRITE must NOT publish
    (CommitConflictError, PINNED) — r12's rebase publish lands staged
    appends over interim APPENDS (appends commute; see
    lake_rebase_publish), but a rewrite invalidated the state the
    audit ran against, so publishing would silently reorder it."""
    import shutil
    import tempfile

    from ..io.versioned import CommitConflictError, VersionedTable

    o = _densified_orders(spark, sf_dir)
    half = o.count() // 2
    o = o.filter(F.col("k") <= 2 * half).localCheckpoint(eager=True)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_wap_"))
    try:
        t.commit(o.filter(F.col("k") <= half), mode="overwrite")
        b = t.create_branch("audit")
        b.commit(o.filter(F.col("k") > half), mode="append")
        # the audit step: staged rows visible on the branch only
        main_rows_mid_audit = t.read(spark).count()
        pv = t.publish_branch("audit")
        mode = t._load_manifest(pv)["mode"]
        additive = int(mode == "publish_branch:audit")
        # diverged publish: branch forked at pv, then main REWRITES
        # (an overwrite) — the one interim history a publish can never
        # rebase over
        t.create_branch("late")
        t.commit(
            o.filter(F.col("k") == 1).withColumn(
                "k", F.lit(0).cast("int")
            ),
            mode="overwrite",
        )
        try:
            t.publish_branch("late")
            conflicted = 0
        except CommitConflictError:
            conflicted = 1
        out = (
            t.read(spark, version=pv)
            .groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .withColumn(
                "main_rows_mid_audit",
                F.lit(main_rows_mid_audit).cast("bigint"),
            )
            .withColumn("additive_publish", F.lit(additive))
            .withColumn("diverged_publish_conflicts", F.lit(conflicted))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "lake_tag_retention",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 3 AS third FROM base),
    capped AS (SELECT b.* FROM base b, p WHERE b.k <= 3 * p.third)
    SELECT CAST((SELECT third FROM p) AS BIGINT) AS tag_rows,
           CAST((SELECT SUM(cents) FROM capped c
                 WHERE c.k <= (SELECT third FROM p)) AS BIGINT)
             AS tag_cents,
           CAST(3 * (SELECT third FROM p) AS BIGINT) AS latest_rows,
           CAST(3 AS INT) AS retained_with_tag,
           CAST(1 AS INT) AS retained_after_delete
    """,
)
def lake_tag_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tags pin snapshots through vacuum (io/versioned.py::create_tag —
    Iceberg's expire-snapshots honors named refs). v0 is tagged
    'baseline', two appends follow, and vacuum(keep_versions=1) —
    which would normally expire v0 and v1 — retains ALL THREE versions
    (PINNED) because the retained range stays the contiguous suffix
    from the oldest tag. read(tag=) then reproduces v0's rows
    bit-identically (row count and SUM pinned against the oracle's
    first third). Deleting the tag releases the pin: the next vacuum
    retains exactly 1 version (PINNED)."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable

    o = _densified_orders(spark, sf_dir)
    third = o.count() // 3
    o = o.filter(F.col("k") <= 3 * third).localCheckpoint(eager=True)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_tag_"))
    try:
        t.commit(o.filter(F.col("k") <= third), mode="overwrite")
        t.create_tag("baseline")
        t.commit(
            o.filter(F.col("k").between(third + 1, 2 * third)),
            mode="append",
        )
        t.commit(o.filter(F.col("k") > 2 * third), mode="append")
        t.vacuum(keep_versions=1, min_age_seconds=0)
        retained_with_tag = len(t.versions())
        tagged = t.read(spark, tag="baseline")
        tag_rows = tagged.count()
        tag_cents = tagged.agg(F.sum("cents")).collect()[0][0]
        latest_rows = t.read(spark).count()
        t.delete_tag("baseline")
        t.vacuum(keep_versions=1, min_age_seconds=0)
        retained_after_delete = len(t.versions())
        out = spark.createDataFrame(
            [
                (
                    tag_rows,
                    int(tag_cents),
                    latest_rows,
                    retained_with_tag,
                    retained_after_delete,
                )
            ],
            "tag_rows bigint, tag_cents bigint, latest_rows bigint,"
            " retained_with_tag int, retained_after_delete int",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "stream_changefeed_wap",
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
           CAST(3 AS INT) AS n_batches
    FROM capped GROUP BY status
    """,
)
def stream_changefeed_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC composes with write-audit-publish: a changefeed tailing
    main streams THROUGH an additive publish_branch commit. Main's
    history is overwrite(third1) -> publish_branch(third2, staged and
    audited on a branch) -> append(third3); a real stream from
    `earliest` with maxversionspertrigger=1 plans exactly three
    bounded micro-batches (PINNED — the publish passing the
    append-only contract is what makes batch 2 possible; a rewrite
    publish raises without ignorechanges) and the per-status totals
    prove every row arrived exactly once."""
    import shutil
    import tempfile

    from ..io.pysource import TableChangefeedDataSource
    from ..io.versioned import VersionedTable

    o = _densified_orders(spark, sf_dir)
    third = o.count() // 3
    o = o.filter(F.col("k") <= 3 * third).localCheckpoint(eager=True)
    spark.dataSource.register(TableChangefeedDataSource)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_cfw_"))
    ckpt = tempfile.mkdtemp(prefix="lake_cfw_ck_")
    batches: list[list] = []
    try:
        t.commit(o.filter(F.col("k") <= third), mode="overwrite")
        b = t.create_branch("stage")
        b.commit(
            o.filter(F.col("k").between(third + 1, 2 * third)),
            mode="append",
        )
        t.publish_branch("stage")
        t.commit(o.filter(F.col("k") > 2 * third), mode="append")

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
        all_rows = [r for bb in batches for r in bb]
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
    "lake_table_changes",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 3 AS third FROM base),
    capped AS (SELECT b.* FROM base b, p WHERE b.k <= 3 * p.third),
    tagged AS (
      SELECT c.*,
             CASE WHEN c.k <= (SELECT third FROM p) THEN 0
                  WHEN c.k <= 2 * (SELECT third FROM p) THEN 1
                  ELSE 2 END AS commit_version
      FROM capped c
    )
    SELECT commit_version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           'insert' AS change_type
    FROM tagged WHERE commit_version >= 1
    GROUP BY commit_version
    """,
)
def lake_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC (io/versioned.py::table_changes — Delta's
    table_changes TVF shape): three commits, then "what landed since
    version 1" as one DataFrame with _commit_version/_change_type.
    The per-version row counts and SUMs are hashed against the oracle's
    thirds, so a row attributed to the wrong commit — or the excluded
    version-0 rows leaking in — breaks the hash, not just the total.
    The walk is manifest metadata and only ADDED groups are scanned:
    the nightly-incremental consumer reads O(delta), not O(table)."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, table_changes

    o = _densified_orders(spark, sf_dir).drop("status")
    third = o.count() // 3
    o = o.filter(F.col("k") <= 3 * third).localCheckpoint(eager=True)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_tc_"))
    try:
        t.commit(o.filter(F.col("k") <= third), mode="overwrite")
        t.commit(
            o.filter(F.col("k").between(third + 1, 2 * third)),
            mode="append",
        )
        t.commit(o.filter(F.col("k") > 2 * third), mode="append")
        out = (
            table_changes(t, spark, 1)
            .groupBy(
                F.col("_commit_version").alias("commit_version"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .select(
                "commit_version", "n_rows", "cents", "change_type"
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "lake_inspect_files",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 4 AS quarter FROM base)
    SELECT CAST(3 AS BIGINT) AS n_groups,
           CAST(4 * (SELECT quarter FROM p) AS BIGINT) AS total_rows,
           CAST((SELECT quarter FROM p) AS BIGINT) AS min_rows,
           CAST(2 AS BIGINT) AS n_covered_by_deletes,
           CAST(2 AS BIGINT) AS n_small
    """,
)
def lake_inspect_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata inspection tables (io/versioned.py::inspect_files —
    Iceberg's $files shape): the operational queries a 100 TB table's
    operator runs — group count, total/min rows from write-time stats,
    how many groups a pending merge-on-read delete covers, and the
    small-files count that drives compaction policy — all answered
    WITHOUT opening a data file (manifest metadata only; the pinned
    numbers come from the same frame a WHERE n_rows < threshold
    compaction query would filter)."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable

    o = _densified_orders(spark, sf_dir).drop("status", "cents")
    quarter = o.count() // 4
    o = o.filter(F.col("k") <= 4 * quarter).localCheckpoint(eager=True)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_if_"))
    try:
        # group sizes [2q, q, q]: the half-sized first group makes the
        # small-files predicate discriminate
        t.commit(o.filter(F.col("k") <= 2 * quarter), mode="overwrite")
        t.commit(
            o.filter(F.col("k").between(2 * quarter + 1, 3 * quarter)),
            mode="append",
        )
        # a MoR delete: its applies_to scope covers the two groups
        # present NOW, not the one appended after
        t.delete_where(
            spark,
            F.col("k") == 1,
            strategy="merge-on-read",
            key_cols=["k"],
        )
        t.commit(o.filter(F.col("k") > 3 * quarter), mode="append")
        files = t.inspect_files(spark)
        out = files.agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum("n_rows").cast("bigint").alias("total_rows"),
            F.min("n_rows").cast("bigint").alias("min_rows"),
            F.sum(F.col("has_pending_deletes").cast("bigint"))
            .cast("bigint")
            .alias("n_covered_by_deletes"),
            F.sum(
                (F.col("n_rows") <= F.lit(quarter)).cast("bigint")
            )
            .cast("bigint")
            .alias("n_small"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "market_basket_lift",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    tot AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM ob),
    bc AS (SELECT brand, COUNT(*) AS n FROM ob GROUP BY brand),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             COUNT(*) AS n_co
      FROM ob a JOIN ob b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT p.brand_a, p.brand_b,
           CAST(p.n_co AS BIGINT) AS n_co,
           CAST((p.n_co * t.n_orders * 1000000)
                // (ca.n * cb.n) AS BIGINT) AS lift_ppm
    FROM pairs p, tot t
    JOIN bc ca ON ca.brand = p.brand_a
    JOIN bc cb ON cb.brand = p.brand_b
    WHERE p.n_co >= 2
    """,
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining (the co-occurrence/lift family
    — Agrawal's A-Priori first pass) over order contents. Scale shape:
    project to DISTINCT (order, brand) FIRST — that caps the
    within-order self-join at |brands| = 25 rows per order (<=300
    pairs) regardless of line count, the move that keeps pair
    generation linear in orders at 100 TB; brand marginals broadcast.
    Lift in exact integer ppm (co * N * 1e6 // (n_a * n_b)) so the
    hash is reduction-order-immune across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_partkey"
    )
    pt = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_brand").alias("brand"),
    )
    # materialize the distinct (order, brand) projection ONCE — four
    # consumers derive from it (the tot count action, both pair-join
    # sides, and the brand marginals), and without the lineage cut
    # each rebuilds it from a full lineitem scan (r11 VERDICT: plan
    # nodes 15/35/53 re-scanned the fact table; the pushed filters
    # differ per consumer so ReusedExchange never kicks in). ob is
    # |orders|×|brands|-bounded — tiny next to lineitem — so the
    # localCheckpoint (the queries/stats.py contingency-table idiom)
    # trades one cached small frame for three fact-table scans.
    ob = (
        li.join(F.broadcast(pt), "l_partkey")
        .select("okey", "brand")
        .distinct()
        .localCheckpoint(eager=True)
    )
    tot = ob.select("okey").distinct().count()
    bc = ob.groupBy("brand").agg(F.count("*").alias("n"))
    a = ob.select(F.col("okey"), F.col("brand").alias("brand_a"))
    b = ob.select(F.col("okey"), F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_co"))
        .filter(F.col("n_co") >= 2)
    )
    return (
        pairs.join(
            F.broadcast(bc.withColumnRenamed("brand", "brand_a")
                        .withColumnRenamed("n", "na")),
            "brand_a",
        )
        .join(
            F.broadcast(bc.withColumnRenamed("brand", "brand_b")
                        .withColumnRenamed("n", "nb")),
            "brand_b",
        )
        .select(
            "brand_a",
            "brand_b",
            F.col("n_co").cast("bigint").alias("n_co"),
            # decimal(38,0) keeps the product exact where long would
            # overflow (15M orders squared * 1e6 > 2^63) and FLOOR of
            # a decimal quotient matches DuckDB's integer // exactly —
            # a double quotient can round up across the floor boundary
            F.floor(
                F.col("n_co").cast("decimal(38,0)")
                * F.lit(int(tot))
                * F.lit(1000000)
                / (
                    F.col("na").cast("decimal(38,0)")
                    * F.col("nb")
                )
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    tr AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    marg AS (
      SELECT from_type, SUM(n) AS total FROM tr GROUP BY from_type
    )
    SELECT t.from_type, t.to_type,
           CAST(t.n AS BIGINT) AS n,
           CAST((t.n * 1000000) // m.total AS BIGINT) AS prob_ppm
    FROM tr t JOIN marg m ON m.from_type = t.from_type
    """,
)
def events_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (the session-flow model behind next-action prediction
    and anomaly scoring). One window (partition by user, order by
    ts + event_id for a total order under timestamp ties) produces the
    bigram stream; transition probabilities are exact integer ppm per
    source state. Scale: the shuffle is keyed on user_id (the natural
    partitioning of behavioral data); no per-user data ever
    concentrates on the driver."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    # tr is <= |event_types|^2 rows; checkpoint it so the window+agg
    # subtree runs ONCE — without the cut the marg broadcast rebuilds
    # the whole scan+Sort+Window lineage a second time (r11 VERDICT:
    # PLANS.md showed two full window subtrees, no reuse)
    tr = (
        seq.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    marg = tr.groupBy("from_type").agg(F.sum("n").alias("total"))
    return (
        tr.join(F.broadcast(marg), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("bigint").alias("n"),
            F.floor(
                F.col("n").cast("decimal(38,0)")
                * F.lit(1000000)
                / F.col("total")
            )
            .cast("bigint")
            .alias("prob_ppm"),
        )
    )


@register(
    "stream_branch_audit",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 3 AS third FROM base),
    staged AS (
      SELECT b.* FROM base b, p
      WHERE b.k > p.third AND b.k <= 3 * p.third
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_staged,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(2 AS INT) AS n_batches,
           CAST((SELECT third FROM p) AS BIGINT) AS main_rows_during_audit
    FROM staged GROUP BY status
    """,
)
def stream_branch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUDIT side of write-audit-publish as a real stream: a
    changefeed with .option('branch', 'stage') tails the staging
    branch's commits as they land (io/pysource.py — branch-local
    offsets through the same executor-parallel reader). Two staged
    commits arrive as two bounded micro-batches (PINNED); the fork's
    metadata-copy v0 emits nothing (its added-delta is empty), so the
    auditor sees exactly the staged rows — and main's row count during
    the audit (PINNED) proves isolation the whole time."""
    import shutil
    import tempfile

    from ..io.pysource import TableChangefeedDataSource
    from ..io.versioned import VersionedTable

    o = _densified_orders(spark, sf_dir)
    third = o.count() // 3
    o = o.filter(F.col("k") <= 3 * third).localCheckpoint(eager=True)
    spark.dataSource.register(TableChangefeedDataSource)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_ba_"))
    ckpt = tempfile.mkdtemp(prefix="lake_ba_ck_")
    batches: list[list] = []
    try:
        t.commit(o.filter(F.col("k") <= third), mode="overwrite")
        b = t.create_branch("stage")
        b.commit(
            o.filter(F.col("k").between(third + 1, 2 * third)),
            mode="append",
        )
        b.commit(o.filter(F.col("k") > 2 * third), mode="append")

        def sink(df, _bid):
            rows = [
                (r["k"], r["status"], r["cents"]) for r in df.collect()
            ]
            if rows:
                batches.append(rows)

        q = (
            spark.readStream.format("table_changefeed")
            .option("path", t.path)
            .option("branch", "stage")
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
        main_rows = t.read(spark).count()
        n_batches = len(batches)
        all_rows = [r for bb in batches for r in bb]
        out = (
            spark.createDataFrame(
                all_rows, "k bigint, status string, cents bigint"
            )
            .groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_staged"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .withColumn("n_batches", F.lit(n_batches))
            .withColumn(
                "main_rows_during_audit",
                F.lit(main_rows).cast("bigint"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


@register(
    "lake_row_changes",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 4 AS q FROM base)
    SELECT CAST(0 AS INT) AS commit_version, 'I' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(b.cents) AS BIGINT) AS new_cents,
           CAST(NULL AS BIGINT) AS old_cents
    FROM base b, p WHERE b.k <= 2 * p.q
    UNION ALL
    SELECT 1, 'U', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(b.cents + 7) AS BIGINT), CAST(SUM(b.cents) AS BIGINT)
    FROM base b, p WHERE b.k BETWEEN p.q + 1 AND 2 * p.q
    UNION ALL
    SELECT 1, 'I', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(b.cents + 7) AS BIGINT), CAST(NULL AS BIGINT)
    FROM base b, p WHERE b.k BETWEEN 2 * p.q + 1 AND 3 * p.q
    UNION ALL
    SELECT 2, 'D', CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(SUM(b.cents) AS BIGINT)
    FROM base b, p WHERE b.k <= p.q
    """,
)
def lake_row_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change-data-feed (io/versioned.py::table_changes_rows
    — Delta's CDF read shape, computed read-side): insert half, MERGE
    that updates the second quarter (+7 cents) and inserts the third,
    then a pruned CoW delete of the first quarter. Per (commit,
    change-type): row counts plus SUMs over the old AND new payload
    structs — so a wrong preimage, a missed delete, or a change
    attributed to the wrong commit each breaks the hash. Each pair
    diff reads O(delta) via the manifest-aware shared-group skip (a
    k-commit nightly range costs k pruned diffs, never k table
    scans)."""
    import shutil
    import tempfile

    from ..io.versioned import (
        VersionedTable,
        merge_into,
        table_changes_rows,
    )

    o = _densified_orders(spark, sf_dir).drop("status")
    q = o.count() // 4
    o = o.filter(F.col("k") <= 4 * q).localCheckpoint(eager=True)
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_cdf_"))
    try:
        t.commit(o.filter(F.col("k") <= 2 * q), mode="overwrite")
        merge_into(
            t,
            spark,
            o.filter(F.col("k").between(q + 1, 3 * q)).withColumn(
                "cents", F.col("cents") + 7
            ),
            key="k",
        )
        t.delete_where(
            spark, F.col("k") <= q, prune_where="auto"
        )
        out = (
            table_changes_rows(t, spark, 0, key="k")
            .groupBy(
                F.col("_commit_version").alias("commit_version"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum("new.cents").cast("bigint").alias("new_cents"),
                F.sum("old.cents").cast("bigint").alias("old_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out
