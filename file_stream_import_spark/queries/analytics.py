"""Behavioral-analytics and data-profiling query surface.

The reference's query layer is three SQL strings shipped to Postgres
(internal/db/db.go:63-74,112-124); a production deployment of it would run
exactly this class of workload downstream — sessionization, retention,
funnels, profiling — so these operators complete the "switch to this repo"
story for its users. Each is expressed declaratively on the DataFrame API
(Catalyst supplies pushdown/AQE) with a DuckDB oracle.

Engine-stability rules (see queries/__init__.py docstring): decimal sums
for anything summed in a nondeterministic order, floor(x*1e4+0.5)/1e4
quantization for ratios (pure IEEE, identical across engines — ROUND is
not), timestamps formatted to strings, counts cast to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io.tables import load_table
from . import register

_TS = "yyyy-MM-dd HH:mm:ss"
_TS_DK = "%Y-%m-%d %H:%M:%S"


@register(
    "sessionize_events",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts,
        CASE WHEN LAG(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), t AS (
      SELECT user_id, ts,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM s
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
      STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS end_s,
      epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
    FROM t GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session).

    The canonical clickstream operator: lag → new-session flag → running
    sum as session id → per-session aggregate. Two window passes and one
    groupBy, all partitioned by user_id, so the whole plan reuses ONE
    hash-partitioning on user_id — no extra shuffle between the windows
    and the aggregate, and per-user frames are the only state. Gap
    arithmetic is integer microseconds (exact in both engines).
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1_800_000_000),
        1,
    ).otherwise(0)
    sess = e.withColumn(
        "session_seq",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), _TS).alias("start_s"),
        F.date_format(F.max("ts"), _TS).alias("end_s"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "dur_us"
        ),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(DATE_TRUNC('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS wk FROM events
    )
    SELECT STRFTIME(u.cohort_week, '%Y-%m-%d') AS cohort_week,
      date_diff('day', u.cohort_week, a.wk) // 7 AS week_offset,
      CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a JOIN u USING (user_id)
    GROUP BY u.cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted in each subsequent week they return.

    Both sides reduce events to per-user rows BEFORE the join (min-week
    aggregate ⋈ distinct user-weeks), so the join input is |users| + a
    small multiple of |users| — never |events| ⋈ |events|. The join key
    is user_id, co-partitioned with both upstream aggregations: one
    logical partitioning end-to-end. Week truncation is ISO-Monday in
    both Spark and DuckDB.
    """
    e = load_table(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.to_date("wk"), F.to_date("cohort_week")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "merge_intervals",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e FROM events
    ), o AS (
      SELECT user_id, s, e,
        MAX(epoch_us(e)) OVER (PARTITION BY user_id ORDER BY s, e
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM iv
    ), f AS (
      SELECT user_id, s, e,
        CASE WHEN prev_max IS NULL OR epoch_us(s) > prev_max
             THEN 1 ELSE 0 END AS brk
      FROM o
    ), g AS (
      SELECT user_id, s, e,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS island
      FROM f
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      STRFTIME(MIN(s), '%Y-%m-%d %H:%M:%S') AS start_s,
      STRFTIME(MAX(e), '%Y-%m-%d %H:%M:%S') AS end_s
    FROM g GROUP BY user_id, island
    """,
)
def merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each event opens a 5-minute activity interval;
    overlapping intervals per user are merged into maximal islands.

    The standard O(n log n) sweep expressed relationally: running max of
    interval-end over all PRECEDING rows detects overlap, a break flag's
    running sum numbers the islands. Same single user_id partitioning
    reused across both windows and the final aggregate. Equal (s, e)
    ties are order-insensitive: a duplicate interval always lands in its
    twin's island regardless of intra-tie window order.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    w = W.partitionBy("user_id").orderBy("s", "e")
    prev_max = F.max(F.unix_micros(F.col("e"))).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_max.isNull() | (F.unix_micros(F.col("s")) > prev_max), 1
    ).otherwise(0)
    g = e.withColumn(
        "island",
        F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return g.groupBy("user_id", "island").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("s"), _TS).alias("start_s"),
        F.date_format(F.max("e"), _TS).alias("end_s"),
    )


@register(
    "markov_transitions",
    oracle="""
    WITH p AS (
      SELECT event_type AS from_type,
        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS to_type
      FROM events
    )
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n,
      FLOOR(CAST(COUNT(*) AS DOUBLE)
            / CAST(SUM(COUNT(*)) OVER (PARTITION BY from_type) AS DOUBLE)
            * 10000 + 0.5) / 10000.0 + 0.0 AS prob
    FROM p WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    count and row-normalized probability for each (type → next type).

    lead() pairs consecutive events inside the user_id partitioning; the
    transition count groupBy then shuffles only |types|² rows, and the
    normalizing window runs over that tiny aggregate — the only
    data-sized shuffle is the one on user_id. Probabilities are
    floor-quantized (engine-stable IEEE arithmetic).
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    total = F.sum("n").over(W.partitionBy("from_type"))
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (
            F.floor(
                F.col("n").cast("double") / total.cast("double") * 10000
                + 0.5
            )
            / 10000.0
            + 0.0
        ).alias("prob"),
    )


@register(
    "profile_columns",
    oracle="""
    SELECT 'o_orderstatus' AS col,
      CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_null,
      CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
      CAST(MIN(o_orderstatus) AS VARCHAR) AS min_s,
      CAST(MAX(o_orderstatus) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
      CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
      CAST(MIN(o_orderpriority) AS VARCHAR),
      CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
      CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
      CAST(MIN(o_custkey) AS VARCHAR),
      CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
      CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
      printf('%.2f', MIN(o_totalprice)),
      printf('%.2f', MAX(o_totalprice))
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
      CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
      STRFTIME(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
      STRFTIME(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
    FROM orders
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass over orders: null count, distinct count, and
    min/max (rendered to strings) for five columns in ONE scan.

    All fifteen aggregates are computed in a single agg — Catalyst plans
    the multi-DISTINCT via one Expand + partial aggregation, so the
    table is read once regardless of column count (the oracle's UNION of
    five scans is the naive form this operator replaces). Output is 5
    rows, unpivoted driver-side-free via an inline stack().
    """
    from ..io.tables import spread_small_scan

    o = load_table(spark, sf_dir, "orders")
    # r17: five countDistinct arms — same spread rationale and
    # merge-order-free argument as schema_profile
    o = spread_small_scan(o, sf_dir, "orders")

    def _null(c):  # noqa: ANN001, ANN202
        return F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint")

    agg = o.agg(
        *[
            a
            for c in [
                "o_orderstatus",
                "o_orderpriority",
                "o_custkey",
                "o_totalprice",
                "o_orderdate",
            ]
            for a in (
                _null(c).alias(f"{c}__nn"),
                F.countDistinct(c).alias(f"{c}__nd"),
            )
        ],
        F.min("o_orderstatus").cast("string").alias("o_orderstatus__min"),
        F.max("o_orderstatus").cast("string").alias("o_orderstatus__max"),
        F.min("o_orderpriority").cast("string").alias("o_orderpriority__min"),
        F.max("o_orderpriority").cast("string").alias("o_orderpriority__max"),
        F.min("o_custkey").cast("string").alias("o_custkey__min"),
        F.max("o_custkey").cast("string").alias("o_custkey__max"),
        F.format_string("%.2f", F.min("o_totalprice")).alias(
            "o_totalprice__min"
        ),
        F.format_string("%.2f", F.max("o_totalprice")).alias(
            "o_totalprice__max"
        ),
        F.date_format(F.min("o_orderdate"), _TS).alias("o_orderdate__min"),
        F.date_format(F.max("o_orderdate"), _TS).alias("o_orderdate__max"),
    )
    stack = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max"
        for c in [
            "o_orderstatus",
            "o_orderpriority",
            "o_custkey",
            "o_totalprice",
            "o_orderdate",
        ]
    )
    return agg.selectExpr(
        f"stack(5, {stack}) AS (col, n_null, n_distinct, min_s, max_s)"
    )


@register(
    "anomaly_zscore",
    oracle="""
    WITH st AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        SUM(CAST("value" AS DECIMAL(10,2))) AS s,
        SUM(CAST("value" AS DECIMAL(10,2)) * CAST("value" AS DECIMAL(10,2)))
          AS s2
      FROM events GROUP BY event_type
    ), z AS (
      SELECT e.event_id, e.event_type, e."value" AS v,
        FLOOR((e."value" - CAST(st.s AS DOUBLE) / st.n)
          / sqrt(CAST(
              CAST(st.n AS DECIMAL(8,0)) * CAST(st.s2 AS DECIMAL(22,4))
              - CAST(st.s AS DECIMAL(15,2)) * CAST(st.s AS DECIMAL(15,2))
            AS DOUBLE) / (st.n * (st.n - 1)))
          * 10000 + 0.5) / 10000.0 + 0.0 AS z
      FROM events e JOIN st USING (event_type)
    )
    SELECT event_id, event_type, v, z FROM z WHERE ABS(z) > 2.5
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier detection: flag events whose value
    sits more than 2.5 sample standard deviations from the type mean.

    The per-type stats aggregate is |types| rows — broadcast back onto
    the event stream, so the full pass is one map-side join over a
    single scan lineage (no event-sized shuffle at all). Moments are
    exact decimals (order-independent); mean/std/z are then pure IEEE
    double ops on identical inputs, and the outlier predicate filters on
    the floor-QUANTIZED z so the cut is engine-stable.
    """
    e = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(10,2)")
    st = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(vdec).alias("s"),
        F.sum(vdec * vdec).alias("s2"),
    )
    num = (
        F.col("n").cast("decimal(8,0)") * F.col("s2").cast("decimal(22,4)")
        - F.col("s").cast("decimal(15,2)") * F.col("s").cast("decimal(15,2)")
    )
    z = (
        F.floor(
            (F.col("value") - F.col("s").cast("double") / F.col("n"))
            / F.sqrt(
                num.cast("double") / (F.col("n") * (F.col("n") - 1))
            )
            * 10000
            + 0.5
        )
        / 10000.0
        + 0.0
    )
    return (
        e.join(F.broadcast(st), "event_type")
        .select(
            "event_id",
            "event_type",
            F.col("value").alias("v"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > 2.5)
    )


@register(
    "rolling_active_users",
    oracle="""
    WITH days AS (
      SELECT DISTINCT DATE_TRUNC('day', ts) AS day FROM events
    ), du AS (
      SELECT DISTINCT DATE_TRUNC('day', ts) AS day, user_id FROM events
    )
    SELECT STRFTIME(d.day, '%Y-%m-%d') AS day,
      CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users (WAU) for every day with activity.

    COUNT(DISTINCT) over a sliding range frame isn't directly
    expressible as a window, and the oracle's range join is quadratic in
    days; the scale path instead EXPLODES each distinct (day, user) row
    into the ≤7 window-days it contributes to — a bounded ×7 fan-out of
    an already user-granular input — then semi-joins to observed days
    and counts distinct users per window-day. Shuffles only user-day
    pairs, never raw events.
    """
    e = load_table(spark, sf_dir, "events")
    days = e.select(F.date_trunc("day", "ts").alias("day")).distinct()
    du = e.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    contrib = du.select(
        F.explode(
            F.expr("sequence(day, day + INTERVAL 6 DAYS, INTERVAL 1 DAY)")
        ).alias("wday"),
        "user_id",
    )
    return (
        contrib.join(
            F.broadcast(days), contrib["wday"] == days["day"], "semi"
        )
        .groupBy(F.date_format("wday", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )


@register(
    "revenue_deciles",
    oracle="""
    WITH r AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders GROUP BY o_custkey
    ), d AS (
      SELECT o_custkey, rev,
        NTILE(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
      FROM r
    )
    SELECT CAST(decile AS BIGINT) AS decile,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      CAST(CAST(SUM(rev) AS DECIMAL(18,2)) AS DOUBLE) AS decile_rev,
      FLOOR(CAST(SUM(rev) AS DOUBLE) / CAST(SUM(SUM(rev)) OVER () AS DOUBLE)
            * 10000 + 0.5) / 10000.0 + 0.0 AS rev_share
    FROM d GROUP BY decile
    """,
)
def revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: customers ranked into spend deciles, with
    each decile's customer count, exact revenue, and share of total.

    NTILE needs a total order, but only over the per-customer aggregate
    (|customers| ≪ |orders|) — the event-sized data never leaves its
    groupBy partitioning. At 100 TB the per-customer rollup is still the
    heavy step; the single-partition rank runs on its output. For rank
    inputs that themselves don't fit one partition, the two-level
    bucketed rank used by train_shuffle (curation.py) is the upgrade.
    Revenue is exact decimal; only the final share ratio is quantized.
    """
    o = load_table(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev")
    )
    d = r.withColumn(
        "decile",
        F.ntile(10)
        .over(W.orderBy(F.col("rev").desc(), F.col("o_custkey")))
        .cast("bigint"),
    )
    g = d.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("rev").cast("decimal(18,2)").alias("decile_rev"),
    )
    total = F.sum("decile_rev").over(W.partitionBy())
    return g.select(
        "decile",
        "n_customers",
        F.col("decile_rev").cast("double").alias("decile_rev"),
        (
            F.floor(
                F.col("decile_rev").cast("double")
                / total.cast("double")
                * 10000
                + 0.5
            )
            / 10000.0
            + 0.0
        ).alias("rev_share"),
    )


@register(
    "fuzzy_name_match",
    oracle="""
    SELECT c_custkey, probe, CAST(levenshtein(c_name, probe) AS BIGINT)
      AS dist
    FROM customer,
      (VALUES ('Customer#000000100'), ('Customer#000001399')) p(probe)
    WHERE levenshtein(c_name, probe) <= 1
    """,
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance entity matching: find customers whose name is
    within Levenshtein distance 1 of a probe list.

    The probe side is a literal in-memory table — hard-broadcast (it is
    constant-size by construction, like region/nation under the dim()
    policy), so the scan side streams through a broadcast nested loop
    with the distance predicate evaluated JVM-side (built-in
    levenshtein, no Python). At scale the upgrade is length + prefix
    blocking before the distance call; distance ≤1 keeps the
    demonstration exact in both engines.
    """
    c = load_table(spark, sf_dir, "customer")
    probes = spark.createDataFrame(
        [("Customer#000000100",), ("Customer#000001399",)], ["probe"]
    )
    return (
        c.crossJoin(F.broadcast(probes))
        .withColumn(
            "dist",
            F.levenshtein(F.col("c_name"), F.col("probe")).cast("bigint"),
        )
        .filter(F.col("dist") <= 1)
        .select("c_custkey", "probe", "dist")
    )


@register(
    "basket_type_pairs",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
      CAST(COUNT(*) AS BIGINT) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    """,
)
def basket_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence mining: for every unordered pair of event types,
    how many users have performed both.

    The self-join runs on DISTINCT (user, type) rows, so per-user
    fan-out is bounded by the type-domain size squared (not by event
    count) — the association-rule analog of the document-frequency cap
    in ngram_jaccard_pairs (operators/dedup.py). Both join inputs share
    the user_id partitioning with the distinct that produced them: one
    shuffle total.
    """
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
      FLOOR(PERCENT_RANK() OVER w * 1e6 + 0.5) / 1e6 + 0.0 AS pct_rank,
      FLOOR(CUME_DIST() OVER w * 1e6 + 0.5) / 1e6 + 0.0 AS cume,
      CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist / ntile)
    per market segment — the remaining ANSI window family not covered by
    window_ranks/window_navigation.

    The order-by includes the unique key so ntile's row positions are a
    total order (ties on acctbal alone would make quartile assignment
    engine-dependent). One window shuffle on the segment key; ranks are
    floor-quantized (both are exact rationals, but the division is IEEE).
    """
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")

    def _q(col):
        return F.floor(col * 1e6 + F.lit(0.5)) / 1e6 + F.lit(0.0)

    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        _q(F.percent_rank().over(w)).alias("pct_rank"),
        _q(F.cume_dist().over(w)).alias("cume"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "rfm_segmentation",
    oracle="""
    WITH g AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    base AS (
      SELECT o_custkey AS c_custkey,
        date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                  CAST(ANY_VALUE(maxd) AS DATE)) AS recency_days,
        CAST(COUNT(*) AS BIGINT) AS frequency,
        SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS mon_exact
      FROM orders CROSS JOIN g
      GROUP BY o_custkey
    )
    SELECT c_custkey, CAST(recency_days AS BIGINT) AS recency_days,
      frequency,
      ROUND(CAST(mon_exact AS DOUBLE), 2) + 0.0 AS monetary,
      CAST(NTILE(4) OVER (ORDER BY recency_days, c_custkey) AS BIGINT)
        AS r_quartile,
      CAST(NTILE(4) OVER (ORDER BY frequency DESC, c_custkey) AS BIGINT)
        AS f_quartile,
      CAST(NTILE(4) OVER (ORDER BY mon_exact DESC, c_custkey) AS BIGINT)
        AS m_quartile
    FROM base
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order, vs the
    corpus max date), frequency (order count), monetary (exact DECIMAL
    revenue sum), each cut into quartiles.

    The anchor date is a 1-row aggregate broadcast into the per-customer
    aggregation (no single-partition window). Monetary sums as
    DECIMAL(18,6) so both the output value and the m-quartile ORDERING
    are reduction-order-independent; all three ntile orderings include
    the unique customer key. The three global ntile windows are
    single-partition by nature — at scale the quartile cut becomes
    approx_percentile thresholds + a projection (the pattern in
    revenue_deciles) rather than a global sort; kept exact here because
    the oracle contract needs exact ranks on customer-sized data (one
    row per customer, not per fact row).
    """
    o = load_table(spark, sf_dir, "orders")
    g = o.agg(F.max("o_orderdate").alias("maxd"))
    base = (
        o.crossJoin(F.broadcast(g))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.datediff(
                F.to_date(F.first("maxd")), F.to_date(F.max("o_orderdate"))
            ).alias("recency_days"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("mon_exact"),
        )
    )
    return base.select(
        "c_custkey",
        F.col("recency_days").cast("bigint").alias("recency_days"),
        "frequency",
        (F.round(F.col("mon_exact").cast("double"), 2) + F.lit(0.0)).alias(
            "monetary"
        ),
        F.ntile(4)
        .over(W.orderBy("recency_days", "c_custkey"))
        .cast("bigint")
        .alias("r_quartile"),
        F.ntile(4)
        .over(W.orderBy(F.col("frequency").desc(), "c_custkey"))
        .cast("bigint")
        .alias("f_quartile"),
        F.ntile(4)
        .over(W.orderBy(F.col("mon_exact").desc(), "c_custkey"))
        .cast("bigint")
        .alias("m_quartile"),
    )


@register(
    "constraint_check",
    oracle="""
    SELECT 'orders_totalprice_positive' AS constraint_name,
      CAST(COALESCE(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0)
        AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_not_null',
      CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
        AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_fk_customer', CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_discount_in_range',
      CAST(COALESCE(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
        THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_quantity_positive',
      CAST(COALESCE(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END), 0)
        AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events_props_wrapped_json',
      CAST(COALESCE(SUM(CASE WHEN props NOT LIKE '{%' OR props NOT LIKE '%}'
        THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'documents_nchars_consistent',
      CAST(COALESCE(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END),
        0) AS BIGINT)
    FROM documents
    """,
)
def constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality suite: declared constraints → violation
    counts, one row per constraint.

    Same-table constraints share a single scan (one multi-sum aggregate
    per table, unpivoted with stack()) so the suite costs one pass over
    each fact table plus one anti-join for the FK check — each aggregate
    collapses map-side to a handful of counters, no data-sized shuffle
    anywhere. This is the validation gate a pipeline runs before
    publishing a snapshot.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")
    c = load_table(spark, sf_dir, "customer")

    def _cnt(cond):
        return F.coalesce(
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        ).cast("bigint")

    o_rows = o.agg(
        _cnt(F.col("o_totalprice") <= 0).alias("a"),
        _cnt(F.col("o_custkey").isNull()).alias("b"),
    ).select(
        F.expr(
            "stack(2, 'orders_totalprice_positive', a,"
            " 'orders_custkey_not_null', b) AS (constraint_name, violations)"
        )
    )
    fk = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count("*").cast("bigint").alias("violations"))
        .select(F.lit("orders_fk_customer").alias("constraint_name"), "violations")
    )
    li_rows = li.agg(
        _cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("a"),
        _cnt(F.col("l_quantity") <= 0).alias("b"),
    ).select(
        F.expr(
            "stack(2, 'lineitem_discount_in_range', a,"
            " 'lineitem_quantity_positive', b) AS (constraint_name, violations)"
        )
    )
    e_rows = e.agg(
        _cnt(
            ~F.col("props").like("{%") | ~F.col("props").like("%}")
        ).alias("a")
    ).select(
        F.lit("events_props_wrapped_json").alias("constraint_name"),
        F.col("a").alias("violations"),
    )
    d_rows = d.agg(
        _cnt(F.col("n_chars") != F.length("text")).alias("a")
    ).select(
        F.lit("documents_nchars_consistent").alias("constraint_name"),
        F.col("a").alias("violations"),
    )
    return o_rows.unionByName(fk).unionByName(li_rows).unionByName(e_rows).unionByName(d_rows)


@register(
    "asof_next_purchase",
    oracle="""
    SELECT l.event_id, l.user_id,
      STRFTIME(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      r.event_id AS purchase_event_id,
      ROUND(r.value, 2) AS purchase_value,
      epoch_us(r.ts) - epoch_us(l.ts) AS wait_us
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every click, the user's next purchase at
    or after it — the attribution-window direction (asof_last_purchase
    covers backward).

    Implemented by time-axis negation over the same union+window as-of
    operator (operators/asof.py): backward-as-of on -epoch_us(ts) IS
    forward-as-of on ts, ties included, so the one-shuffle/no-join plan
    and its 100 TB properties carry over unchanged. Oracle: DuckDB's
    native ASOF LEFT JOIN with the <= comparator.
    """
    from ..operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    neg = (F.unix_micros(F.col("ts")) * -1).alias("negts")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", neg
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value", neg
    )
    joined = asof_join(
        clicks,
        purchases,
        on="negts",
        by="user_id",
        right_cols=["event_id", "ts", "value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.col("event_id_right").alias("purchase_event_id"),
        F.round("value_right", 2).alias("purchase_value"),
        (F.unix_micros(F.col("ts_right")) - F.unix_micros(F.col("ts"))).alias(
            "wait_us"
        ),
    )


@register(
    "anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT event_type, STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
        CAST(SUM(CAST("value" AS DECIMAL(10,2))) AS DOUBLE) AS sv
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT event_type, MEDIAN(sv) AS med FROM daily GROUP BY event_type
    ), mad AS (
      SELECT d.event_type, ANY_VALUE(m.med) AS med,
        MEDIAN(ABS(d.sv - m.med)) AS mad
      FROM daily d JOIN med m USING (event_type)
      GROUP BY d.event_type
    )
    SELECT d.event_type, d.day, d.sv AS daily_total,
      FLOOR(ABS(d.sv - mad.med) / (CAST(1.4826 AS DOUBLE) * mad.mad)
        * 1e4 + 0.5) / 1e4 + 0.0 AS mad_score
    FROM daily d JOIN mad USING (event_type)
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier scoring: |x - median| / (1.4826 × MAD) over daily
    revenue per event type — the median-based complement to
    anomaly_zscore (immune to the outliers it is hunting).

    Daily totals are exact DECIMAL sums cast to DOUBLE, so both engines
    interpolate medians over bit-identical inputs (quantile_cont
    semantics match between Spark's median() and DuckDB's MEDIAN). The
    median/MAD tables are |types| rows, broadcast back onto the
    day-grain table — no day-table shuffle after the first aggregate,
    which itself is one (type, day) groupBy with map-side combine.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("sv")
    )
    med = daily.groupBy("event_type").agg(F.median("sv").alias("med"))
    mad = (
        daily.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.median(F.abs(F.col("sv") - F.col("med"))).alias("mad"),
        )
    )
    return (
        daily.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            F.col("sv").alias("daily_total"),
            (
                F.floor(
                    F.abs(F.col("sv") - F.col("med"))
                    / (F.lit(1.4826) * F.col("mad"))
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
                + F.lit(0.0)
            ).alias("mad_score"),
        )
    )


@register(
    "orders_repeat_interval",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
        date_diff('day',
          CAST(LAG(o_orderdate) OVER w AS DATE),
          CAST(o_orderdate AS DATE)) AS gap
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey AS c_custkey,
      CAST(COUNT(gap) AS BIGINT) AS n_gaps,
      CAST(MIN(gap) AS BIGINT) AS min_gap_days,
      CAST(MAX(gap) AS BIGINT) AS max_gap_days,
      FLOOR(CAST(SUM(gap) AS DOUBLE) / COUNT(gap) * 1e4 + 0.5) / 1e4 + 0.0
        AS avg_gap_days
    FROM g WHERE gap IS NOT NULL
    GROUP BY o_custkey
    """,
)
def orders_repeat_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase intervals: per returning customer, the min/max/mean
    days between consecutive orders — the input feature for churn and
    replenishment models.

    One lag window and the following aggregate share the o_custkey
    partitioning (single shuffle). Gaps are exact integer day diffs
    (total order includes the unique order key, so ties on date are
    deterministic); the mean is an exact-integer sum with one quantized
    IEEE division.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return g.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.min("gap").cast("bigint").alias("min_gap_days"),
        F.max("gap").cast("bigint").alias("max_gap_days"),
        (
            F.floor(
                F.sum("gap").cast("double") / F.count("gap") * 1e4 + F.lit(0.5)
            )
            / 1e4
            + F.lit(0.0)
        ).alias("avg_gap_days"),
    )
