"""Round-4 surface widening: time-range window frames, gaps-and-islands,
sequential-path mining, PMI co-occurrence, schema-drift union, deterministic
grouped mode, array-function surface, and containment dedup.

The reference delegates every read-side computation to Postgres SQL
(internal/db/db.go:112-124); these queries extend the engine's relational
surface with shapes its users would run downstream of the ingested data,
each expressed as a single declarative DataFrame lineage with a DuckDB
oracle.

Engine-stability rules follow queries/stats.py: doubles are floor-quantized
onto integer grids (cents) BEFORE any reduction; every cross-engine double
computation is a single division of exact integers; ln() outputs are
floor-quantized; ROUND is used only on a single already-identical double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io.tables import load_table
from ..operators import dedup
from . import register


def _q6(col: Column) -> Column:
    """Floor-quantize onto the 1e-6 grid with the -0.0 guard."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6) + F.lit(0.0)


@register(
    "trailing_hour_window",
    oracle="""
    SELECT event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
                AS BIGINT) AS sum_cents_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def trailing_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: the user's event count and value sum over the trailing
    hour — a time-RANGE window frame (vs the ROWS frames elsewhere in the
    registry).

    The frame is defined on exact integer microseconds, so frame
    membership is bit-identical across engines (ties at equal ts are
    RANGE peers in both). Values are quantized to integer cents BEFORE
    the windowed sum — pure BIGINT arithmetic, immune to reduction
    order. One shuffle on user_id; per-key state is the trailing hour
    only, so executor memory is bounded by per-user event rate, not
    history length — the plan survives an unbounded time axis.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        F.count("*").over(w).cast("bigint").alias("n_1h"),
        F.sum(cents).over(w).cast("bigint").alias("sum_cents_1h"),
    )


@register(
    "orders_gap_islands",
    oracle="""
    WITH m AS (
      SELECT DISTINCT o_custkey,
        CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym
      FROM orders
    ), isl AS (
      SELECT o_custkey, ym,
        ym - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY ym)
          AS island
      FROM m
    ), s AS (
      SELECT o_custkey, island, CAST(COUNT(*) AS BIGINT) AS streak
      FROM isl GROUP BY 1, 2
    )
    SELECT o_custkey,
           CAST(SUM(streak) AS BIGINT) AS n_months,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(streak) AS BIGINT) AS max_streak
    FROM s GROUP BY 1
    """,
)
def orders_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per customer, streaks of consecutive months
    with at least one order (longest streak, island count).

    The classic formulation — month-number minus row_number is constant
    within a consecutive run — entirely in integer arithmetic. The
    distinct, the window, and both aggregations all partition on
    o_custkey, so Catalyst reuses ONE hash-partitioning end-to-end
    (single shuffle); per-key state is the month list, bounded by the
    calendar, not the order count.
    """
    o = load_table(spark, sf_dir, "orders")
    m = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("ym"),
    ).distinct()
    w = W.partitionBy("o_custkey").orderBy("ym")
    isl = m.withColumn("island", F.col("ym") - F.row_number().over(w))
    s = isl.groupBy("o_custkey", "island").agg(
        F.count("*").cast("bigint").alias("streak")
    )
    return s.groupBy("o_custkey").agg(
        F.sum("streak").cast("bigint").alias("n_months"),
        F.count("*").cast("bigint").alias("n_islands"),
        F.max("streak").cast("bigint").alias("max_streak"),
    )


@register(
    "sequence_top_paths",
    oracle="""
    WITH p AS (
      SELECT event_type || '>' ||
             LEAD(event_type, 1) OVER w || '>' ||
             LEAD(event_type, 2) OVER w AS path
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM p WHERE path IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path ASC
    LIMIT 10
    """,
)
def sequence_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 within-user event-type trigram paths — sequential pattern
    mining's workhorse shape (what flows into 'users who did A>B>C').

    One window pass (two LEADs share the user_id partitioning and the
    (ts, event_id) total order — event_id uniqueness makes the sequence
    deterministic), then a path count whose map-side partial aggregation
    bounds the shuffle by distinct paths (|event_types|³ ceiling), not
    event count. The top-10 compiles to TakeOrderedAndProject — no
    global sort materializes. Ties broken by path text for a
    deterministic result set.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    path = F.when(
        F.lead("event_type", 2).over(w).isNotNull(),
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.lead("event_type", 1).over(w),
            F.lead("event_type", 2).over(w),
        ),
    )
    return (
        e.select(path.alias("path"))
        .filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


@register(
    "cooccurrence_pmi",
    oracle="""
    WITH ue AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events),
    c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM ue GROUP BY 1),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM ue a JOIN ue b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, c_ab,
      FLOOR(ln(CAST(c_ab * n.n_users AS DOUBLE)
               / CAST(ca.cnt * cb.cnt AS DOUBLE)) * 1e6 + 0.5) / 1e6 + 0.0
        AS pmi
    FROM p
    JOIN c ca ON ca.event_type = p.type_a
    JOIN c cb ON cb.event_type = p.type_b
    CROSS JOIN n
    """,
)
def cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types co-occurring in
    the same user's history — the association-strength upgrade of
    basket_type_pairs (raw counts can't distinguish 'popular' from
    'correlated').

    All counts reduce to exact BIGINTs; PMI is ln of ONE double division
    of exact integer products (c_ab·N and c_a·c_b — identical operand
    order in both engines), floor-quantized to the 1e-6 grid against
    libm last-ulp drift. Instead of a distinct + self-join (which would
    scan the fact once per marginal), ONE groupBy(user_id) collects each
    user's sorted type set; pairs and marginals both unfold from that
    array with explode — the pair fan-out is |types|²/2 per user, array-
    local, no join. The three consumers of the per-user aggregate share
    an identical exchange subtree (ReusedExchange dedupes it), so
    event-scale data is scanned and shuffled once; everything joined
    afterwards is |types|-sized and broadcasts.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types")
    )
    n = per_user.agg(F.count("*").cast("bigint").alias("n_users"))
    c = (
        per_user.select(F.explode("types").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    combos = F.flatten(
        F.transform(
            "types",
            lambda x, i: F.transform(
                F.slice(F.col("types"), i + 2, F.size("types")),
                lambda y: F.struct(
                    x.alias("type_a"), y.alias("type_b")
                ),
            ),
        )
    )
    p = (
        per_user.select(F.explode(combos).alias("pair"))
        .select("pair.type_a", "pair.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
    )
    pmi = _q6(
        F.log(
            (F.col("c_ab") * F.col("n_users")).cast("double")
            / (F.col("ca") * F.col("cb")).cast("double")
        )
    )
    return (
        p.join(c.select(F.col("event_type").alias("type_a"), F.col("cnt").alias("ca")), "type_a")
        .join(c.select(F.col("event_type").alias("type_b"), F.col("cnt").alias("cb")), "type_b")
        .crossJoin(n)
        .select("type_a", "type_b", "c_ab", pmi.alias("pmi"))
    )


@register(
    "schema_drift_union",
    oracle="""
    WITH u AS (
      SELECT o_orderkey, CAST(NULL AS VARCHAR) AS o_orderpriority,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             'legacy' AS snapshot
      FROM orders WHERE year(o_orderdate) < 1994
      UNION ALL
      SELECT o_orderkey, o_orderpriority,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             'modern' AS snapshot
      FROM orders WHERE year(o_orderdate) >= 1994
    )
    SELECT snapshot, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM u GROUP BY 1, 2
    """,
)
def schema_drift_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution merge: a legacy snapshot missing a column is
    unioned with the current schema via unionByName(allowMissingColumns)
    — the absent column null-fills, exactly how a long-lived ingest
    pipeline absorbs old parquet partitions written before a column
    existed.

    The aggregate then groups over the nullable drifted column (null
    group keys flow through both engines identically). Revenue is
    summed as exact integer cents. Column resolution is by NAME, not
    position — the property the reference's header-map scan (O2,
    internal/writer/writer.go:86-99) enforces at CSV ingest, restated
    at the schema-evolution level.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    legacy = o.filter(F.year("o_orderdate") < 1994).select(
        "o_orderkey", cents.alias("cents"), F.lit("legacy").alias("snapshot")
    )
    modern = o.filter(F.year("o_orderdate") >= 1994).select(
        "o_orderkey",
        F.col("o_orderpriority"),
        cents.alias("cents"),
        F.lit("modern").alias("snapshot"),
    )
    u = legacy.unionByName(modern, allowMissingColumns=True)
    return u.groupBy("snapshot", "o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("rev_cents"),
    )


@register(
    "grouped_mode",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT event_type, user_id, n,
        ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY n DESC, user_id ASC) AS rn,
        CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
      FROM c
    )
    SELECT event_type, user_id AS mode_user_id, n AS mode_n,
           FLOOR(CAST(n AS DOUBLE) / total * 1e6 + 0.5) / 1e6 + 0.0
             AS share
    FROM r WHERE rn = 1
    """,
)
def grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most-active user per event
    type, ties broken by minimum user_id.

    Built from counts + one ranking window instead of a native mode()
    aggregate precisely because engines break frequency ties
    arbitrarily — the (n DESC, user_id ASC) order pins a unique winner
    in both. The count's map-side partial aggregation reduces the
    shuffle to distinct (type, user) pairs; the window partitions by
    event_type over that already-reduced frame. share is one double
    division of exact integers, floor-quantized.
    """
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("event_type", "user_id").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wr = W.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    wt = W.partitionBy("event_type")
    r = c.select(
        "event_type",
        "user_id",
        "n",
        F.row_number().over(wr).alias("rn"),
        F.sum("n").over(wt).cast("bigint").alias("total"),
    )
    return r.filter(F.col("rn") == 1).select(
        "event_type",
        F.col("user_id").alias("mode_user_id"),
        F.col("n").alias("mode_n"),
        _q6(F.col("n").cast("double") / F.col("total")).alias("share"),
    )


@register(
    "array_stats_surface",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           CAST(list_max(embedding) AS DOUBLE) AS v_max,
           CAST(list_min(embedding) AS DOUBLE) AS v_min,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)
             AS n_positive,
           CAST(list_position(embedding, list_max(embedding)) AS BIGINT)
             AS argmax_pos
    FROM embeddings
    """,
)
def array_stats_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: size,
    extrema, predicate filter, and argmax position — the building blocks
    the similarity operators compose, surfaced directly.

    Pure projection (no shuffle, whole-stage codegen end-to-end).
    Extrema are exact float32 comparisons widened losslessly to double;
    argmax is array_position on the exact max value — first-match
    semantics in both engines, deterministic because comparison is on
    identical bit patterns, with no arithmetic that could reorder.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("bigint").alias("n_dims"),
        F.array_max(emb).cast("double").alias("v_max"),
        F.array_min(emb).cast("double").alias("v_min"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias(
            "n_positive"
        ),
        F.array_position(emb, F.array_max(emb)).cast("bigint").alias(
            "argmax_pos"
        ),
    )


_CONTAINMENT_ORACLE = r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM tok WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    bo AS (
      SELECT p.doc_a, p.doc_b, p.inter, x.n AS na, y.n AS nb
      FROM pairs p
      JOIN sizes x ON p.doc_a = x.doc_id
      JOIN sizes y ON p.doc_b = y.doc_id
    )
    SELECT src, dst, containment FROM (
      SELECT doc_a AS src, doc_b AS dst,
             ROUND(inter * 1.0 / na, 4) AS containment FROM bo
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst,
             ROUND(inter * 1.0 / nb, 4) AS containment FROM bo
    ) WHERE containment >= 0.7
    """


@register("dedup_containment", oracle=_CONTAINMENT_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed 3-gram containment pairs (threshold 0.7) — the
    asymmetric dedup signal that catches subset duplication (doc + its
    excerpt) which symmetric Jaccard dilutes. See
    operators/dedup.py::containment_pairs for the scale architecture
    (shared candidate generation with the Jaccard family)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(d, threshold=0.7)
