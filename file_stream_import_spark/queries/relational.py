"""Relational operator surface — scans, filters, projections, aggregations,
joins (equi/semi/anti/non-equi), windows, set ops, rollup, JSON, pagination.

The reference delegates all of this to PostgreSQL (it only ships SQL strings,
internal/db/db.go:63-74,112-124); here each operator is expressed
declaratively on the DataFrame API so Catalyst supplies pushdown, pruning,
join selection and AQE. Scale notes per query are in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io.tables import load_table
from . import register

# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 2)                                       AS sum_qty,
      ROUND(SUM(l_extendedprice), 2)                                  AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      ROUND(AVG(l_quantity), 4)                                       AS avg_qty,
      ROUND(AVG(l_extendedprice), 4)                                  AS avg_price,
      ROUND(AVG(l_discount), 4)                                       AS avg_disc,
      COUNT(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 flagship: scan → filter → groupBy(2) → 8 aggregates.

    Scale: the filter and the two grouping columns push down to the parquet
    scan (PushedFilters + 7-column ReadSchema); partial aggregation is
    map-side, so the shuffle carries ≤ |groups| × partitions rows — at
    100 TB this stays a 6-row result with a trivially small exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter-and-sum — the pushdown showcase.

    All four predicates reach the parquet reader (row-group min/max
    skipping); only 4 columns are read. No shuffle at all beyond the
    single-row final aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT
      l_returnflag,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      COUNT(*)                                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation. Catalyst expands this to an Expand +
    two-phase aggregate; at scale the distinct keys shuffle once each."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 2) AS sum_qty,
      COUNT(*)                  AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — subtotals and a grand total in one pass
    (Expand operator; one shuffle regardless of the number of sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      ROUND(SUM(o_totalprice), 2) AS sum_price,
      COUNT(*)                    AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over orders — all 4 grouping sets in one Expand+shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count("*").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Projection + scalar functions
# ---------------------------------------------------------------------------


@register(
    "scalar_functions",
    oracle="""
    SELECT
      p_partkey,
      UPPER(p_name)                                   AS name_upper,
      SUBSTRING(p_brand, 7, 2)                        AS brand_num,
      CAST(LENGTH(p_name) AS BIGINT)                  AS name_len,
      ROUND(p_retailprice * 1.1, 2)                   AS price_with_tax,
      CONCAT(p_brand, ':', p_type)                    AS brand_type,
      CAST(ABS(p_size - 25) AS BIGINT)                AS size_dist,
      ROUND(LN(p_retailprice), 4)                     AS log_price
    FROM part
    WHERE p_size >= 10
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalar function coverage — all JVM-side built-ins, kept
    inside one WholeStageCodegen projection over the scan."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_size") >= 10).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_brand", 7, 2).alias("brand_num"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_with_tax"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).cast("bigint").alias("size_dist"),
        F.round(F.log(F.col("p_retailprice")), 4).alias("log_price"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT
      CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)  AS order_year,
      CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
      COUNT(*)                                        AS n_orders,
      ROUND(SUM(o_totalprice), 2)                     AS sum_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction + aggregate — year/month reach the scan as a
    projection; grouping keys are low-cardinality so the shuffle is tiny."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
            "o_totalprice",
        )
        .groupBy("order_year", "order_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q3_unshipped_orders",
    oracle="""
    SELECT
      l_orderkey,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      STRFTIME(o_orderdate, '%Y-%m-%d')                 AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-10.

    Scale: customer is a dimension → broadcast (no shuffle of lineitem for
    that join); lineitem⋈orders is the one big shuffle, on the join key,
    and AQE picks the strategy at runtime. The final ORDER BY ... LIMIT is
    a TakeOrderedAndProject — no global sort materialization.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-06-01").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(o.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT
      n_name AS nation,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the star schema.

    Scale: region/nation/supplier/customer are all broadcast — the only
    shuffle on the 100 TB side is lineitem⋈orders. Join order follows the
    dimension filters inward so Catalyst prunes early.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o_f = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT
      c_custkey,
      c_name,
      COUNT(o_orderkey)                          AS n_orders,
      ROUND(COALESCE(SUM(o_totalprice), 0), 2)   AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one finished order.
    Semi-join only ships the key column of the probe side — at scale the
    orders side is pre-aggregated to distinct keys by Catalyst."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_orderstatus") == "F"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no pending orders.
    (Status 'P' is the rare one, so the result is non-degenerate at every
    scale factor — a 0-row result would be weak oracle evidence.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_orderstatus") == "P"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "join_range_band",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0.0, 10.0), ('medium', 10.0, 25.0),
             ('large', 25.0, 40.0), ('jumbo', 40.0, 1e9)
    )
    SELECT
      band,
      COUNT(*)                  AS n_items,
      ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join against a banding table.

    Scale: the band table is tiny → BroadcastNestedLoopJoin, which is the
    right physical plan here (4 bands × stream), no shuffle of lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bands = li.sparkSession.createDataFrame(
        [("small", 0.0, 10.0), ("medium", 10.0, 25.0), ("large", 25.0, 40.0), ("jumbo", 40.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_running",
    oracle="""
    SELECT
      l_suppkey,
      l_orderkey,
      l_linenumber,
      CAST(ROW_NUMBER() OVER w AS BIGINT)  AS rn,
      ROUND(SUM(l_extendedprice) OVER (
        PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev,
      ROUND(LAG(l_extendedprice, 1, 0.0) OVER w, 2) AS prev_price
    FROM lineitem
    WHERE l_suppkey <= 5
    WINDOW w AS (
      PARTITION BY l_suppkey
      ORDER BY l_shipdate, l_orderkey, l_linenumber
    )
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: row_number, running sum (explicit ROWS frame), lag.

    The ORDER BY is a full tiebreak (shipdate, orderkey, linenumber) so the
    running sum is deterministic across engines. One shuffle on l_suppkey.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return (
        li.filter(F.col("l_suppkey") <= 5)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.round(
                F.sum("l_extendedprice").over(w.rowsBetween(W.unboundedPreceding, 0)),
                2,
            ).alias("running_rev"),
            F.round(F.lag("l_extendedprice", 1, 0.0).over(w), 2).alias("prev_price"),
        )
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 2) AS price, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      FROM lineitem
    )
    WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranked window + filter — the distributed
    replacement for per-group ORDER BY ... LIMIT."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .subtract(o.filter(F.col("o_orderstatus") == "P").select("o_custkey"))
    )


# ---------------------------------------------------------------------------
# JSON / semi-structured
# ---------------------------------------------------------------------------


@register(
    "json_extract",
    oracle="""
    SELECT
      event_type,
      COUNT(*)                                               AS n_events,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                                                             AS sum_k,
      ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
                                                             AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props string column —
    F.get_json_object stays JVM-side (Jackson), no Python involved."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# Pagination (reference O7) + dedup/upsert semantics (reference O5)
# ---------------------------------------------------------------------------


@register(
    "paginate_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS o_totalprice,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 100
    """,
)
def paginate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O7 (LIMIT/OFFSET pagination, internal/db/db.go:112-120),
    made deterministic by imposing a total order on the key — the
    reference's unordered pages cannot be reproduced portably.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .offset(100)
        .limit(20)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@register(
    "dedup_last_writer_wins",
    oracle="""
    SELECT user_id, event_id, event_type,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def dedup_last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O5 semantics (ON CONFLICT ... DO UPDATE, db.go:63-72)
    generalized: keyed last-writer-wins dedup as a ranked window. Here the
    key is user_id and 'arrival order' is (ts, event_id).

    Scale: one shuffle on the key; with AQE skew handling a hot key is
    split. This is exactly the batch-merge half of the upsert operator in
    operators/upsert.py.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        )
    )
