"""TPC-H-adapted relational suite — all 22 canonical plan shapes over the
reduced fixture schema (Q1/Q3/Q5/Q6 in queries/relational.py; Q2/Q4/Q7-Q22
here), plus grouping sets, exact quantiles, histogram bucketing, and a
salted-skew aggregation.

The reference delegates every relational query to PostgreSQL (it only emits
SQL strings — internal/db/db.go:63-74,112-124); this module is the breadth
of what a user of that Postgres-backed surface can express, restated on the
DataFrame API so Catalyst owns pushdown/join-selection/AQE.

Fixture deltas vs real TPC-H (driver-generated, see TESTDATA.md): no
partsupp, no l_commitdate/l_receiptdate/l_shipmode, no p_container,
nations are NATION_0..24. Each query keeps the canonical plan shape and
swaps only the filter literals.

Scale notes (100 TB): every dimension join below broadcasts (region,
nation, supplier, customer, part are KB..GB at any realistic SF while
lineitem/orders are the TB side); the only data-sized shuffles are
lineitem⋈orders on the join key and the final groupBys, which all carry
partial-aggregated rows. Disjunctive part predicates (q19) are pushed into
the broadcast-side filter before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import dim, load_table
from . import register

_TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


# ---------------------------------------------------------------------------
# Q4 — priority count of orders with a late-shipped line (EXISTS semi-join)
# ---------------------------------------------------------------------------


@register(
    "q4_priority_late_ship",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join.

    Scale: the semi join shuffles both sides on orderkey but emits orders
    rows only once regardless of lineitem fan-out — no row explosion; the
    date filter pushes to the orders scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01"))
        & (F.col("o_orderdate") < _TS("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations by year
# ---------------------------------------------------------------------------


@register(
    "q7_nation_volume",
    oracle="""
    SELECT
      n1.n_name AS supp_nation,
      n2.n_name AS cust_nation,
      CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension table (nation) joined in two
    roles, with a disjunctive cross-role predicate.

    Scale: both nation roles broadcast; supplier/customer broadcast; the
    cross-role pair filter applies after the broadcasts so no extra
    shuffle. lineitem⋈orders remains the single big exchange.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dim(s, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(dim(c, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q8 — market share of one supplier nation, by order year
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle="""
    SELECT
      o_year,
      ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
            / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT
        CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        l_extendedprice * (1 - l_discount) AS volume,
        n1.n_name AS nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) all_sales
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way star join + conditional-aggregate ratio."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(dim(p, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dim(s, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(dim(c, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — profit by supplier nation and year for a part-name family
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle="""
    SELECT
      n_name AS nation,
      CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit = discounted price; fixtures lack
    ps_supplycost). The LIKE filter prunes part before it broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(dim(p, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dim(s, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_profit")
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item revenue by customer (top 20)
# ---------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle="""
    SELECT
      c_custkey,
      c_name,
      n_name AS nation,
      -- sum in exact decimal: double-sum reduction order differs between
      -- engines and flips ROUND at .005 boundaries for small groups
      CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: join + agg + TakeOrderedAndProject top-20.

    The l_returnflag filter pushes to the lineitem scan; orderBy+limit
    never materializes a global sort (per-partition top-k then merge).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01"))
        & (F.col("o_orderdate") < _TS("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dim(c, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (double aggregation)
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left join with an extra join-side predicate, then a
    histogram over the grouped counts (two chained aggregations).

    Scale: first agg shuffles on custkey; second agg input is one row per
    customer and the key domain is tiny — its exchange is negligible.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promo revenue percentage (conditional aggregate ratio)
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(
      100.0 * SUM(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
            / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: broadcast join + CASE-ratio in one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01"))
        & (F.col("l_shipdate") < _TS("1997-02-01"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(dim(p, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by period revenue (scalar-max subquery)
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: aggregate → scalar max → filter back against it.

    Scale: the max is a 1-row broadcast joined against the per-supplier
    aggregate — no single-partition window over the whole table. Revenue
    is rounded BEFORE the max so the equality is bit-stable across
    engines.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(dim(s, "supplier"), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier counts per part group, NOT IN exclusion
# ---------------------------------------------------------------------------


@register(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for partsupp): NOT IN becomes a
    broadcast anti join against the filtered supplier blacklist."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(dim(p, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            dim(bad_supp, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue (correlated avg subquery)
# ---------------------------------------------------------------------------


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = part.p_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: the correlated AVG decorrelates to a per-part aggregate
    joined back on partkey.

    Scale: the brand filter shrinks part to a broadcast; the per-part avg
    is computed only over the surviving partkeys (semi-joined first), so
    the big side is scanned once and aggregated map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    branded = li.join(dim(p, "part"), F.col("l_partkey") == F.col("p_partkey"))
    per_part_avg = (
        branded.groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        branded.join(
            dim(per_part_avg, "part"), F.col("l_partkey") == F.col("avg_partkey")
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.round(F.sum("l_extendedprice") / 7.0, 2)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume orders (HAVING over a grouped join key)
# ---------------------------------------------------------------------------


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           ROUND(o_totalprice, 2) AS totalprice,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    HAVING SUM(l_quantity) > 250
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: pre-aggregate lineitem per order, filter (HAVING), then
    join the few survivors to the dimensions.

    Scale: aggregating lineitem BEFORE the customer join means the join
    input is |orders| not |lineitem|, and the HAVING cuts it to a handful
    of rows — the opposite order would shuffle the full fact table twice.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dim(c, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-attribute predicates across the join
# ---------------------------------------------------------------------------


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides.

    Scale: Catalyst extracts the part-only disjunction
    (brand∈{1,2,3} ∧ size ranges) below the join so the broadcast side
    shrinks before shipping; the mixed residual evaluates post-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(dim(p, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q22 — wealthy customers with no orders (scalar-avg + anti join)
# ---------------------------------------------------------------------------


@register(
    "q22_idle_customers",
    oracle="""
    SELECT n_name AS nation,
           COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY n_name
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery + NOT EXISTS anti join,
    grouped by nation instead of phone prefix (fixtures have no phone).
    "Idle" is no order since 2000 — the fixtures give every customer at
    least one order ever, so the canonical no-orders-at-all predicate is
    degenerate (0 rows ≤ sf0.1); the date-bounded anti join keeps the
    plan shape and yields a non-trivial result at every fixture scale."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _TS("2000-01-01"))
        .select("o_custkey")
    )
    n = load_table(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS / exact quantiles / histogram / salted skew agg
# ---------------------------------------------------------------------------


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube — arbitrary
    set list). Catalyst expands to a single Expand + one aggregate, so the
    fact table is scanned once regardless of how many sets are listed."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_rows
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "agg_exact_quantiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 4) AS q25_qty,
           ROUND(CAST(quantile_cont(l_quantity, 0.50) AS DOUBLE), 4) AS median_qty,
           ROUND(CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE), 4) AS q75_qty,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE), 4) AS p95_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). Exact quantiles need the full value multiset per
    group — fine for a handful of groups; for high-cardinality groups at
    100 TB switch to approx_percentile (t-digest, mergeable map-side)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q25_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.50)), 4).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("q75_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95_price"),
    )


@register(
    "agg_price_histogram",
    oracle="""
    -- DuckDB has no width_bucket; with low=0 the arithmetic form is exact:
    -- bucket = floor(v / width) + 1  (all o_totalprice lie in (0, 500000))
    SELECT CAST(FLOOR(o_totalprice / 50000.0) + 1 AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS bucket_total
    FROM orders
    GROUP BY bucket
    """,
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the distributed substitute
    for the reference's per-column B-tree statistics (db.go:97-103)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(10))
            .cast("bigint")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("bucket_total"),
        )
    )


@register(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM("value"), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation: groupBy(key, salt) → groupBy(key).

    Identical result to a plain groupBy; the point is the plan shape for
    skewed keys at 100 TB — the first stage spreads a hot key over 16
    salt buckets so no single reducer owns it, the second stage merges 16
    rows per key. SUM/COUNT re-aggregate losslessly.
    """
    e = load_table(spark, sf_dir, "events")
    salted = (
        e.withColumn("_salt", (F.xxhash64("event_id") % 16))
        .groupBy("event_type", "_salt")
        .agg(F.count("*").alias("_n"), F.sum("value").alias("_v"))
    )
    return salted.groupBy("event_type").agg(
        F.sum("_n").alias("n_events"),
        F.round(F.sum("_v"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Remaining join types: full outer, explicit cross
# ---------------------------------------------------------------------------


@register(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (nations present in
    either). Aggregate-before-join keeps the outer join input at key
    cardinality, not fact cardinality."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, F.col("c_nk") == F.col("s_nk"), "full_outer").select(
        F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, s.o_orderstatus
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Cartesian product (dimension × tiny derived set). Safe
    only when one side is provably small — Catalyst turns it into a
    BroadcastNestedLoopJoin; anything larger belongs in an equi-join."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    st = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(F.broadcast(st))


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part (correlated scalar-MIN subquery).
# Fixture has no partsupp, so the part↔supplier cost relation is derived
# from lineitem: ps_supplycost := MIN(l_extendedprice) per (part, supp) —
# the canonical correlated-min plan shape is unchanged (TPC-H Q2;
# reference surface: internal/db/db.go delegates all SQL to Postgres).
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    ), eligible AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
      FROM ps
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ps_supplycost AS supplycost
    FROM eligible e JOIN part ON e.ps_partkey = p_partkey
    WHERE p_size = 15
      AND ps_supplycost = (
        SELECT MIN(ps_supplycost) FROM eligible e2
        WHERE e2.ps_partkey = e.ps_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN decorrelates to a window-min over the
    region-eligible cost relation, then an equality filter — one shuffle on
    partkey instead of a per-row subquery.

    Scale: the derived ps relation is |parts|x|supps-per-part| (far smaller
    than lineitem after the groupBy's partial aggregation); supplier/nation/
    region are broadcast; the window and the groupBy share the partkey
    hash-partitioning so AQE coalesces them into adjacent stages. MIN is an
    exact value-selection (no summation), so the equality filter is
    bit-identical across engines.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min("l_extendedprice").alias("ps_supplycost"))
    sup = dim(load_table(spark, sf_dir, "supplier"), "supplier")
    nat = dim(load_table(spark, sf_dir, "nation"), "nation")
    reg = dim(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"),
        "region",
    )
    eligible = (
        ps.join(sup, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("ps_partkey")
    best = eligible.withColumn(
        "min_cost", F.min("ps_supplycost").over(w)
    ).filter(F.col("ps_supplycost") == F.col("min_cost"))
    prt = dim(
        load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15), "part"
    )
    return (
        best.join(prt, F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11 — important-stock: group value vs a fraction of the global total
# (HAVING against a scalar subquery). Stock value derived from lineitem
# revenue per part over suppliers of selected nations.
# ---------------------------------------------------------------------------


@register(
    "q11_important_parts",
    oracle="""
    WITH supvalue AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
               AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3','NATION_8','NATION_13','NATION_18')
      GROUP BY 1
    )
    SELECT partkey, CAST(ROUND(val, 2) AS DOUBLE) AS total_value
    FROM supvalue
    WHERE CAST(val AS DOUBLE) >
          (SELECT CAST(SUM(val) AS DOUBLE) FROM supvalue) * 0.001
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group sum filtered against a fraction of the
    global sum (scalar subquery → 1-row broadcast join).

    Determinism: both per-part and global sums are exact DECIMAL(18,6)
    accumulations (identical in any reduction order on both engines); the
    threshold compare happens after a deterministic IEEE double conversion,
    so no last-ulp flips at the HAVING boundary.

    Scale: one shuffle (groupBy partkey) carrying partial-aggregated rows;
    the global total re-aggregates the small per-part frame, not lineitem;
    the scalar joins back as a broadcast of one row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = dim(load_table(spark, sf_dir, "supplier"), "supplier")
    nat = dim(
        load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13", "NATION_18")
        ),
        "nation",
    )
    supvalue = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("val")
        )
    )
    total = supvalue.agg(
        F.sum("val").cast("double").alias("grand_total")
    )
    return (
        supvalue.join(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("grand_total") * F.lit(0.001))
        .select(
            "partkey",
            F.round(F.col("val"), 2).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 — priority-class line counts by return class (CASE aggregation with a
# cross-table date comparison). Fixture has no l_shipmode/l_commitdate/
# l_receiptdate: return-flag classes stand in for ship modes and
# "shipped ≥30 days after order" stands in for the commit/receipt lag.
# ---------------------------------------------------------------------------


@register(
    "q12_priority_classes",
    oracle="""
    SELECT l_returnflag AS return_class,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional CASE aggregation into two
    pivoted counters.

    Scale: the date range and returnflag filters push to the lineitem scan
    (PushedFilters); the join shuffles on orderkey with the non-equi date
    lag applied post-join; partial aggregation reduces each task's output
    to ≤2 rows before the final 2-row exchange.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.expr("l_shipdate >= o_orderdate + INTERVAL 30 DAY"))
        .groupBy(F.col("l_returnflag").alias("return_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess stock of selected parts (nested IN
# subqueries). "Stock" is derived from shipped quantity per (supp, part).
# ---------------------------------------------------------------------------


@register(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 50
      )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: two nested IN subqueries — part-name filter feeds a
    grouped HAVING feeds a semi join on supplier.

    Scale: the filtered part list broadcasts into a LEFT SEMI against
    lineitem (no fan-out); the (supp, part) groupBy carries partial sums;
    the surviving supplier keys are tiny and semi-join (broadcast) into the
    supplier dimension. Quantity sums are exact decimals, so the HAVING
    threshold cannot flip between engines.
    """
    prt = dim(
        load_table(spark, sf_dir, "part").filter(
            F.col("p_name").startswith("large")
        ),
        "part",
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _TS("1996-01-01"))
            & (F.col("l_shipdate") < _TS("1997-01-01"))
        )
        .join(prt, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    excess_keys = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = dim(load_table(spark, sf_dir, "nation"), "nation")
    reg = dim(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"),
        "region",
    )
    return (
        sup.join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(excess_keys, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept multi-supplier orders waiting (EXISTS +
# NOT EXISTS self-joins on lineitem). "Late" is shipped >60 days after the
# order date (fixture has no commit/receipt dates).
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE r_name = 'EUROPE'
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS/NOT-EXISTS pair collapses into per-order
    distinct-supplier counts — a line qualifies iff its order has >1
    distinct supplier (EXISTS) and exactly one distinct LATE supplier
    (NOT EXISTS, since the qualifying line itself is late).

    Scale: instead of two more shuffles of lineitem for the self-joins,
    both counts come from collect_set window aggregates over the SAME
    orderkey partitioning the orders join already established — one shuffle
    total, and the per-order sets are bounded by lines-per-order (~7), so
    no skew risk.
    """
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAY")
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late", late
    )
    w = Window.partitionBy("l_orderkey")
    flagged = lo.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(
            F.collect_set(
                F.when(F.col("is_late"), F.col("l_suppkey"))
            ).over(w)
        ),
    )
    qual = flagged.filter(
        F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    sup = dim(load_table(spark, sf_dir, "supplier"), "supplier")
    nat = dim(load_table(spark, sf_dir, "nation"), "nation")
    reg = dim(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"),
        "region",
    )
    return (
        qual.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
