"""Graph analytics over the order network: iterative PageRank and
common-neighbor similarity.

The reference ingests relational rows (internal/writer/writer.go); the
natural graph downstream of that data is the customer–supplier bipartite
network induced by orders⋈lineitem. Connected components already live in
operators/dedup.py (min-label propagation + large-star); these two add the
other canonical graph workloads.

Engine stability: every float that feeds a cross-engine comparison or a
sum is floor-quantized onto an exact integer grid first (see
queries/__init__.py and mlprep.py docstrings) — score sums are BIGINT
arithmetic, so iteration results match DuckDB bit-for-bit. Division and
literal damping factors are explicit DOUBLEs on both sides (DuckDB's bare
0.85 is DECIMAL; Spark's is DOUBLE — a silent type drift that changes
results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import load_table
from . import register

_D = 0.85  # damping
_ITERS = 3


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct bidirectional customer–supplier edges from order lines."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


@register(
    "pagerank_bipartite",
    oracle="""
    WITH e AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), ed AS (
      SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
    ), deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM ed GROUP BY src
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM deg),
    s0 AS (
      SELECT node, outdeg, CAST(1.0 AS DOUBLE) / nn AS score
      FROM deg CROSS JOIN n
    ), it1 AS (
      SELECT ed.dst AS node, ANY_VALUE(d.outdeg2) AS outdeg,
        CAST(0.15 AS DOUBLE) / ANY_VALUE(nn) + CAST(0.85 AS DOUBLE)
          * (CAST(SUM(FLOOR(s.score / s.outdeg * 1e15 + 0.5)) AS DOUBLE)
             / 1e15) AS score
      FROM ed
      JOIN s0 s ON ed.src = s.node
      JOIN (SELECT node, outdeg AS outdeg2 FROM deg) d ON ed.dst = d.node
      CROSS JOIN n
      GROUP BY ed.dst
    ), it2 AS (
      SELECT ed.dst AS node, ANY_VALUE(d.outdeg2) AS outdeg,
        CAST(0.15 AS DOUBLE) / ANY_VALUE(nn) + CAST(0.85 AS DOUBLE)
          * (CAST(SUM(FLOOR(s.score / s.outdeg * 1e15 + 0.5)) AS DOUBLE)
             / 1e15) AS score
      FROM ed
      JOIN it1 s ON ed.src = s.node
      JOIN (SELECT node, outdeg AS outdeg2 FROM deg) d ON ed.dst = d.node
      CROSS JOIN n
      GROUP BY ed.dst
    ), it3 AS (
      SELECT ed.dst AS node,
        CAST(0.15 AS DOUBLE) / ANY_VALUE(nn) + CAST(0.85 AS DOUBLE)
          * (CAST(SUM(FLOOR(s.score / s.outdeg * 1e15 + 0.5)) AS DOUBLE)
             / 1e15) AS score
      FROM ed
      JOIN it2 s ON ed.src = s.node
      CROSS JOIN n
      GROUP BY ed.dst
    )
    SELECT node, FLOOR(score * 1e9 + 0.5) / 1e9 + 0.0 AS pagerank
    FROM it3
    """,
)
def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 iterations) on the bidirectional
    customer–supplier graph — the iterative-algorithm shape Spark
    expresses as a join+aggregate loop over DataFrames.

    Per iteration: one hash join of edges⋈scores on src and one groupBy
    dst — two shuffles per iteration, data-sized but degree-bounded.
    Every node has out-degree >= 1 by construction (edges are
    bidirectional), so there is no dangling-mass correction, and every
    node also has an in-edge, so the aggregate covers all nodes.

    r17 (measured, interleaved noop A/B at sf0.1): the edge list and
    degree table are localCheckpoint-ed once — without it every
    iteration's plan re-embeds the orders⋈lineitem+distinct subtree and
    the final 3-iteration plan re-scans/re-shuffles it (r16's persist
    A/B was a wash; the checkpoint, which also TRUNCATES the lineage
    the optimizer replans per iteration, is not: base 5.3s → 3.7s with
    both, cold-first-run 12.7 → 5.4 — the dedup.py connected-components
    pattern this docstring already pointed at). The rank state (one row
    per customer/supplier — DIMENSION-sized, never fact-sized)
    broadcasts into the edge join per guide §3.1, saving the
    per-iteration exchange AQE would otherwise materialize before
    reaching the same join. Contributions are floor-quantized to a
    1e-15 grid so per-node sums are exact BIGINT arithmetic —
    reduction-order-independent, hence checkpoint/broadcast cannot
    change a single output bit (pinned in test_r17_optimizations.py).
    """
    ed = _edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = ed.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("outdeg")
    ).localCheckpoint(eager=True)
    n = deg.agg(F.count("*").cast("bigint").alias("nn"))
    state = deg.crossJoin(F.broadcast(n)).select(
        "node", "outdeg", (F.lit(1.0) / F.col("nn")).alias("score")
    )
    for last in [False, False, True]:
        contrib = ed.join(
            F.broadcast(state.withColumnRenamed("node", "src")), "src"
        ).select(
            "dst",
            F.floor(
                F.col("score") / F.col("outdeg") * 1e15 + F.lit(0.5)
            ).alias("cq"),
        )
        agg = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("cq").alias("sq"))
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    F.lit(0.15) / F.col("nn")
                    + F.lit(0.85) * (F.col("sq").cast("double") / F.lit(1e15))
                ).alias("score"),
            )
        )
        state = agg if last else agg.join(deg, "node").select(
            "node", "outdeg", "score"
        )
    return state.select(
        "node",
        (F.floor(F.col("score") * 1e9 + F.lit(0.5)) / 1e9 + F.lit(0.0)).alias(
            "pagerank"
        ),
    )


@register(
    "supplier_jaccard",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS s, o_custkey AS c
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), deg AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY s
    ), shared AS (
      SELECT a.s AS s1, b.s AS s2, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM e a JOIN e b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT s1, s2, n_shared,
      FLOOR(CAST(n_shared AS DOUBLE)
        / CAST(d1.d + d2.d - n_shared AS DOUBLE) * 1e6 + 0.5) / 1e6 + 0.0
        AS jaccard
    FROM shared
    JOIN (SELECT s, d FROM deg) d1 ON s1 = d1.s
    JOIN (SELECT s, d FROM deg) d2 ON s2 = d2.s
    """,
)
def supplier_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor Jaccard similarity between suppliers: customers
    as the neighbor sets, |A∩B| / |A∪B| per supplier pair — the
    collaborative-filtering primitive ("suppliers serving the same
    customers").

    The pair generation self-joins the DISTINCT (supplier, customer)
    edge list on the customer key, so fan-out per customer is bounded by
    that customer's supplier count squared — the same hot-key cap
    argument as basket_type_pairs and ngram_jaccard_pairs; at 100 TB a
    df-cap on promiscuous customers bounds the worst key. Degrees join
    back on the supplier-pair side (supplier-domain-sized, AQE
    broadcasts it when small). Exact integer set sizes; one IEEE
    division, floor-quantized.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    deg = e.groupBy("s").agg(F.count("*").cast("bigint").alias("d"))
    a, b = e.alias("a"), e.alias("b")
    shared = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    return (
        shared.join(d1, "s1")
        .join(d2, "s2")
        .select(
            "s1",
            "s2",
            "n_shared",
            (
                F.floor(
                    F.col("n_shared").cast("double")
                    / (F.col("d1") + F.col("d2") - F.col("n_shared")).cast(
                        "double"
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
                + F.lit(0.0)
            ).alias("jaccard"),
        )
    )
