"""Round-15 driver queries: the incremental-MV family's read side —
approx percentiles (signed log-bucket histograms) and MV QUERY REWRITE.

* lake_mv_percentile — a (status -> count, sum, percentile histogram)
  MV maintained O(delta) through appends, group-moving merges, and
  deletes; the query returns EXACT rank-based percentiles recomputed
  from the final source snapshot (hashed against DuckDB's identical
  window formulation) and pins the MV's histogram estimates within the
  declared 1% relative error of those exact values.
* lake_mv_rewrite — a GROUP BY whose grouping/measure set is subsumed
  by a finer-grained MV is answered FROM the MV (rewrite_with_mv): the
  result hashes against the oracle's source-form aggregate while an
  in-query plan pin proves the rewrite never scanned the source table,
  plus a negative probe (non-subsumed measure -> None fallback).

Reference parity: the reference aggregates in Postgres at query time
(SURVEY §3); percentile state and MV routing are north-star lakehouse
surface (materialized-view rewrite is the read half of IVM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from .round11 import _densified_orders


@register(
    "lake_mv_percentile",
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
    ),
    ranked AS (
      SELECT status, cents,
             CAST((cents % 199) - 99 AS DOUBLE) / 100.0 AS frac,
             ROW_NUMBER() OVER (
               PARTITION BY status ORDER BY cents
             ) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY status
               ORDER BY CAST((cents % 199) - 99 AS DOUBLE) / 100.0
             ) AS rnf,
             COUNT(*) OVER (PARTITION BY status) AS cnt
      FROM final
    )
    SELECT status,
           CAST(MAX(cnt) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.5 * cnt) AS BIGINT)
                         THEN cents END) AS BIGINT) AS p50,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.9 * cnt) AS BIGINT)
                         THEN cents END) AS BIGINT) AS p90,
           MAX(CASE WHEN rnf = CAST(CEIL(0.5 * cnt) AS BIGINT)
                    THEN frac END) AS p50f,
           MAX(CASE WHEN rnf = CAST(CEIL(0.9 * cnt) AS BIGINT)
                    THEN frac END) AS p90f
    FROM ranked GROUP BY status
    """,
)
def lake_mv_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx percentiles in the incremental MV (operators/mv.py::
    refresh_mv percentile_cols, r15): the MV stores a signed
    log-bucket histogram per group — fully self-maintainable under
    BOTH inserts and deletes (no endangered recompute, no aux state),
    with read-time estimates (hist_percentile) within the declared 1%
    relative error of exact percentile_disc. History mirrors the MV
    family: bootstrap two-thirds (v0), append (v1), group-moving MERGE
    at +3 cents (v2), CoW DELETE of (u, 2u] (v3) — deletes that a
    sketch could not forget fold EXACTLY here — then ONE incremental
    refresh. The hashed output is the EXACT rank-based percentile
    (value at rank ceil(q*n), the estimator's own target rank)
    recomputed from the final snapshot; the histogram estimates are
    pinned within 1% of those values in-query.

    r16 extension (VERDICT What's-wrong #1): a SECOND percentile
    column ``frac`` = ((cents % 199) − 99) / 100 spans the MIXED-SIGN
    FRACTIONAL domain [−0.99, 0.99] — exactly the range the r15
    bucket encoding collided (positive sub-1 values landed in the
    negative mirror). Its exact rank percentiles hash against the
    oracle and the histogram estimates are pinned in-query: relative
    error for nonzero targets, exact 0.0 for a zero target."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.mv import hist_percentile, refresh_mv

    def with_frac(df):
        # keep frac = f(cents) through every DML wave, mirroring the
        # oracle's derivation in its final CTE
        return df.withColumn(
            "frac",
            ((F.col("cents") % 199) - 99).cast("double") / F.lit(100.0),
        )

    o = _densified_orders(spark, sf_dir)
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_mvpct_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_mvpct_"))
    kw = dict(
        name="orders_pct", group_cols=["status"], sum_cols=["cents"],
        key="k", percentile_cols=["cents", "frac"],
    )
    try:
        src.commit(
            with_frac(
                o.filter(F.col("k") <= 2 * third).select(
                    "k", "status", "cents"
                )
            ),
            mode="overwrite",
        )                                                   # v0
        refresh_mv(src, mv, spark, **kw)
        src.commit(
            with_frac(
                o.filter(F.col("k") > 2 * third).select(
                    "k", "status", "cents"
                )
            ),
            mode="append",
        )                                                   # v1
        merge_into(
            src, spark,
            with_frac(
                o.filter(F.col("k") <= u).select(
                    "k",
                    F.lit("MV").alias("status"),
                    (F.col("cents") + 3).alias("cents"),
                )
            ),
            key="k",
        )                                                   # v2
        src.delete_where(
            spark, F.col("k").between(u + 1, 2 * u), prune_where="auto"
        )                                                   # v3
        refresh_mv(src, mv, spark, **kw)
        # exact rank-based percentiles from the final snapshot — the
        # oracle-comparable truth (bigint cents + double frac,
        # hash-stable: both engines derive frac by the same integer
        # arithmetic then one double division)
        w = Window.partitionBy("status").orderBy("cents")
        wf = Window.partitionBy("status").orderBy("frac")
        ranked = (
            src.read(spark)
            .withColumn("rn", F.row_number().over(w))
            .withColumn("rnf", F.row_number().over(wf))
            .withColumn(
                "cnt",
                F.count("*").over(Window.partitionBy("status")),
            )
        )

        def at_rank(rank_col, value_col, q):
            return F.max(
                F.when(
                    F.col(rank_col)
                    == F.ceil(F.lit(q) * F.col("cnt")).cast("bigint"),
                    F.col(value_col),
                )
            )

        exact = ranked.groupBy("status").agg(
            F.max("cnt").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("cents"),
            at_rank("rn", "cents", 0.5).cast("bigint").alias("p50"),
            at_rank("rn", "cents", 0.9).cast("bigint").alias("p90"),
            at_rank("rnf", "frac", 0.5).alias("p50f"),
            at_rank("rnf", "frac", 0.9).alias("p90f"),
        )
        out = exact.localCheckpoint(eager=True)
        # the estimate pin: hist_percentile targets the SAME rank
        # (ceil(q*n)); its bucket midpoint must land within the
        # declared 1% relative error of the exact value — and must
        # carry the right SIGN on the fractional domain (the r15 bug
        # returned −1.948 for an all-positive sub-1 input)
        est = {
            r["status"]: r
            for r in mv.read(spark).select(
                "status",
                hist_percentile("cents_hist", 0.5).alias("e50"),
                hist_percentile("cents_hist", 0.9).alias("e90"),
                hist_percentile("frac_hist", 0.5).alias("e50f"),
                hist_percentile("frac_hist", 0.9).alias("e90f"),
            ).collect()
        }
        for r in out.collect():
            e = est[r["status"]]
            pins = (
                (e["e50"], r["p50"]), (e["e90"], r["p90"]),
                (e["e50f"], r["p50f"]), (e["e90f"], r["p90f"]),
            )
            for got, want in pins:
                if want == 0:
                    ok = got == 0.0
                else:
                    ok = abs(got / want - 1) <= 0.0101
                if not ok:
                    raise AssertionError(
                        f"histogram percentile {got} drifted past 1% "
                        f"from exact {want} in group {r['status']}"
                    )
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out


@register(
    "lake_mv_rewrite",
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
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS avg_cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM final GROUP BY status
    """,
)
def lake_mv_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV QUERY REWRITE (operators/mv.py::rewrite_with_mv, r15) — the
    read side of IVM: a source-form ``GROUP BY status`` is answered
    FROM an MV maintained at the FINER grouping (status, k%5 bucket) —
    subsumption re-aggregates the MV's ~25 rows (SUM/COUNT re-add,
    MIN/MAX re-extremize), never touching the multi-thousand-row
    source. History: bootstrap (v0), append (v1), group-moving MERGE
    (v2), CoW DELETE (v3), one incremental refresh, then the rewrite.
    In-query pins: the rewrite's plan references the MV path and
    NOT the source path (plan-string check); a non-subsumed
    measure (sum of a column the MV does not maintain) returns None —
    the documented fallback; and (r16, spec self-description) the
    rewrite is called with NO spec re-statement — the MV's recorded
    _mv_spec.json serves it — while a CONTRADICTING re-statement and
    a mismatched refresh both raise in-query."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.mv import refresh_mv, rewrite_with_mv

    o = _densified_orders(spark, sf_dir).withColumn(
        "b", (F.col("k") % 5).cast("string")
    )
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_mvrw_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_mvrw_"))
    kw = dict(
        name="orders_rw", group_cols=["status", "b"],
        sum_cols=["cents"], key="k", min_cols=["cents"],
        max_cols=["cents"],
    )
    try:
        src.commit(
            o.filter(F.col("k") <= 2 * third).select(
                "k", "status", "b", "cents"
            ),
            mode="overwrite",
        )                                                   # v0
        refresh_mv(src, mv, spark, **kw)
        src.commit(
            o.filter(F.col("k") > 2 * third).select(
                "k", "status", "b", "cents"
            ),
            mode="append",
        )                                                   # v1
        merge_into(
            src, spark,
            o.filter(F.col("k") <= u).select(
                "k",
                F.lit("MV").alias("status"),
                "b",
                (F.col("cents") + 3).alias("cents"),
            ),
            key="k",
        )                                                   # v2
        src.delete_where(
            spark, F.col("k").between(u + 1, 2 * u), prune_where="auto"
        )                                                   # v3
        refresh_mv(src, mv, spark, **kw)
        # r16 spec pins: a refresh whose kwargs contradict the
        # recorded spec raises; so does a rewrite re-stating a wrong
        # grouping — while the rewrite below passes NO spec at all
        try:
            refresh_mv(src, mv, spark, **{**kw, "min_cols": []})
        except ValueError:
            pass
        else:
            raise AssertionError("mismatched refresh spec did not raise")
        try:
            rewrite_with_mv(
                mv, spark, group_cols=["status"],
                measures={"n_rows": ("count",)},
                mv_group_cols=["status"],
            )
        except ValueError:
            pass
        else:
            raise AssertionError("contradicting rewrite spec did not raise")
        out = rewrite_with_mv(
            mv, spark,
            group_cols=["status"],
            measures={
                "n_rows": ("count",),
                "sum_cents": ("sum", "cents"),
                "avg_cents": ("avg", "cents"),
                "min_cents": ("min", "cents"),
                "max_cents": ("max", "cents"),
            },
        )
        if out is None:
            raise AssertionError("subsumed rewrite unexpectedly fell back")
        # plan pin: the rewrite scans the MV's files, never the
        # source's (inputFiles = the scan set the plan actually reads)
        files = out.inputFiles()
        if any(src.path in f for f in files):
            raise AssertionError("rewrite plan reads the source")
        if not files or not all(mv.path in f for f in files):
            raise AssertionError(
                f"rewrite plan does not read the MV: {files[:3]}"
            )
        # negative probe: a measure the MV does not maintain falls back
        if rewrite_with_mv(
            mv, spark, group_cols=["status"],
            measures={"s": ("sum", "k")},
        ) is not None:
            raise AssertionError("non-subsumed rewrite did not fall back")
        out = out.select(
            "status",
            F.col("n_rows").cast("bigint"),
            F.col("sum_cents").cast("bigint"),
            F.col("avg_cents").cast("double"),
            F.col("min_cents").cast("bigint"),
            F.col("max_cents").cast("bigint"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out
