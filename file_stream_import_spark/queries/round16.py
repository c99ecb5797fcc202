"""Round-16 driver queries: join-MV percentile histograms and the
spec-served rewrite over a join MV.

* lake_join_mv_percentile — an (orders |><| customer) join MV keyed on
  segment, maintaining COUNT/SUM plus a percentile histogram over a
  MIXED-SIGN FRACTIONAL column (the domain the r15 bucket encoding
  corrupted), refreshed O(delta) through a left append, a right-side
  segment move (regrouping every joined row under the moved keys), and
  a left delete wave. The hashed output is the EXACT rank-based
  percentile recomputed from the final join; in-query pins hold the
  MV's histogram estimates within the declared 1% AND exercise the
  spec-served rewrite (no spec re-statement) to the GLOBAL grouping —
  histogram re-merge across segments — with an inputFiles() proof that
  the rewrite never reads either join side.

* lake_mv_quality_percentile — per-language quality-score percentiles
  maintained incrementally over a curated documents corpus: the score
  is a strictly-positive sub-1 fraction (C4/Gopher-style composite) —
  the exact value domain the r15 bucket encoding corrupted — folded
  through an append and a quality-floor CoW delete, exact rank values
  hashed vs DuckDB with in-query estimate pins.

* lake_mv_filtered — a FILTERED (partial) MV: "high-value orders"
  (cents >= $20k) maintained through a MERGE that moves rows across
  the view boundary in both directions and a delete wave that
  endangers view minima; the hashed output is the MV's OWN stored
  state vs DuckDB's filtered aggregate.

* lake_mv_cascade — CASCADED rollup MVs (refresh_rollup_mv, second
  session): base -> fine (prio, month) -> coarse (prio), the coarse
  level maintained O(delta) from the fine MV's CDF and derived
  entirely from the fine MV's recorded spec; hashed output is the
  coarse MV's stored state vs DuckDB's direct aggregate of the final
  base, with in-query pins on merged-histogram percentiles, unioned
  HLL estimates, and a rewrite_with_mv GLOBAL answer (kind "rollup"
  spec) whose inputFiles() prove it reads neither base nor fine.

Reference parity: the reference joins and aggregates in Postgres at
query time (SURVEY §3); incremental join-view maintenance with
percentile state is north-star lakehouse surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import load_table
from . import register


@register(
    "lake_join_mv_percentile",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_custkey AS ck,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 10 AS u FROM base),
    left_final AS (
      SELECT k, ck, cents,
             CAST((cents % 199) - 99 AS DOUBLE) / 100.0 AS frac
      FROM base, p
      WHERE NOT (k > p.u AND k <= 2 * p.u)
    ),
    segs AS (
      SELECT c_custkey AS ck,
             CASE WHEN c_custkey % 7 = 0 THEN 'MV'
                  ELSE c_mktsegment END AS seg
      FROM customer
    ),
    joined AS (
      SELECT s.seg, l.cents, l.frac
      FROM left_final l JOIN segs s ON l.ck = s.ck
    ),
    ranked AS (
      SELECT seg, cents, frac,
             ROW_NUMBER() OVER (
               PARTITION BY seg ORDER BY frac
             ) AS rnf,
             COUNT(*) OVER (PARTITION BY seg) AS cnt
      FROM joined
    )
    SELECT seg,
           CAST(MAX(cnt) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           MAX(CASE WHEN rnf = CAST(CEIL(0.5 * cnt) AS BIGINT)
                    THEN frac END) AS p50f,
           MAX(CASE WHEN rnf = CAST(CEIL(0.9 * cnt) AS BIGINT)
                    THEN frac END) AS p90f
    FROM ranked GROUP BY seg
    """,
)
def lake_join_mv_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile histograms in the JOIN MV (operators/mv.py::
    refresh_join_mv percentile_cols, r16) + the spec-served rewrite.

    History: bootstrap the left side with the first 2/3 of densified
    orders joined against the full customer dim (v0), append the last
    third (left delta joins the pruned right snapshot), MERGE every
    ck%7==0 customer into segment 'MV' (right delta joins the pruned
    LEFT snapshot at its watermark — the regroup decomposes into
    -old/+new signed joined rows), then CoW-DELETE the left k in
    (u, 2u] — deletes the histogram forgets EXACTLY (signed bucket
    fold, no endangered recompute). One incremental refresh per wave.

    The hashed output is the EXACT rank percentile (value at rank
    ceil(q*n), the estimator's own target) of the mixed-sign
    fractional column recomputed from the final join. In-query pins:
    (1) hist_percentile estimates within the declared 1% of those
    exact values per segment; (2) rewrite_with_mv with NO spec
    re-statement (the MV's recorded _mv_spec.json serves it) answers
    the GLOBAL grouping by re-merging the per-segment histograms —
    estimates within 1% of the exact global rank values — while
    inputFiles() proves the rewrite read ONLY the MV, never either
    join side."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.curation import dense_sequence
    from ..operators.mv import (
        hist_percentile,
        refresh_join_mv,
        rewrite_with_mv,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    o = dense_sequence(o, "o_orderkey", out_col="k").select(
        "k", "ck", "cents",
        (((F.col("cents") % 199) - 99).cast("double") / F.lit(100.0))
        .alias("frac"),
    )
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_mktsegment").alias("seg"),
    ).localCheckpoint(eager=True)
    a = VersionedTable(tempfile.mkdtemp(prefix="lake_jmvp_a_"))
    b = VersionedTable(tempfile.mkdtemp(prefix="lake_jmvp_b_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_jmvp_"))
    kw = dict(
        name="jmvp", on=["ck"], group_cols=["seg"],
        sum_cols=["cents"], key_a="k", key_b="ck",
        percentile_cols=["frac"],
    )
    try:
        a.commit(o.filter(F.col("k") <= 2 * third), mode="overwrite")
        b.commit(c, mode="overwrite")
        refresh_join_mv(a, b, mv, spark, **kw)          # bootstrap join
        a.commit(o.filter(F.col("k") > 2 * third), mode="append")
        refresh_join_mv(a, b, mv, spark, **kw)          # left delta
        merge_into(
            b, spark,
            c.filter(F.col("ck") % 7 == 0).withColumn(
                "seg", F.lit("MV")
            ),
            key="ck",
        )
        refresh_join_mv(a, b, mv, spark, **kw)          # right regroup
        a.delete_where(
            spark, F.col("k").between(u + 1, 2 * u), prune_where="auto"
        )
        refresh_join_mv(a, b, mv, spark, **kw)          # left delete
        # exact rank percentiles from the FINAL join — the oracle-
        # comparable truth (frac derives from cents by identical
        # integer arithmetic + one double division on both engines)
        joined = a.read(spark).join(b.read(spark), on="ck", how="inner")
        wf = Window.partitionBy("seg").orderBy("frac")
        ranked = (
            joined
            .withColumn("rnf", F.row_number().over(wf))
            .withColumn(
                "cnt", F.count("*").over(Window.partitionBy("seg"))
            )
        )

        def at_rank(q):
            return F.max(
                F.when(
                    F.col("rnf")
                    == F.ceil(F.lit(q) * F.col("cnt")).cast("bigint"),
                    F.col("frac"),
                )
            )

        exact = ranked.groupBy("seg").agg(
            F.max("cnt").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            at_rank(0.5).alias("p50f"),
            at_rank(0.9).alias("p90f"),
        )
        out = exact.localCheckpoint(eager=True)

        def pin(got, want, where):
            ok = got == 0.0 if want == 0 else (
                got is not None and abs(got / want - 1) <= 0.0101
            )
            if not ok:
                raise AssertionError(
                    f"histogram percentile {got} drifted past 1% from "
                    f"exact {want} ({where})"
                )

        # pin 1: per-segment estimates from the MV's stored histograms
        est = {
            r["seg"]: (r["e50"], r["e90"])
            for r in mv.read(spark).select(
                "seg",
                hist_percentile("frac_hist", 0.5).alias("e50"),
                hist_percentile("frac_hist", 0.9).alias("e90"),
            ).collect()
        }
        for r in out.collect():
            e50, e90 = est[r["seg"]]
            pin(e50, r["p50f"], f"seg {r['seg']} p50")
            pin(e90, r["p90f"], f"seg {r['seg']} p90")
        # pin 2: spec-served rewrite to the GLOBAL grouping — the
        # per-segment histograms re-merge by signed bucket union, and
        # the plan reads ONLY the MV (no spec re-statement passed)
        g = rewrite_with_mv(
            mv, spark, group_cols=[],
            measures={
                "n": ("count",),
                "g50": ("percentile", "frac", 0.5),
                "g90": ("percentile", "frac", 0.9),
            },
        )
        if g is None:
            raise AssertionError("subsumed global rewrite fell back")
        files = g.inputFiles()
        if not files or not all(mv.path in f for f in files):
            raise AssertionError(
                f"rewrite plan does not read only the MV: {files[:3]}"
            )
        grow = g.first()
        wg = Window.orderBy("frac")
        granked = (
            joined.withColumn("rnf", F.row_number().over(wg))
            .withColumn("cnt", F.count("*").over(Window.partitionBy()))
        )
        gexact = granked.agg(
            F.max(
                F.when(
                    F.col("rnf")
                    == F.ceil(F.lit(0.5) * F.col("cnt")).cast("bigint"),
                    F.col("frac"),
                )
            ).alias("e50"),
            F.max(
                F.when(
                    F.col("rnf")
                    == F.ceil(F.lit(0.9) * F.col("cnt")).cast("bigint"),
                    F.col("frac"),
                )
            ).alias("e90"),
        ).first()
        if grow["n"] != granked.count():
            raise AssertionError("global rewrite row count drifted")
        pin(grow["g50"], gexact["e50"], "global p50")
        pin(grow["g90"], gexact["e90"], "global p90")
    finally:
        shutil.rmtree(a.path, ignore_errors=True)
        shutil.rmtree(b.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out


@register(
    "lake_mv_quality_percentile",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang, n_chars,
        string_split_regex(trim(text), '\s+') AS toks,
        length(text) AS len_chars,
        length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
          AS n_punct,
        length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
      FROM documents
    ), r AS (
      SELECT doc_id, lang, n_chars,
        len(list_filter(toks, x -> x IN
          ('the','a','of','and','in','to','is','on','for','with'))) * 1.0
          / len(toks) AS stop_r,
        n_punct * 1.0 / len_chars AS punct_r,
        n_upper * 1.0 / len_chars AS upper_r
      FROM t
    ), scored AS (
      SELECT doc_id, lang, n_chars,
        ROUND(LEAST(stop_r * 5, 1.0) * 0.5
              + (1 - LEAST(punct_r * 10, 1.0)) * 0.25
              + (1 - LEAST(upper_r * 10, 1.0)) * 0.25, 4) AS q
      FROM r
    ),
    final AS (SELECT * FROM scored WHERE NOT (q < 0.3)),
    ranked AS (
      SELECT lang, n_chars, q,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS cnt
      FROM final
    )
    SELECT lang,
           CAST(MAX(cnt) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * cnt) AS BIGINT)
                    THEN q END) AS p50q,
           MAX(CASE WHEN rn = CAST(CEIL(0.9 * cnt) AS BIGINT)
                    THEN q END) AS p90q
    FROM ranked GROUP BY lang
    """,
)
def lake_mv_quality_percentile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-score percentiles in the incremental MV — the r15
    VERDICT's own motivating domain ("fractions in (0,1) are exactly
    LLM-pipeline material: quality scores, probabilities, ratios"),
    which the pre-r16 bucket encoding silently corrupted.

    The C4/Gopher-style composite quality score (operators/text.py::
    with_quality_score, oracle-proven since round 1 via text_quality)
    lands every document in [0, 1]. A versioned corpus table
    bootstraps with two thirds of the docs (v0), appends the rest
    (v1), then a curation pass CoW-DELETEs every doc scoring under
    0.3 (v2) — the histogram forgets the deleted mass EXACTLY (signed
    bucket fold). One incremental refresh per wave maintains a
    per-language MV of COUNT + SUM(n_chars) + quality histogram. The
    hashed output is the exact rank-based percentile (value at rank
    ceil(q*n)) per language from the final corpus; in-query pins hold
    the MV's histogram estimates within the declared 1% of those
    values — all of them strictly positive sub-1 fractions."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..io.versioned import VersionedTable
    from ..operators.mv import hist_percentile, refresh_mv
    from ..operators.text import with_quality_score

    d = with_quality_score(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "n_chars",
        F.col("quality_score").alias("q"),
    ).localCheckpoint(eager=True)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_qpct_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_qpct_"))
    kw = dict(
        name="doc_quality", group_cols=["lang"],
        sum_cols=["n_chars"], key="doc_id", percentile_cols=["q"],
    )
    try:
        src.commit(
            d.filter(F.col("doc_id") % 3 != 0), mode="overwrite"
        )                                                   # v0
        refresh_mv(src, mv, spark, **kw)
        src.commit(
            d.filter(F.col("doc_id") % 3 == 0), mode="append"
        )                                                   # v1
        refresh_mv(src, mv, spark, **kw)
        src.delete_where(
            spark, F.col("q") < 0.3, prune_where="auto"
        )                                                   # v2: curate
        refresh_mv(src, mv, spark, **kw)
        w = Window.partitionBy("lang").orderBy("q")
        ranked = (
            src.read(spark)
            .withColumn("rn", F.row_number().over(w))
            .withColumn(
                "cnt", F.count("*").over(Window.partitionBy("lang"))
            )
        )

        def at_rank(q):
            return F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.lit(q) * F.col("cnt")).cast("bigint"),
                    F.col("q"),
                )
            )

        exact = ranked.groupBy("lang").agg(
            F.max("cnt").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            at_rank(0.5).alias("p50q"),
            at_rank(0.9).alias("p90q"),
        )
        out = exact.localCheckpoint(eager=True)
        est = {
            r["lang"]: (r["e50"], r["e90"])
            for r in mv.read(spark).select(
                "lang",
                hist_percentile("q_hist", 0.5).alias("e50"),
                hist_percentile("q_hist", 0.9).alias("e90"),
            ).collect()
        }
        for r in out.collect():
            e50, e90 = est[r["lang"]]
            for got, want in ((e50, r["p50q"]), (e90, r["p90q"])):
                ok = got == 0.0 if want == 0 else (
                    got is not None and abs(got / want - 1) <= 0.0101
                )
                if not ok:
                    raise AssertionError(
                        f"quality percentile {got} drifted past 1% "
                        f"from exact {want} in lang {r['lang']} — "
                        "sub-1 positive fractions are the r15 bug's "
                        "domain; this pin must never regress"
                    )
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out


@register(
    "lake_mv_filtered",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 10 AS u FROM base),
    moved AS (
      SELECT b.k, b.status,
             CASE WHEN b.k <= p.u AND b.k % 2 = 0
                    THEN b.cents + 1000000
                  WHEN b.k <= p.u
                    THEN b.cents - 1000000
                  ELSE b.cents END AS cents
      FROM base b, p
    ),
    final AS (
      SELECT m.k, m.status, m.cents
      FROM moved m, p
      WHERE NOT (m.k > p.u AND m.k <= 2 * p.u)
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents
    FROM final
    WHERE cents >= 2000000
    GROUP BY status
    """,
)
def lake_mv_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED (partial) MV (operators/mv.py::refresh_mv
    source_where, r16): a "high-value orders" view — the MV maintains
    COUNT/SUM/MIN over ONLY rows with cents >= $20k, with the
    predicate recorded in the MV's spec. History: bootstrap two
    thirds (v0), append the rest (v1), then a MERGE that moves rows
    ACROSS the view boundary in BOTH directions (even k <= u gain
    $10k, odd lose $10k — pre/post images filter independently, so a
    crossing nets to a pure view insert or delete), then a CoW DELETE
    of k in (u, 2u] whose rows include view minima (the endangered
    MIN recompute must read the FILTERED source). One incremental
    refresh per wave. The hashed output is the MV's OWN STORED STATE
    — not a recompute — so the oracle match proves the partial-view
    fold converged to DuckDB's filtered aggregate exactly."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.mv import refresh_mv
    from .round11 import _densified_orders

    o = _densified_orders(spark, sf_dir)
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    src = VersionedTable(tempfile.mkdtemp(prefix="lake_mvf_src_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_mvf_"))
    kw = dict(
        name="hi_value", group_cols=["status"], sum_cols=["cents"],
        key="k", min_cols=["cents"], source_where="cents >= 2000000",
    )
    try:
        src.commit(
            o.filter(F.col("k") <= 2 * third).select(
                "k", "status", "cents"
            ),
            mode="overwrite",
        )                                                   # v0
        refresh_mv(src, mv, spark, **kw)
        src.commit(
            o.filter(F.col("k") > 2 * third).select(
                "k", "status", "cents"
            ),
            mode="append",
        )                                                   # v1
        refresh_mv(src, mv, spark, **kw)
        merge_into(
            src, spark,
            o.filter(F.col("k") <= u).select(
                "k", "status",
                F.when(
                    F.col("k") % 2 == 0, F.col("cents") + 1_000_000
                ).otherwise(F.col("cents") - 1_000_000).alias("cents"),
            ),
            key="k",
        )                                                   # v2: cross
        refresh_mv(src, mv, spark, **kw)
        src.delete_where(
            spark, F.col("k").between(u + 1, 2 * u), prune_where="auto"
        )                                                   # v3
        refresh_mv(src, mv, spark, **kw)
        out = mv.read(spark).select(
            "status",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("cents").cast("bigint").alias("sum_cents"),
            F.col("cents_min").cast("bigint").alias("min_cents"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out


@register(
    "lake_mv_filtered_rewrite",
    oracle="""
    WITH base AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_custkey AS ck,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    p AS (SELECT COUNT(*) // 10 AS u FROM base),
    lf AS (
      SELECT k, ck, cents FROM base, p
      WHERE NOT (k > p.u AND k <= 2 * p.u)
    ),
    segs AS (
      SELECT c_custkey AS ck,
             CASE WHEN c_custkey % 5 = 0 THEN 'MACHINERY'
                  WHEN c_custkey % 7 = 0 THEN 'MV'
                  ELSE c_mktsegment END AS seg
      FROM customer
    ),
    j AS (SELECT s.seg, l.cents FROM lf l JOIN segs s ON l.ck = s.ck)
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM j
    WHERE cents >= 15000000 AND seg <> 'MACHINERY'
          AND seg <> 'BUILDING'
    GROUP BY seg
    """,
)
def lake_mv_filtered_rewrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FILTERED JOIN MV + WHERE-subsumed rewrite (operators/mv.py::
    refresh_join_mv source_where + rewrite_with_mv where, both r16).

    The view: (orders |><| customer-segments) restricted to the JOINED
    predicate ``cents >= 15000000 AND seg <> 'MACHINERY'`` — one
    conjunct per side, so Catalyst pushes each below the join.
    History: bootstrap 2/3 of the left (v0), append the rest (left
    delta filters its joined rows), MERGE customers ck%5==0 into the
    EXCLUDED segment 'MACHINERY' and ck%7==0 into 'MV' (a right-side
    regroup whose -old/+new joined rows cross the view's seg conjunct
    — leavers fold out, stayers regroup), then CoW-DELETE left k in
    (u, 2u]. One incremental refresh per wave.

    The RETURNED frame is rewrite_with_mv's answer — no spec
    re-statement (the recorded _mv_spec.json serves grouping, measures
    AND the view predicate), the query WHERE carrying the view's two
    conjuncts plus a residual GROUP-COLUMN conjunct
    (``seg <> 'BUILDING'``) that applies to MV rows; an in-query
    inputFiles() pin proves the plan reads ONLY the MV, never either
    join side. Hash-matching DuckDB's filtered join-aggregate proves
    the subsumption check, the residual filter, and the filtered
    delta-join folds all compose exactly."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.curation import dense_sequence
    from ..operators.mv import refresh_join_mv, rewrite_with_mv

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    o = dense_sequence(o, "o_orderkey", out_col="k").select(
        "k", "ck", "cents"
    )
    n = o.count()
    third, u = n // 3, n // 10
    o = o.localCheckpoint(eager=True)
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_mktsegment").alias("seg"),
    ).localCheckpoint(eager=True)
    a = VersionedTable(tempfile.mkdtemp(prefix="lake_fjr_a_"))
    b = VersionedTable(tempfile.mkdtemp(prefix="lake_fjr_b_"))
    mv = VersionedTable(tempfile.mkdtemp(prefix="lake_fjr_"))
    kw = dict(
        name="fjr", on=["ck"], group_cols=["seg"],
        sum_cols=["cents"], key_a="k", key_b="ck",
        source_where="cents >= 15000000 AND seg <> 'MACHINERY'",
    )
    try:
        a.commit(o.filter(F.col("k") <= 2 * third), mode="overwrite")
        b.commit(c, mode="overwrite")
        refresh_join_mv(a, b, mv, spark, **kw)      # filtered bootstrap
        a.commit(o.filter(F.col("k") > 2 * third), mode="append")
        refresh_join_mv(a, b, mv, spark, **kw)      # left delta
        merge_into(
            b, spark,
            c.filter(
                (F.col("ck") % 5 == 0) | (F.col("ck") % 7 == 0)
            ).withColumn(
                "seg",
                F.when(F.col("ck") % 5 == 0, F.lit("MACHINERY"))
                .otherwise(F.lit("MV")),
            ),
            key="ck",
        )
        refresh_join_mv(a, b, mv, spark, **kw)      # regroup + leavers
        a.delete_where(
            spark, F.col("k").between(u + 1, 2 * u), prune_where="auto"
        )
        refresh_join_mv(a, b, mv, spark, **kw)      # left delete
        ans = rewrite_with_mv(
            mv, spark, group_cols=["seg"],
            measures={
                "n_rows": ("count",),
                "sum_cents": ("sum", "cents"),
            },
            where=(
                "cents >= 15000000 AND seg <> 'MACHINERY' "
                "AND seg <> 'BUILDING'"
            ),
        )
        if ans is None:
            raise AssertionError("subsumed filtered rewrite fell back")
        files = ans.inputFiles()
        if not files or not all(mv.path in f for f in files):
            raise AssertionError(
                f"rewrite plan does not read only the MV: {files[:3]}"
            )
        out = ans.select(
            "seg",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("sum_cents").cast("bigint").alias("sum_cents"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(a.path, ignore_errors=True)
        shutil.rmtree(b.path, ignore_errors=True)
        shutil.rmtree(mv.path, ignore_errors=True)
    return out


@register(
    "lake_mv_cascade",
    oracle="""
    WITH numbered AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS k,
             o_custkey AS ck,
             o_orderpriority AS prio,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    base AS (
      SELECT k, ck, prio, cents,
             CAST((cents % 199) - 99 AS DOUBLE) / 100.0 AS frac
      FROM numbered
    ),
    final AS (
      SELECT k, ck,
             CASE WHEN k % 13 = 0 THEN '1-URGENT' ELSE prio END AS prio,
             cents, frac
      FROM base
      WHERE frac > -0.90
    )
    SELECT prio,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           MIN(frac) AS frac_min,
           MAX(frac) AS frac_max,
           ROUND(SUM(frac * frac), 4) AS frac_sumsq
    FROM final
    GROUP BY prio
    ORDER BY prio
    """,
)
def lake_mv_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascaded rollup MVs (operators/mv.py::refresh_rollup_mv, r16):
    base orders -> FINE MV by (prio, month) -> COARSE MV by (prio),
    the coarse level maintained O(delta) from the fine MV's OWN CDF —
    never reading the base — and everything at the coarse level
    derived from the fine MV's recorded spec (the caller names only
    the coarser grouping).

    History: bootstrap the base with the first 2/3 of densified orders
    and refresh the LADDER (fine bootstraps from base, coarse
    bootstraps from fine); append the last third (each level folds its
    own delta); CoW-DELETE frac <= -0.90 (endangers fine AND coarse
    minima — the coarse recompute is group-pruned against the FINE MV,
    already aggregate-sized); MERGE every k%13==0 row into prio
    '1-URGENT' (a base regroup that cascades: fine folds -old/+new
    across (prio, month) groups, coarse folds the fine CDF across prio
    groups). One refresh per level per wave.

    The hashed output is the COARSE MV'S OWN STORED STATE — weighted
    row counts (sums of fine counts = base counts), sums of sums,
    endangered-recomputed extremes, and double sumsq — vs DuckDB's
    direct aggregate of the final base state. In-query pins: (1) the
    coarse percentile histograms (pure signed MAP MERGE of fine maps,
    mixed-sign fractional domain) estimate p50/p90 within the declared
    1% of exact rank values; (2) the coarse HLL sketches (union of
    fine unions) estimate distinct custkeys within sketch error; (3)
    rewrite_with_mv over the ROLLUP's recorded spec (kind "rollup"
    serves the rewrite unchanged) answers the GLOBAL grouping from
    coarse-MV-sized input with an inputFiles() proof it reads neither
    the base nor the fine MV."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..io.versioned import VersionedTable, merge_into
    from ..operators.curation import dense_sequence
    from ..operators.mv import (
        hist_percentile,
        refresh_mv,
        refresh_rollup_mv,
        rewrite_with_mv,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.col("o_orderpriority").alias("prio"),
        F.month("o_orderdate").alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    o = dense_sequence(o, "o_orderkey", out_col="k").select(
        "k", "ck", "prio", "m", "cents",
        (((F.col("cents") % 199) - 99).cast("double") / F.lit(100.0))
        .alias("frac"),
    )
    n = o.count()
    third = n // 3
    o = o.localCheckpoint(eager=True)
    base = VersionedTable(tempfile.mkdtemp(prefix="lake_casc_base_"))
    fine = VersionedTable(tempfile.mkdtemp(prefix="lake_casc_fine_"))
    coarse = VersionedTable(tempfile.mkdtemp(prefix="lake_casc_top_"))
    fine_kw = dict(
        name="casc_fine", group_cols=["prio", "m"],
        sum_cols=["cents"], key="k",
        min_cols=["frac"], max_cols=["frac"], sumsq_cols=["frac"],
        approx_distinct_cols=["ck"], percentile_cols=["frac"],
    )

    def refresh_ladder():
        refresh_mv(base, fine, spark, **fine_kw)
        refresh_rollup_mv(
            fine, coarse, spark, name="casc_top", group_cols=["prio"]
        )

    try:
        base.commit(o.filter(F.col("k") <= 2 * third), mode="overwrite")
        refresh_ladder()                                  # bootstrap
        base.commit(o.filter(F.col("k") > 2 * third), mode="append")
        refresh_ladder()                                  # append fold
        base.delete_where(
            spark, F.col("frac") <= -0.90, prune_where="auto"
        )
        refresh_ladder()                                  # extreme delete
        upd = (
            base.read(spark)
            .filter(F.col("k") % 13 == 0)
            .withColumn("prio", F.lit("1-URGENT"))
        )
        merge_into(base, spark, upd, key="k")
        refresh_ladder()                                  # regroup wave
        # exact targets from the FINAL base state (rank percentiles
        # per prio and globally, exact distinct ck counts)
        fb = base.read(spark)
        w = Window.partitionBy("prio").orderBy("frac")
        ranked = (
            fb.withColumn("rn", F.row_number().over(w))
            .withColumn(
                "cnt", F.count("*").over(Window.partitionBy("prio"))
            )
        )

        def at_rank(q):
            return F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.lit(q) * F.col("cnt")).cast("bigint"),
                    F.col("frac"),
                )
            )

        exact = {
            r["prio"]: r.asDict()
            for r in ranked.groupBy("prio")
            .agg(
                at_rank(0.5).alias("p50"),
                at_rank(0.9).alias("p90"),
                F.count_distinct("ck").alias("nd"),
            )
            .collect()
        }
        got = {
            r["prio"]: r.asDict()
            for r in coarse.read(spark)
            .withColumn("__p50", hist_percentile("frac_hist", 0.5))
            .withColumn("__p90", hist_percentile("frac_hist", 0.9))
            .withColumn("__nd", F.hll_sketch_estimate("ck_hll"))
            .collect()
        }
        if set(got) != set(exact):
            raise AssertionError(
                f"coarse groups {sorted(got)} != {sorted(exact)}"
            )

        def pin(got_v, want, where, tol):
            ok = (
                got_v == 0.0
                if want == 0
                else got_v is not None
                and abs(got_v / want - 1) <= tol
            )
            if not ok:
                raise AssertionError(
                    f"{where}: estimate {got_v} vs exact {want}"
                )

        for p, e in exact.items():
            pin(got[p]["__p50"], e["p50"], f"p50[{p}]", 0.0101)
            pin(got[p]["__p90"], e["p90"], f"p90[{p}]", 0.0101)
            pin(float(got[p]["__nd"]), e["nd"], f"nd[{p}]", 0.15)
        # GLOBAL grouping served by the rewrite over the ROLLUP's
        # recorded spec — group_cols=[] re-merges every coarse row;
        # the plan must read only the coarse MV
        ans = rewrite_with_mv(
            coarse, spark,
            group_cols=[],
            measures={
                "n_rows": ("count",),
                "g_p50": ("percentile", "frac", 0.5),
                "g_nd": ("approx_count_distinct", "ck"),
            },
        )
        if ans is None:
            raise AssertionError("rollup rewrite fell back")
        files = ans.inputFiles()
        if not files or not all(coarse.path in f for f in files):
            raise AssertionError(
                f"rewrite reads beyond the coarse MV: {files[:3]}"
            )
        g = ans.collect()[0]
        gw = Window.orderBy("frac")
        grk = (
            fb.withColumn("rn", F.row_number().over(gw))
            .withColumn("cnt", F.count("*").over(Window.partitionBy()))
        )
        ge = grk.groupBy().agg(
            at_rank(0.5).alias("p50"),
            F.count_distinct("ck").alias("nd"),
            F.count("*").alias("n"),
        ).collect()[0]
        if g["n_rows"] != ge["n"]:
            raise AssertionError(
                f"global count {g['n_rows']} != {ge['n']}"
            )
        pin(g["g_p50"], ge["p50"], "global p50", 0.0101)
        pin(float(g["g_nd"]), ge["nd"], "global nd", 0.15)
        # MV SELECTION over the ladder as a catalog: a prio-grouped
        # query subsumes BOTH levels; answer_from_mvs must pick the
        # COARSE one (fewer stored rows, decided from manifest
        # metadata) and its plan must read only that MV
        from ..operators.mv import answer_from_mvs

        sel = answer_from_mvs(
            [fine, coarse], spark,
            group_cols=["prio"],
            measures={"sel_rows": ("count",)},
        )
        if sel is None:
            raise AssertionError("catalog selection fell back")
        sel_df, chosen = sel
        if chosen.path != coarse.path:
            raise AssertionError(
                f"catalog picked {chosen.path}, not the coarse level"
            )
        sfiles = sel_df.inputFiles()
        if not sfiles or not all(coarse.path in f for f in sfiles):
            raise AssertionError("selection plan reads beyond coarse")
        sel_rows = {
            r["prio"]: r["sel_rows"] for r in sel_df.collect()
        }
        for p, e in exact.items():
            if sel_rows.get(p) != got[p]["n_rows"]:
                raise AssertionError(
                    f"selection count drifted for {p}: "
                    f"{sel_rows.get(p)} vs {got[p]['n_rows']}"
                )
        out = (
            coarse.read(spark)
            .select(
                "prio",
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("cents").cast("bigint").alias("sum_cents"),
                F.col("frac_min").alias("frac_min"),
                F.col("frac_max").alias("frac_max"),
                F.round(F.col("frac_sumsq"), 4).alias("frac_sumsq"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base.path, ignore_errors=True)
        shutil.rmtree(fine.path, ignore_errors=True)
        shutil.rmtree(coarse.path, ignore_errors=True)
    return out


@register(
    "lake_mv_rollup_filtered",
    oracle="""
    WITH numbered AS (
      SELECT ROW_NUMBER() OVER (ORDER BY doc_id) AS k,
             lang, source, n_chars
      FROM documents
    ),
    final AS (SELECT * FROM numbered WHERE k % 5 <> 0),
    fine AS (
      SELECT lang, source,
             COUNT(*) AS n, SUM(n_chars) AS s
      FROM final GROUP BY lang, source
    )
    SELECT lang,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(s) AS BIGINT) AS sum_chars
    FROM fine
    WHERE n >= 4
    GROUP BY lang
    ORDER BY lang
    """,
)
def lake_mv_rollup_filtered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FILTERED rollup (refresh_rollup_mv source_where, r16): the
    coarse per-language view aggregates only fine (lang, source)
    groups holding at least 4 documents — a predicate over the FINE
    MV's MEASURE column, so a fine group's count crossing the
    threshold nets to a pure coarse insert/delete (the partial-view
    identity applied one level up).

    History: bootstrap the base with the first 2/3 of densified
    documents and refresh the ladder; append the last third (fine
    groups cross the threshold UPWARD); CoW-DELETE every k%5==0 row
    (counts fall, groups cross DOWNWARD). One refresh per level per
    wave. The hashed output is the coarse MV's OWN stored state vs
    DuckDB's two-level filtered aggregate of the final base. In-query
    pins: the recorded spec carries the predicate, and a refresh
    re-stated with a DIFFERENT predicate raises (spec drift) instead
    of mixing universes."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable
    from ..operators.curation import dense_sequence
    from ..operators.mv import (
        load_mv_spec,
        refresh_mv,
        refresh_rollup_mv,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    d = dense_sequence(d, "doc_id", out_col="k").select(
        "k", "lang", "source", "n_chars"
    )
    n = d.count()
    third = n // 3
    d = d.localCheckpoint(eager=True)
    base = VersionedTable(tempfile.mkdtemp(prefix="lake_rf_base_"))
    fine = VersionedTable(tempfile.mkdtemp(prefix="lake_rf_fine_"))
    coarse = VersionedTable(tempfile.mkdtemp(prefix="lake_rf_top_"))
    fine_kw = dict(
        name="rf_fine", group_cols=["lang", "source"],
        sum_cols=["n_chars"], key="k",
    )

    def refresh_ladder():
        refresh_mv(base, fine, spark, **fine_kw)
        refresh_rollup_mv(
            fine, coarse, spark, name="rf_top", group_cols=["lang"],
            source_where="n_rows >= 4",
        )

    try:
        base.commit(d.filter(F.col("k") <= 2 * third), mode="overwrite")
        refresh_ladder()                                # bootstrap
        base.commit(d.filter(F.col("k") > 2 * third), mode="append")
        refresh_ladder()                                # upward crossings
        base.delete_where(
            spark, F.col("k") % 5 == 0, prune_where="auto"
        )
        refresh_ladder()                                # downward crossings
        if load_mv_spec(coarse)["source_where"] != "n_rows >= 4":
            raise AssertionError("predicate not recorded in the spec")
        try:
            refresh_rollup_mv(
                fine, coarse, spark, name="rf_top",
                group_cols=["lang"], source_where="n_rows >= 9",
            )
        except ValueError as e:
            if "spec mismatch" not in str(e):
                raise
        else:
            raise AssertionError(
                "predicate change did not raise spec drift"
            )
        out = (
            coarse.read(spark)
            .select(
                "lang",
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("n_chars").cast("bigint").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base.path, ignore_errors=True)
        shutil.rmtree(fine.path, ignore_errors=True)
        shutil.rmtree(coarse.path, ignore_errors=True)
    return out
