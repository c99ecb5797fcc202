"""Statistical analytics, drift detection, and corpus-health diagnostics.

The reference (elijah688/file-stream-import) ingests bulk CSV into Postgres
(internal/writer/writer.go); these are the monitoring/QA queries a team runs
*on* that ingested data: trend analysis, distribution drift, outlier fences,
correlation screens, and the corpus-statistics battery (entropy, KL
divergence, duplicate-n-gram coverage) a training-data pipeline tracks per
ingest batch. All are declarative single-lineage DataFrame plans with DuckDB
oracles.

Engine-stability rules (same battery as queries/mlprep.py):

* integer grids first — every double input is floor-quantized onto an exact
  integer grid (cents, dollars, 1e-2 rates) so SUM/COUNT aggregates are
  exact integer arithmetic, immune to reduction order;
* closed forms over sums — slope/corr/t-stat/chi-square are computed from
  those exact sums with an explicitly-written sequence of IEEE double ops
  (cast, multiply, subtract, divide, sqrt — sqrt is correctly rounded in
  IEEE 754, so it is cross-engine deterministic), written with the SAME
  shape in the Spark plan and the oracle SQL;
* ln() is floor-quantized to a 1e-9 BIGINT grid before any sum (JVM vs
  libm differ in the last ulp);
* final ratios floor-quantized to a 1e-6 (or 1e-4) grid with a ``+ 0.0``
  guard against -0.0 vs 0.0 hash mismatches.

Scale notes are per-query: sums that stay BIGINT-safe at sf0.1 but would
overflow at sf100 carry an explicit "center first / widen to DECIMAL"
upgrade note in the docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import load_table
from . import register


def _q(col: Column, grid: float) -> Column:
    """Floor-quantize a double onto a 1/grid grid, with the -0.0 guard."""
    return F.floor(col * F.lit(grid) + F.lit(0.5)) / F.lit(grid) + F.lit(0.0)


@register(
    "yoy_monthly_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(month(o_orderdate) AS BIGINT) AS o_month,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                  AS DOUBLE) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT m.o_year, m.o_month, m.revenue,
           p.revenue AS prev_revenue,
           FLOOR((m.revenue / p.revenue - 1.0) * 1e4 + 0.5) / 1e4 + 0.0
             AS yoy_pct
    FROM m LEFT JOIN m p
      ON p.o_year = m.o_year - 1 AND p.o_month = m.o_month
    """,
)
def yoy_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-same-month-last-year revenue growth — the standard
    trend query over the reference's ingested orders.

    Monthly revenue sums go through DECIMAL(18,6) (reduction-order-exact,
    see queries/__init__.py) and are rounded once; the YoY ratio is then
    one identical IEEE division on identical doubles. The monthly rollup
    is one shuffle on ~#months keys; the year-back comparison is a self
    join of that tiny aggregate (months × 1 row), which AQE broadcasts —
    the fact table is scanned once regardless of history length.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    m = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("revenue")
    )
    prev = m.select(
        (F.col("o_year") + 1).alias("o_year"),
        "o_month",
        F.col("revenue").alias("prev_revenue"),
    )
    return m.join(prev, ["o_year", "o_month"], "left").withColumn(
        "yoy_pct", _q(F.col("revenue") / F.col("prev_revenue") - F.lit(1.0), 1e4)
    )


@register(
    "regr_price_size",
    oracle="""
    WITH g AS (
      SELECT p_brand,
             CAST(p_size AS BIGINT) AS xi,
             CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS yi
      FROM part
    ), s AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(xi) AS sx, SUM(yi) AS sy,
             SUM(xi * yi) AS sxy, SUM(xi * xi) AS sxx
      FROM g GROUP BY p_brand
    )
    SELECT p_brand, n AS n_parts,
      FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6
        + 0.0 AS slope,
      FLOOR((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
             - CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE)
               * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0
            * 1e6 + 0.5) / 1e6 + 0.0 AS intercept
    FROM s
    """,
)
def regr_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS regression of retail price on size — closed-form
    slope/intercept from exact integer sums (prices on the cent grid,
    sizes already integral), so the per-group aggregation is pure BIGINT
    arithmetic and only the final slope/intercept divisions touch IEEE
    doubles (written with the identical op sequence in the oracle).

    One map-side-combinable groupBy on p_brand; no second pass (the
    intercept uses mean_y - slope * mean_x rather than a re-scan). At
    sf100 the raw-moment products would near int64 range — the standard
    upgrade is centering xi/yi by per-group means first (two-pass) or
    widening the sums to DECIMAL(38,0); noted, not needed at test SF.
    """
    g = load_table(spark, sf_dir, "part").select(
        "p_brand",
        F.col("p_size").cast("bigint").alias("xi"),
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).alias("yi"),
    )
    s = g.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xi").alias("sx"),
        F.sum("yi").alias("sy"),
        F.sum(F.col("xi") * F.col("yi")).alias("sxy"),
        F.sum(F.col("xi") * F.col("xi")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ["n", "sx", "sy", "sxy", "sxx"])
    slope = (n * sxy - sx * sy).cast("double") / (n * sxx - sx * sx).cast("double")
    intercept = (
        sy.cast("double") / n.cast("double")
        - slope * (sx.cast("double") / n.cast("double"))
    )
    return s.select(
        "p_brand",
        n.alias("n_parts"),
        _q(slope / F.lit(100.0), 1e6).alias("slope"),
        _q(intercept / F.lit(100.0), 1e6).alias("intercept"),
    )


_CORR_VARS = [
    ("quantity", "q"),
    ("price", "p"),
    ("discount", "d"),
    ("tax", "t"),
]
_CORR_PAIRS = [
    ("quantity", "price"),
    ("quantity", "discount"),
    ("quantity", "tax"),
    ("price", "discount"),
    ("price", "tax"),
    ("discount", "tax"),
]


def _corr_oracle() -> str:
    sums = ", ".join(
        f"SUM({a} * {b}) AS s_{a}{b}"
        for i, (_, a) in enumerate(_CORR_VARS)
        for (_, b) in _CORR_VARS[i:]
    )
    branches = "\n    UNION ALL\n".join(
        f"""    SELECT '{x}' AS var_x, '{y}' AS var_y, n,
      FLOOR(
        (CAST(n AS DOUBLE) * CAST(s_{a}{b} AS DOUBLE)
           - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
        / sqrt(
            (CAST(n AS DOUBLE) * CAST(s_{a}{a} AS DOUBLE)
               - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(s_{b}{b} AS DOUBLE)
               - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))
        * 1e6 + 0.5) / 1e6 + 0.0 AS corr_q
    FROM s"""
        for (x, y) in _CORR_PAIRS
        for (a, b) in [
            (dict(_CORR_VARS)[x], dict(_CORR_VARS)[y])
        ]
    )
    return f"""
    WITH g AS (
      SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q,
             CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS p,
             CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS d,
             CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT) AS t
      FROM lineitem
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(q) AS s_q, SUM(p) AS s_p, SUM(d) AS s_d, SUM(t) AS s_t,
             {sums}
      FROM g
    )
{branches}
    """


@register("corr_matrix_lineitem", oracle=_corr_oracle())
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation screen over the four lineitem
    measures — the one-pass feature-correlation matrix an ML pipeline
    runs before model training.

    Inputs are quantized onto integer grids (quantity and dollar-grid
    price, cent-grid discount/tax rates), so ALL 14 moments accumulate as
    exact BIGINTs in a single map-side-combinable aggregate — one scan,
    one 1-row shuffle, no per-pair passes (pyspark.sql.functions.corr
    would re-scan per pair and its double sums are reduction-order
    sensitive besides). The closed-form correlation then runs on doubles
    with an explicitly-written op sequence; sqrt is correctly rounded in
    IEEE 754, so both engines agree bit-for-bit. The 6 output rows unfold
    from the single aggregate row via explode — no extra jobs. The raw
    BIGINT second moments stay exact (< 2^53) through sf1; beyond that,
    center on per-column means first (the standard two-pass upgrade).
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = li.select(
        F.floor(F.col("l_quantity") + F.lit(0.5)).alias("q"),
        F.floor(F.col("l_extendedprice") + F.lit(0.5)).alias("p"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).alias("d"),
        F.floor(F.col("l_tax") * 100 + F.lit(0.5)).alias("t"),
    )
    aggs = [F.count("*").cast("bigint").alias("n")]
    aggs += [F.sum(c).alias(f"s_{c}") for _, c in _CORR_VARS]
    aggs += [
        F.sum(F.col(a) * F.col(b)).alias(f"s_{a}{b}")
        for i, (_, a) in enumerate(_CORR_VARS)
        for (_, b) in _CORR_VARS[i:]
    ]
    s = g.agg(*aggs)
    short = dict(_CORR_VARS)
    n = F.col("n").cast("double")

    def corr(x: str, y: str) -> Column:
        a, b = short[x], short[y]
        cov = n * F.col(f"s_{a}{b}").cast("double") - F.col(f"s_{a}").cast(
            "double"
        ) * F.col(f"s_{b}").cast("double")
        vx = n * F.col(f"s_{a}{a}").cast("double") - F.col(f"s_{a}").cast(
            "double"
        ) * F.col(f"s_{a}").cast("double")
        vy = n * F.col(f"s_{b}{b}").cast("double") - F.col(f"s_{b}").cast(
            "double"
        ) * F.col(f"s_{b}").cast("double")
        return _q(cov / F.sqrt(vx * vy), 1e6)

    pairs = F.array(
        *[
            F.struct(
                F.lit(x).alias("var_x"),
                F.lit(y).alias("var_y"),
                corr(x, y).alias("corr_q"),
            )
            for (x, y) in _CORR_PAIRS
        ]
    )
    return s.select(F.col("n"), F.explode(pairs).alias("r")).select(
        "r.var_x", "r.var_y", "n", "r.corr_q"
    )


@register(
    "source_token_divergence",
    oracle=r"""
    WITH st AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_s
      FROM (
        SELECT source, UNNEST(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents
      ) GROUP BY source, tok
    ), tot_s AS (
      SELECT source, CAST(SUM(c_s) AS BIGINT) AS n_s FROM st GROUP BY source
    ), ct AS (
      SELECT tok, CAST(SUM(c_s) AS BIGINT) AS c_c FROM st GROUP BY tok
    ), tot_c AS (
      SELECT CAST(SUM(c_s) AS BIGINT) AS n_c FROM st
    )
    SELECT st.source,
      MAX(n_s) AS n_tokens,
      CAST(COUNT(*) AS BIGINT) AS vocab,
      FLOOR(CAST(CAST(FLOOR(ln(CAST(MAX(n_s) AS DOUBLE)) * 1e9 + 0.5)
                      AS BIGINT) * MAX(n_s)
                 - SUM(c_s * CAST(FLOOR(ln(CAST(c_s AS DOUBLE)) * 1e9 + 0.5)
                                  AS BIGINT)) AS DOUBLE)
            / CAST(MAX(n_s) AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 + 0.0
        AS entropy,
      FLOOR(CAST(SUM(c_s * CAST(FLOOR(ln(
                CAST(c_s * n_c AS DOUBLE) / CAST(c_c * n_s AS DOUBLE)
              ) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
            / CAST(MAX(n_s) AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 + 0.0
        AS kl_vs_corpus
    FROM st
    JOIN tot_s USING (source)
    JOIN ct USING (tok)
    CROSS JOIN tot_c
    GROUP BY st.source
    """,
)
def source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus-health battery: token count, vocabulary size,
    Shannon entropy of the token distribution, and KL(source ‖ corpus) —
    the drift signal a training pipeline tracks per ingest source (a
    source whose KL jumps is suddenly unlike the rest of the corpus).

    Everything reduces to one (source, tok) count table, which is
    materialized once with localCheckpoint (the operators/dedup.py
    lineage-cut pattern) so the corpus is scanned and tokenized exactly
    ONCE — per-source totals, per-token corpus counts, and the grand
    total are then vocabulary-bounded re-aggregations of the
    checkpointed table, not corpus re-scans (without the cut, Spark
    recomputes the whole tokenize+count lineage for each of the four
    consumers; `tests/test_plans.py` pins the single-scan shape). Both
    entropy and KL become exact-integer sums of c · ln_q(ratio) on the
    1e-9 log grid — H = (ln_q(N_s)·N_s − Σ c·ln_q(c)) / N_s / 1e9 — so
    reduction order cannot shift the result, and the single final
    division is identical IEEE. The token join shuffles on the
    vocabulary-bounded tok key; source totals and the grand total are
    tiny broadcasts.
    """
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    st = (
        d.select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c_s"))
        .localCheckpoint(eager=True)
    )
    tot_s = st.groupBy("source").agg(F.sum("c_s").cast("bigint").alias("n_s"))
    ct = st.groupBy("tok").agg(F.sum("c_s").cast("bigint").alias("c_c"))
    tot_c = st.agg(F.sum("c_s").cast("bigint").alias("n_c"))

    def lnq(x: Column) -> Column:
        return F.floor(F.log(x) * F.lit(1e9) + F.lit(0.5)).cast("bigint")

    j = (
        st.join(F.broadcast(tot_s), "source")
        .join(ct, "tok")
        .crossJoin(F.broadcast(tot_c))
    )
    kl_ratio = (F.col("c_s") * F.col("n_c")).cast("double") / (
        F.col("c_c") * F.col("n_s")
    ).cast("double")
    agg = j.groupBy("source").agg(
        F.max("n_s").alias("n_tokens"),
        F.count("*").cast("bigint").alias("vocab"),
        (
            (
                lnq(F.max("n_s").cast("double")) * F.max("n_s")
                - F.sum(F.col("c_s") * lnq(F.col("c_s").cast("double")))
            ).cast("double")
            / F.max("n_s").cast("double")
            / F.lit(1e9)
        ).alias("_h"),
        (
            F.sum(F.col("c_s") * lnq(kl_ratio)).cast("double")
            / F.max("n_s").cast("double")
            / F.lit(1e9)
        ).alias("_kl"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "vocab",
        _q(F.col("_h"), 1e6).alias("entropy"),
        _q(F.col("_kl"), 1e6).alias("kl_vs_corpus"),
    )


@register(
    "iqr_outlier_fences",
    oracle="""
    WITH qs AS (
      SELECT l_returnflag,
             FLOOR(CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE)
                   * 1e4 + 0.5) / 1e4 + 0.0 AS q1,
             FLOOR(CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE)
                   * 1e4 + 0.5) / 1e4 + 0.0 AS q3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT li.l_returnflag, MAX(q1) AS q1, MAX(q3) AS q3,
      MAX(q1 - 1.5 * (q3 - q1)) AS lo_fence,
      MAX(q3 + 1.5 * (q3 - q1)) AS hi_fence,
      CAST(SUM(CASE WHEN l_extendedprice < q1 - 1.5 * (q3 - q1)
                      OR l_extendedprice > q3 + 1.5 * (q3 - q1)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem li JOIN qs USING (l_returnflag)
    GROUP BY li.l_returnflag
    """,
)
def iqr_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier detection per group: exact q1/q3, the
    1.5×IQR fences, and how many rows fall outside — the standard
    per-batch data-quality gate.

    Two aggregates over one keyed shuffle shape: the quantile pass
    produces 3 rows, which broadcast back onto the fact scan for the
    fence comparison — the fact table is scanned twice but never
    re-shuffled. The quantiles are rounded to 4dp on both engines BEFORE
    the fence arithmetic, so the fences are bit-identical and the
    outlier comparison can't flip on an engine ulp. Exact quantiles need
    the full per-group multiset (3 groups here); at high group
    cardinality swap in approx_percentile (mergeable t-digest).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    qs = li.groupBy("l_returnflag").agg(
        _q(F.percentile("l_extendedprice", F.lit(0.25)), 1e4).alias("q1"),
        _q(F.percentile("l_extendedprice", F.lit(0.75)), 1e4).alias("q3"),
    )
    lo = F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))
    out = (F.col("l_extendedprice") < lo) | (F.col("l_extendedprice") > hi)
    return (
        li.join(F.broadcast(qs), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.max("q1").alias("q1"),
            F.max("q3").alias("q3"),
            F.max(lo).alias("lo_fence"),
            F.max(hi).alias("hi_fence"),
            F.sum(F.when(out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
    )


@register(
    "join_skew_diagnostics",
    oracle="""
    WITH kc AS (
      SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
      CAST(COUNT(*) AS BIGINT) AS n_keys,
      CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
      FLOOR(CAST(quantile_cont(cnt, 0.50) AS DOUBLE) * 1e4 + 0.5)
        / 1e4 + 0.0 AS p50_key_rows,
      FLOOR(CAST(quantile_cont(cnt, 0.99) AS DOUBLE) * 1e4 + 0.5)
        / 1e4 + 0.0 AS p99_key_rows,
      FLOOR(CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5)
        / 1e4 + 0.0 AS avg_key_rows,
      FLOOR(CAST(MAX(cnt) AS DOUBLE)
            / (CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
            * 1e4 + 0.5) / 1e4 + 0.0 AS skew_ratio
    FROM kc
    """,
)
def join_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile for a join column (l_suppkey): key count,
    max/median/p99 rows-per-key, and the max/mean skew ratio — the
    number that predicts whether a straggler partition will dominate a
    shuffle at 100 TB (ratio ≫ 1 → salt the key or rely on AQE skew
    splitting; `join_salted_skew` is this repo's mitigation operator).

    One map-side-combinable count per key, then a second aggregate over
    the key-bounded count table — the fact table never shuffles whole
    rows, only (key, partial-count) pairs. The ratio arithmetic divides
    exact BIGINTs in an identical IEEE op sequence on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    kc = li.groupBy("l_suppkey").agg(F.count("*").alias("cnt"))
    total, keys, mx = (
        F.sum("cnt").cast("bigint"),
        F.count("*").cast("bigint"),
        F.max("cnt").cast("bigint"),
    )
    avg = total.cast("double") / keys.cast("double")
    return kc.agg(
        total.alias("n_rows"),
        keys.alias("n_keys"),
        mx.alias("max_key_rows"),
        _q(F.percentile("cnt", F.lit(0.50)), 1e4).alias("p50_key_rows"),
        _q(F.percentile("cnt", F.lit(0.99)), 1e4).alias("p99_key_rows"),
        _q(avg, 1e4).alias("avg_key_rows"),
        _q(mx.cast("double") / avg, 1e4).alias("skew_ratio"),
    )


@register(
    "dup_ngram_coverage",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS sh
      FROM w, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)
      WHERE len(ws) >= 5
    ), c AS (
      SELECT sh, CAST(COUNT(*) AS BIGINT) AS ndocs FROM sh GROUP BY sh
    )
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_shingles,
      CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      FLOOR(CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 + 0.0 AS dup_frac
    FROM sh JOIN c USING (sh)
    GROUP BY doc_id
    """,
)
def dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate 5-gram coverage: per document, the
    fraction of its distinct 5-token shingles that also appear in at
    least one other document — the Gopher/RefinedWeb-style "how much of
    this doc is boilerplate shared with the corpus" signal
    (`text_repetition` measures WITHIN-doc repetition; this measures
    BETWEEN-doc repetition).

    Shingles are distinct per doc before counting, so a hot boilerplate
    line contributes one row per containing doc, not per occurrence —
    the same document-frequency bound that keeps `dedup_ngram_jaccard`
    scale-safe. Plan: one (doc, shingle) distinct, a shingle-keyed
    re-aggregation of that table, a join back on the shingle key, and
    the per-doc rollup — every shuffle is on shingle or doc_id, nothing
    quadratic. Docs under 5 tokens have no shingles and are excluded by
    construction (the size filter also dodges Spark's descending
    sequence(1, n<1) footgun).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("ws"))
    sh = (
        w.filter(F.size("ws") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 5),"
                    " i -> array_join(slice(ws, i + 1, 5), ' '))"
                )
            ).alias("sh"),
        )
        .distinct()
        # distinct (doc, shingle) set feeds the count aggregate AND the
        # join probe — cut lineage so tokenize+distinct runs once
        .localCheckpoint(eager=True)
    )
    c = sh.groupBy("sh").agg(F.count("*").cast("bigint").alias("ndocs"))
    dup = F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0)).cast("bigint")
    return (
        sh.join(c, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            dup.alias("n_dup"),
            _q(dup.cast("double") / F.count("*").cast("double"), 1e6).alias(
                "dup_frac"
            ),
        )
    )


@register(
    "priority_drift_chi2",
    oracle="""
    WITH cnt AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2
    ), yt AS (
      SELECT o_year, CAST(SUM(obs) AS BIGINT) AS y_tot FROM cnt GROUP BY o_year
    ), pt AS (
      SELECT o_orderpriority, CAST(SUM(obs) AS BIGINT) AS p_tot
      FROM cnt GROUP BY o_orderpriority
    ), n AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n_all FROM cnt
    ), terms AS (
      SELECT o_year, y_tot,
        CAST(FLOOR(
          (CAST(obs AS DOUBLE) - CAST(y_tot * p_tot AS DOUBLE)
             / CAST(n_all AS DOUBLE))
          * (CAST(obs AS DOUBLE) - CAST(y_tot * p_tot AS DOUBLE)
             / CAST(n_all AS DOUBLE))
          / (CAST(y_tot * p_tot AS DOUBLE) / CAST(n_all AS DOUBLE))
          * 1e6 + 0.5) AS BIGINT) AS term_q
      FROM cnt JOIN yt USING (o_year) JOIN pt USING (o_orderpriority)
      CROSS JOIN n
    )
    SELECT o_year, MAX(y_tot) AS n_orders,
      CAST(SUM(term_q) AS DOUBLE) / 1e6 + 0.0 AS chi2
    FROM terms GROUP BY o_year
    """,
)
def priority_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detector: per-year chi-square statistic of the
    order-priority mix against the all-time mix (expected count =
    row_total × col_total / N). A year whose priority distribution
    shifts — a feed change, an upstream bug — shows up as a chi2 spike;
    this is the categorical sibling of `anomaly_zscore`.

    The contingency table is built once ((year, priority) groupBy —
    map-side combinable); year totals, priority totals, and N are tiny
    re-aggregations of it that broadcast back. Each chi-square term is
    deterministic IEEE on exact integers, floor-quantized to a 1e-6
    BIGINT grid BEFORE the per-year sum, so the engines' different
    reduction orders can't move the total.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("bigint").alias("o_year"), "o_orderpriority"
    )
    cnt = o.groupBy("o_year", "o_orderpriority").agg(
        F.count("*").cast("bigint").alias("obs")
    )
    yt = cnt.groupBy("o_year").agg(F.sum("obs").cast("bigint").alias("y_tot"))
    pt = cnt.groupBy("o_orderpriority").agg(
        F.sum("obs").cast("bigint").alias("p_tot")
    )
    n_all = cnt.agg(F.sum("obs").cast("bigint").alias("n_all"))
    exp = (F.col("y_tot") * F.col("p_tot")).cast("double") / F.col("n_all").cast(
        "double"
    )
    diff = F.col("obs").cast("double") - exp
    term_q = F.floor(diff * diff / exp * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    terms = (
        cnt.join(F.broadcast(yt), "o_year")
        .join(F.broadcast(pt), "o_orderpriority")
        .crossJoin(F.broadcast(n_all))
        .select("o_year", "y_tot", term_q.alias("term_q"))
    )
    return terms.groupBy("o_year").agg(
        F.max("y_tot").alias("n_orders"),
        (F.sum("term_q").cast("double") / F.lit(1e6) + F.lit(0.0)).alias("chi2"),
    )


@register(
    "lang_class_weights",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ), t AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS n_all,
             CAST(COUNT(*) AS BIGINT) AS k FROM c
    )
    SELECT lang, n_docs,
      FLOOR(CAST(n_docs AS DOUBLE) / CAST(n_all AS DOUBLE) * 1e6 + 0.5)
        / 1e6 + 0.0 AS share,
      FLOOR(CAST(n_all AS DOUBLE)
            / (CAST(k AS DOUBLE) * CAST(n_docs AS DOUBLE)) * 1e6 + 0.5)
        / 1e6 + 0.0 AS class_weight
    FROM c CROSS JOIN t
    """,
)
def lang_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights per language — sklearn's
    "balanced" weighting, N / (K · n_class): the rebalancing factor a
    training pipeline applies when languages are unevenly represented
    (complements `corpus_mix_weights`, which targets an explicit
    mixture instead).

    One groupBy on lang; the totals row is a 1-row re-aggregation of
    the class counts cross-joined back (broadcast). All ratios are
    exact-integer inputs through identical IEEE divisions.
    """
    d = load_table(spark, sf_dir, "documents").select("lang")
    c = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_docs"))
    t = c.agg(
        F.sum("n_docs").cast("bigint").alias("n_all"),
        F.count("*").cast("bigint").alias("k"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        _q(F.col("n_docs").cast("double") / F.col("n_all").cast("double"), 1e6)
        .alias("share"),
        _q(
            F.col("n_all").cast("double")
            / (F.col("k").cast("double") * F.col("n_docs").cast("double")),
            1e6,
        ).alias("class_weight"),
    )


@register(
    "segment_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ), s AS (
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(cents) AS s1, SUM(cents * cents) AS s2
      FROM g GROUP BY c_mktsegment
    )
    SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
      a.n AS n_a, b.n AS n_b,
      FLOOR((CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE)
             - CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE)) / 100.0
            * 1e4 + 0.5) / 1e4 + 0.0 AS mean_diff,
      FLOOR((CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE)
             - CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))
            / sqrt(
                (CAST(a.n AS DOUBLE) * CAST(a.s2 AS DOUBLE)
                   - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE))
                / (CAST(a.n AS DOUBLE) * CAST(a.n - 1 AS DOUBLE))
                / CAST(a.n AS DOUBLE)
                + (CAST(b.n AS DOUBLE) * CAST(b.s2 AS DOUBLE)
                     - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE))
                  / (CAST(b.n AS DOUBLE) * CAST(b.n - 1 AS DOUBLE))
                  / CAST(b.n AS DOUBLE))
            * 1e4 + 0.5) / 1e4 + 0.0 AS t_stat
    FROM s a JOIN s b ON a.c_mktsegment < b.c_mktsegment
    """,
)
def segment_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t-statistic for account balance between every pair of
    market segments — the A/B-test primitive (unequal variances, no
    pooling) run directly on aggregates.

    One groupBy collects n/Σx/Σx² per segment on the exact cent grid
    (floor(x·100+0.5) is engine-identical for negative balances too);
    the pairwise comparison is then a self-join of the 5-row aggregate —
    per-pair work touches no fact rows. Means, variances, and the
    t-statistic are one explicitly-ordered IEEE expression over exact
    integers (sqrt is correctly rounded, so cross-engine-stable),
    floor-quantized to 1e-4. The t-statistic is scale-invariant, so
    computing in cents changes nothing; mean_diff converts back to
    dollars with a final /100.
    """
    g = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).alias("cents"),
    )
    s = g.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    a = s.alias("a")
    b = s.alias("b")

    def mean(side: str) -> Column:
        return F.col(f"{side}.s1").cast("double") / F.col(f"{side}.n").cast(
            "double"
        )

    def sem2(side: str) -> Column:
        n = F.col(f"{side}.n").cast("double")
        nm1 = (F.col(f"{side}.n") - 1).cast("double")
        s1 = F.col(f"{side}.s1").cast("double")
        s2 = F.col(f"{side}.s2").cast("double")
        return (n * s2 - s1 * s1) / (n * nm1) / n

    t = (mean("a") - mean("b")) / F.sqrt(sem2("a") + sem2("b"))
    return (
        a.join(b, F.col("a.c_mktsegment") < F.col("b.c_mktsegment"))
        .select(
            F.col("a.c_mktsegment").alias("seg_a"),
            F.col("b.c_mktsegment").alias("seg_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            _q((mean("a") - mean("b")) / F.lit(100.0), 1e4).alias("mean_diff"),
            _q(t, 1e4).alias("t_stat"),
        )
    )


@register(
    "multimodal_audio_energy",
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx FROM documents
    ), b AS (
      SELECT doc_id, i,
             CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS INT) - 128 AS s
      FROM h, UNNEST(generate_series(1, length(hx) // 2)) AS t(i)
    )
    SELECT doc_id,
      CAST((i - 1) // 64 AS INT) AS window_idx,
      CAST(COUNT(*) AS INT) AS n_samples,
      CAST(SUM(s * s) AS BIGINT) AS energy,
      CAST(MAX(ABS(s)) AS INT) AS peak
    FROM b GROUP BY doc_id, (i - 1) // 64
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio-feature extraction over an opaque binary payload
    (operators/multimodal.py::extract_audio_features): 64-sample frames
    of centered byte-samples → per-frame energy and peak, via the
    Arrow-batched 1→N mapInPandas fan-out a real featurizer uses.

    The payload is the deterministic fake (UTF-8 bytes of text — the
    fixtures carry no media), so DuckDB reproduces every sample from
    hex(encode(text)) and the ENTIRE fan-out is value-checked, not just
    row-counted: frame boundaries, per-frame counts, integer energy
    sums. Only doc_id + payload cross the Arrow boundary (column
    pruning), and all emitted features are integers — no float
    reduction anywhere in the operator.
    """
    from ..operators.multimodal import attach_fake_payload, extract_audio_features

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_audio_features(attach_fake_payload(d), window=64)


@register(
    "pareto_revenue_share",
    oracle="""
    WITH cr AS (
      SELECT o_custkey,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
          AS rev
      FROM orders GROUP BY o_custkey
    ), th AS (
      SELECT
        FLOOR(CAST(quantile_cont(rev, 0.99) AS DOUBLE) * 1e4 + 0.5)
          / 1e4 + 0.0 AS t99,
        FLOOR(CAST(quantile_cont(rev, 0.95) AS DOUBLE) * 1e4 + 0.5)
          / 1e4 + 0.0 AS t95,
        FLOOR(CAST(quantile_cont(rev, 0.90) AS DOUBLE) * 1e4 + 0.5)
          / 1e4 + 0.0 AS t90,
        FLOOR(CAST(quantile_cont(rev, 0.80) AS DOUBLE) * 1e4 + 0.5)
          / 1e4 + 0.0 AS t80
      FROM cr
    ), agg AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_all,
        CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS rev_all,
        CAST(SUM(CASE WHEN rev >= t99 THEN 1 ELSE 0 END) AS BIGINT) AS n99,
        CAST(SUM(CASE WHEN rev >= t99 THEN CAST(rev AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS r99,
        CAST(SUM(CASE WHEN rev >= t95 THEN 1 ELSE 0 END) AS BIGINT) AS n95,
        CAST(SUM(CASE WHEN rev >= t95 THEN CAST(rev AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS r95,
        CAST(SUM(CASE WHEN rev >= t90 THEN 1 ELSE 0 END) AS BIGINT) AS n90,
        CAST(SUM(CASE WHEN rev >= t90 THEN CAST(rev AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS r90,
        CAST(SUM(CASE WHEN rev >= t80 THEN 1 ELSE 0 END) AS BIGINT) AS n80,
        CAST(SUM(CASE WHEN rev >= t80 THEN CAST(rev AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS r80
      FROM cr CROSS JOIN th
    )
    SELECT tier, n_customers, tier_revenue,
      FLOOR(tier_revenue / rev_all * 1e6 + 0.5) / 1e6 + 0.0 AS revenue_share
    FROM (
      SELECT 'top_1pct' AS tier, n99 AS n_customers, r99 AS tier_revenue,
             rev_all FROM agg
      UNION ALL
      SELECT 'top_5pct', n95, r95, rev_all FROM agg
      UNION ALL
      SELECT 'top_10pct', n90, r90, rev_all FROM agg
      UNION ALL
      SELECT 'top_20pct', n80, r80, rev_all FROM agg
    )
    """,
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration ("do 20% of customers drive 80% of
    revenue?"): the revenue share held by the top 1/5/10/20% of
    customers, where tiers are defined by revenue-percentile THRESHOLDS
    rather than a ranked cumulative sum.

    The threshold formulation is the scale story: a classic Pareto
    curve needs a global revenue sort + running total — an all-data
    single-partition window. Here the per-customer rollup (one keyed
    shuffle) feeds a 1-row quantile aggregate, which broadcasts back
    for one conditional-sum pass: no global sort, no window, nothing
    single-partition except 1-row aggregates. Tier sums go through
    DECIMAL (order-exact); thresholds are rounded to 4dp on both
    engines before the >= comparison so an interpolation ulp can't
    move a customer across tiers.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    # customer-bounded rollup materialized once — the quantile pass and
    # the tier pass both consume it; without the cut the orders shuffle
    # runs twice
    cr = (
        o.groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("rev")
        )
        .localCheckpoint(eager=True)
    )
    th = cr.agg(
        *[
            _q(F.percentile("rev", F.lit(p)), 1e4).alias(t)
            for p, t in [(0.99, "t99"), (0.95, "t95"), (0.90, "t90"), (0.80, "t80")]
        ]
    )
    rdec = F.col("rev").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    aggs = [
        F.count("*").cast("bigint").alias("n_all"),
        F.sum(rdec).cast("double").alias("rev_all"),
    ]
    for t in ["t99", "t95", "t90", "t80"]:
        cond = F.col("rev") >= F.col(t)
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"n_{t}")
        )
        aggs.append(
            F.sum(F.when(cond, rdec).otherwise(zero)).cast("double").alias(f"r_{t}")
        )
    agg = cr.crossJoin(F.broadcast(th)).agg(*aggs)
    tiers = F.array(
        *[
            F.struct(
                F.lit(name).alias("tier"),
                F.col(f"n_{t}").alias("n_customers"),
                F.col(f"r_{t}").alias("tier_revenue"),
            )
            for t, name in [
                ("t99", "top_1pct"),
                ("t95", "top_5pct"),
                ("t90", "top_10pct"),
                ("t80", "top_20pct"),
            ]
        ]
    )
    return agg.select(F.col("rev_all"), F.explode(tiers).alias("x")).select(
        "x.tier",
        "x.n_customers",
        "x.tier_revenue",
        _q(F.col("x.tier_revenue") / F.col("rev_all"), 1e6).alias("revenue_share"),
    )


@register(
    "ngram_novelty",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS sh
      FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
      WHERE len(ws) >= 3
    ), first AS (
      SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh
    )
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_shingles,
      CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        AS n_novel,
      FLOOR(CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                 AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 + 0.0
        AS novelty_frac
    FROM sh JOIN first USING (sh)
    GROUP BY doc_id
    """,
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-order novelty: per document, the fraction of its distinct
    3-gram shingles whose FIRST appearance (minimum doc_id) is this
    document — "how much genuinely new content does each document add
    to the corpus", the diversity-budget signal a curation pipeline
    tracks as it appends batches (complement of `dup_ngram_coverage`,
    which is order-free).

    Same doc-frequency-bounded shape as the dedup family: distinct
    (doc, shingle) pairs, a min-aggregate per shingle (map-side
    combinable — min commutes), a shingle-keyed join back, and the
    per-doc rollup. Nothing quadratic, every shuffle on shingle or
    doc_id; the min-per-shingle table is vocabulary-bounded.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("ws"))
    sh = (
        w.filter(F.size("ws") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 3),"
                    " i -> array_join(slice(ws, i + 1, 3), ' '))"
                )
            ).alias("sh"),
        )
        .distinct()
        # the distinct (doc, shingle) set feeds both the min-aggregate
        # and the join probe: cut lineage so the corpus is tokenized and
        # shuffled for distinct ONCE, not once per consumer
        .localCheckpoint(eager=True)
    )
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("bigint")
    return (
        sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            novel.alias("n_novel"),
            _q(novel.cast("double") / F.count("*").cast("double"), 1e6).alias(
                "novelty_frac"
            ),
        )
    )


@register(
    "value_psi_weekly",
    oracle="""
    WITH b AS (
      SELECT STRFTIME(date_trunc('week', ts), '%Y-%m-%d') AS week,
             CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket
      FROM events
    ), wk AS (
      SELECT week, bucket, CAST(COUNT(*) AS BIGINT) AS c_w
      FROM b GROUP BY week, bucket
    ), grid AS (
      SELECT w.week, g.bucket, COALESCE(wk.c_w, 0) AS c_w
      FROM (SELECT DISTINCT week FROM wk) w
      CROSS JOIN (SELECT DISTINCT bucket FROM wk) g
      LEFT JOIN wk ON wk.week = w.week AND wk.bucket = g.bucket
    ), alln AS (
      SELECT bucket, CAST(SUM(c_w) AS BIGINT) AS c_a FROM grid GROUP BY bucket
    ), tot AS (
      SELECT week, CAST(SUM(c_w) AS BIGINT) AS n_w FROM grid GROUP BY week
    ), tota AS (
      SELECT CAST(SUM(c_w) AS BIGINT) AS n_a,
             CAST(COUNT(DISTINCT bucket) AS BIGINT) AS k FROM grid
    ), terms AS (
      SELECT week, n_w,
        (CAST(c_w + 1 AS DOUBLE) / CAST(n_w + k AS DOUBLE)
          - CAST(c_a + 1 AS DOUBLE) / CAST(n_a + k AS DOUBLE))
        * CAST(CAST(FLOOR(ln(
            CAST((c_w + 1) * (n_a + k) AS DOUBLE)
            / CAST((c_a + 1) * (n_w + k) AS DOUBLE)
          ) * 1e6 + 0.5) AS BIGINT) AS DOUBLE) AS term
      FROM grid
      JOIN alln USING (bucket)
      JOIN tot USING (week)
      CROSS JOIN tota
    )
    SELECT week, MAX(n_w) AS n_events,
      FLOOR(CAST(SUM(CAST(FLOOR(term + 0.5) AS BIGINT)) AS DOUBLE)
            / 1e6 * 1e6 + 0.5) / 1e6 + 0.0 AS psi
    FROM terms GROUP BY week
    """,
)
def value_psi_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution, per
    week vs the full period — the standard "did my feature distribution
    drift" monitor (PSI > 0.2 conventionally flags action), the
    continuous sibling of `priority_drift_chi2`.

    Values bucket into fixed-width bins (width 50); each (week, bin)
    cell is Laplace-smoothed (+1 over k bins) so empty cells are
    well-defined without dropping terms. PSI terms multiply an exact
    integer-count ratio difference by ln of an integer-products ratio
    on the 1e-6 grid, and each term is floor-rounded to an integer
    BEFORE the per-week sum — reduction order can't move the total.
    The dense week×bin grid is built by crossing the two tiny distinct
    sets (weeks × ~10 bins) — never by scanning the fact table wider;
    all fact work is one (week, bucket) groupBy.
    """
    e = load_table(spark, sf_dir, "events").select("ts", "value")
    b = e.select(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        F.floor(F.col("value") / F.lit(50.0)).alias("bucket"),
    )
    # materialize the tiny (week, bucket) contingency table once — six
    # consumers derive from it, and without the lineage cut each one
    # would re-scan and re-bucket the fact table (operators/dedup.py
    # localCheckpoint pattern; the table is weeks × ~10 bins rows)
    wk = (
        b.groupBy("week", "bucket")
        .agg(F.count("*").cast("bigint").alias("c_w"))
        .localCheckpoint(eager=True)
    )
    weeks = wk.select("week").distinct()
    buckets = wk.select("bucket").distinct()
    grid = (
        weeks.crossJoin(buckets)
        .join(wk, ["week", "bucket"], "left")
        .select("week", "bucket", F.coalesce("c_w", F.lit(0)).alias("c_w"))
    )
    alln = grid.groupBy("bucket").agg(F.sum("c_w").cast("bigint").alias("c_a"))
    tot = grid.groupBy("week").agg(F.sum("c_w").cast("bigint").alias("n_w"))
    tota = grid.agg(
        F.sum("c_w").cast("bigint").alias("n_a"),
        F.countDistinct("bucket").cast("bigint").alias("k"),
    )
    p_w = (F.col("c_w") + 1).cast("double") / (F.col("n_w") + F.col("k")).cast(
        "double"
    )
    p_a = (F.col("c_a") + 1).cast("double") / (F.col("n_a") + F.col("k")).cast(
        "double"
    )
    lnq = F.floor(
        F.log(
            ((F.col("c_w") + 1) * (F.col("n_a") + F.col("k"))).cast("double")
            / ((F.col("c_a") + 1) * (F.col("n_w") + F.col("k"))).cast("double")
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    term = (p_w - p_a) * lnq.cast("double")
    terms = (
        grid.join(F.broadcast(alln), "bucket")
        .join(F.broadcast(tot), "week")
        .crossJoin(F.broadcast(tota))
        .select(
            "week",
            "n_w",
            F.floor(term + F.lit(0.5)).cast("bigint").alias("term_i"),
        )
    )
    return terms.groupBy("week").agg(
        F.max("n_w").alias("n_events"),
        _q(F.sum("term_i").cast("double") / F.lit(1e6), 1e6).alias("psi"),
    )


@register(
    "supplier_hhi_by_nation",
    oracle="""
    WITH sr AS (
      SELECT s_nationkey, l_suppkey,
        SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS r
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey, l_suppkey
    ), nt AS (
      SELECT s_nationkey, CAST(SUM(r) AS DECIMAL(38,6)) AS t,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers
      FROM sr GROUP BY s_nationkey
    )
    SELECT n_name, MAX(n_suppliers) AS n_suppliers,
      FLOOR(CAST(SUM(CAST(FLOOR(
          (CAST(r AS DOUBLE) / CAST(t AS DOUBLE))
          * (CAST(r AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9 + 0.5)
        AS BIGINT)) AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 + 0.0 AS hhi
    FROM sr
    JOIN nt USING (s_nationkey)
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration per
    nation (Σ share² — 1/n for perfect competition, 1.0 for monopoly):
    the concentration metric that complements `pareto_revenue_share`'s
    tier view, over the supply side.

    Per-supplier revenue sums go through DECIMAL (order-exact); each
    squared share is two identical IEEE ops on exact decimals and is
    floor-quantized to a 1e-9 BIGINT before the per-nation sum. Plan:
    the only data-sized shuffle is the (nation, supplier) revenue
    rollup — nation totals re-aggregate the supplier-bounded result,
    broadcast back, and the nation-name dim is a constant-size hard
    broadcast (`dim()` policy, io/tables.py).
    """
    from ..io.tables import dim

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = dim(load_table(spark, sf_dir, "nation"), "nation").select(
        "n_nationkey", "n_name"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    # supplier-bounded rollup materialized once (nation totals + the
    # share pass both consume it; without the cut lineitem⋈supplier
    # re-runs for each)
    sr = (
        li.join(su, li["l_suppkey"] == su["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(rev).alias("r"))
        .localCheckpoint(eager=True)
    )
    nt = sr.groupBy("s_nationkey").agg(
        F.sum("r").cast("decimal(38,6)").alias("t"),
        F.count("*").cast("bigint").alias("n_suppliers"),
    )
    share = F.col("r").cast("double") / F.col("t").cast("double")
    term = F.floor(share * share * F.lit(1e9) + F.lit(0.5)).cast("bigint")
    return (
        sr.join(F.broadcast(nt), "s_nationkey")
        .join(na, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            _q(F.sum(term).cast("double") / F.lit(1e9), 1e6).alias("hhi"),
        )
    )
