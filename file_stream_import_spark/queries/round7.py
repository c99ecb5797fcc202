"""Round-7 queries.

Opens with the JPEG roundtrip that retires the last multimodal
stand-in (VERDICT r6 item 7): operators/multimodal.py now carries a
real baseline-sequential JFIF codec (Huffman + dequant + IDCT), and
the flat-tile construction makes the lossy format's decode exactly
predictable, so the whole pipeline is oracle-checkable like WAV/PNG/
BMP before it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io.tables import load_table
from . import register


@register(
    "multimodal_jpeg_roundtrip",
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             length(hex(encode(text))) // 2 AS n
      FROM documents WHERE length(text) > 0
    ), g AS (
      SELECT doc_id, hx, n, GREATEST(1, (n + 15) // 16) AS nbr FROM h
    ), b AS (
      SELECT doc_id, j,
             CASE WHEN j < n THEN substr(hx, 2 * j + 1, 2)
                  ELSE '00' END AS bh
      FROM g, UNNEST(generate_series(0, 16 * nbr - 1)) AS t(j)
    ), rws AS (
      SELECT doc_id, j // 16 AS brw,
             string_agg(repeat(bh, 8), '' ORDER BY j) AS rowhex
      FROM b GROUP BY doc_id, j // 16
    ), px AS (
      SELECT doc_id,
             string_agg(repeat(rowhex, 8), '' ORDER BY brw) AS pxhex
      FROM rws GROUP BY doc_id
    ), s AS (
      SELECT doc_id,
             SUM(CAST(('0x' || bh) AS INT)) AS sum_b
      FROM b GROUP BY doc_id
    )
    SELECT g.doc_id,
      CAST(128 AS INT) AS width,
      CAST(8 * nbr AS INT) AS height,
      CAST(64 * 16 * nbr - 64 * n AS INT) AS n_pad_px,
      CAST(sum_b * 64 * 1000000 // (64 * 16 * nbr) AS BIGINT)
        AS mean_pixel_ppm,
      CAST(('0x' || substr(md5(pxhex), 1, 15)) AS BIGINT) AS px_checksum
    FROM g JOIN px USING (doc_id) JOIN s USING (doc_id)
    """,
)
def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image features through a REAL JPEG encode→decode round trip
    (operators/multimodal.py::jpeg_roundtrip_features): baseline-
    sequential JFIF — segment grammar, canonical Huffman tables,
    entropy coding with byte stuffing, dequantization, zigzag, IDCT —
    the fourth genuine container codec beside WAV/PNG/BMP, closing the
    last multimodal stand-in.

    The encoder maps each payload byte to a FLAT 8x8 tile, which makes
    the lossy DCT pipeline exactly lossless by construction (only the
    DC coefficient is nonzero — 8*(v-128) — and q_DC=8 quantizes it
    without rounding), so DuckDB rebuilds every DECODED pixel from
    hex(encode(text)): the tile expansion is string algebra (each byte
    hex repeated 8x per row, each row repeated 8x per block-row) and
    px_checksum hashes that exact pixel string — one transposed tile,
    one wrong pad byte, one Huffman off-by-one and the hash breaks.
    Both codec directions are interop-proven against javax.imageio in
    tests/test_layout.py. Scale: one Arrow-batched mapInPandas over
    (doc_id, payload) only — the same bounded-batch shape as the other
    codecs; features are integers."""
    from ..operators.multimodal import (
        attach_fake_payload,
        jpeg_roundtrip_features,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    return jpeg_roundtrip_features(attach_fake_payload(d))


def _q6(col):
    """Floor-quantize onto the 1e-6 grid with the -0.0 guard (the
    cross-engine-exact alternative to ROUND(double, 6))."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6) + F.lit(0.0)


@register(
    "time_to_convert_stats",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
      SELECT v.user_id,
             date_diff('second', v.first_view, MIN(e.ts)) AS secs
      FROM v JOIN events e
        ON e.user_id = v.user_id
       AND e.event_type = 'purchase' AND e.ts >= v.first_view
      GROUP BY v.user_id, v.first_view
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(MIN(secs) AS BIGINT) AS min_secs,
           FLOOR(CAST(quantile_cont(secs, 0.5) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 + 0.0 AS p50_secs,
           FLOOR(CAST(quantile_cont(secs, 0.9) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 + 0.0 AS p90_secs
    FROM p
    """,
)
def time_to_convert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: seconds from each user's FIRST
    view to their first purchase at or after it — the latency metric
    behind funnel SLAs, reduced to exact integer seconds per user
    before any percentile math.

    Two per-user aggregates (first view, then first qualifying
    purchase via one equi-join with a range predicate) — the
    |users|-sized frame is what the percentiles run on, never the raw
    event log. p50/p90 are linear-interpolated on the same integer
    inputs in both engines, floor-gridded at 1e-6."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        v.join(
            e.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("pts")
            ),
            "user_id",
        )
        .filter(F.col("pts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(
            (
                F.unix_timestamp(F.min("pts"))
                - F.unix_timestamp("first_view")
            ).alias("secs")
        )
    )
    return p.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.min("secs").cast("bigint").alias("min_secs"),
        _q6(F.percentile("secs", F.lit(0.5))).alias("p50_secs"),
        _q6(F.percentile("secs", F.lit(0.9))).alias("p90_secs"),
    )


@register(
    "stl_weekly_seasonality",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS ed,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ),
    bounds AS (SELECT MIN(ed) AS lo, MAX(ed) AS hi FROM daily),
    grid AS (
      SELECT lo + i AS ed
      FROM bounds, UNNEST(generate_series(0, CAST(hi - lo AS INT))) AS t(i)
    ),
    filled AS (
      SELECT g.ed, COALESCE(d.cents, 0) AS cents
      FROM grid g LEFT JOIN daily d ON d.ed = g.ed
    ),
    tr AS (
      SELECT ed, cents,
             SUM(cents) OVER (ORDER BY ed
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS t7,
             COUNT(*) OVER (ORDER BY ed
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS n7
      FROM filled
    ),
    det AS (
      SELECT ed % 7 AS dow, cents * 7 - t7 AS d7
      FROM tr WHERE n7 = 7
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           FLOOR(CAST(SUM(d7) AS DOUBLE) / COUNT(*) / 7.0 * 1e6 + 0.5)
             / 1e6 + 0.0 AS seasonal_cents
    FROM det GROUP BY 1
    """,
)
def stl_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite weekly decomposition of daily revenue: trend = centered
    7-day moving sum on the ZERO-FILLED calendar grid, seasonal = mean
    DETRENDED value per day-of-week — the decomposition that separates
    'Mondays are slow' from 'the business is shrinking' before either
    claim is made. Distinct from ``dow_seasonality`` (raw per-weekday
    revenue share): the centered-MA detrend removes level and drift
    FIRST, so a growing business doesn't masquerade as weekday
    seasonality.

    Exactness: the detrended series is kept as INTEGERS (cents*7 minus
    the 7-day moving SUM — no division until the final per-dow mean),
    so both engines aggregate identical values and the single closing
    division lands on the 1e-6 floor grid. The grid is generated
    min..max and zero-filled on both sides, so missing days detrend
    identically. Scale: the fact scan reduces to the day grid first;
    everything after is |days|-sized."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("ed")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("cents")
    )
    b = daily.agg(F.min("ed").alias("lo"), F.max("ed").alias("hi"))
    grid = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("ed")
    )
    filled = grid.join(daily, "ed", "left").select(
        "ed", F.coalesce("cents", F.lit(0)).alias("cents")
    )
    w = W.orderBy("ed").rowsBetween(-3, 3)
    tr = filled.select(
        "ed",
        "cents",
        F.sum("cents").over(w).alias("t7"),
        F.count("*").over(w).alias("n7"),
    )
    det = tr.filter(F.col("n7") == 7).select(
        (F.col("ed") % 7).alias("dow"),
        (F.col("cents") * 7 - F.col("t7")).alias("d7"),
    )
    return det.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n_days"),
        _q6(
            F.sum("d7").cast("double") / F.count("*") / F.lit(7.0)
        ).alias("seasonal_cents"),
    ).select(F.col("dow").cast("bigint"), "n_days", "seasonal_cents")


@register(
    "mad_outliers_by_segment",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    med AS (
      SELECT seg, CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
      FROM j GROUP BY 1
    ),
    dev AS (
      SELECT j.seg, j.cents, med2,
             ABS(2 * j.cents - med2) AS adev2
      FROM j JOIN med ON med.seg = j.seg
    ),
    mad AS (
      SELECT seg, CAST(quantile_cont(adev2, 0.5) * 2 AS BIGINT) AS mad4
      FROM dev GROUP BY 1
    )
    SELECT d.seg AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(d.med2) AS DOUBLE) / 2 AS median_cents,
           CAST(MAX(m.mad4) AS DOUBLE) / 4 AS mad_cents,
           CAST(SUM(CASE WHEN 40000 * d.adev2 > 51891 * m.mad4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON m.seg = d.seg
    GROUP BY 1
    """,
)
def mad_outliers_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Robust outlier census per market segment: median/MAD z-score
    (the estimator that survives the outliers it hunts — unlike
    mean/stddev, which the outliers drag toward themselves), counting
    orders with |x - median| > 3.5 * 1.4826 * MAD, the standard
    robust-z cut. Complements ``iqr_outlier_fences`` (Tukey fences):
    MAD-z targets near-normal cores with a tunable sigma-equivalent
    threshold, where the IQR fence is quartile-anchored — the two
    standard robust cuts a data-quality suite ships side by side.

    Cross-engine exactness: medians of integer cents land on the x.5
    half-grid, so they are carried as DOUBLED integers (med*2, mad*4
    after the second doubling) and the 3.5*1.4826 = 5.1891 threshold
    becomes the INTEGER comparison 40000*|2x - med2| > 51891*mad4 —
    no float compare anywhere near the decision boundary. Two
    median passes + one counting aggregate, all on the cents grid."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )
    j = o.join(F.broadcast(c), "o_custkey").select("seg", "cents")
    med = j.groupBy("seg").agg(
        (F.percentile("cents", F.lit(0.5)) * 2).cast("bigint").alias("med2")
    )
    dev = j.join(F.broadcast(med), "seg").select(
        "seg",
        "cents",
        "med2",
        F.abs(F.col("cents") * 2 - F.col("med2")).alias("adev2"),
    )
    mad = dev.groupBy("seg").agg(
        (F.percentile("adev2", F.lit(0.5)) * 2).cast("bigint").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "seg")
        .groupBy("seg")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            (F.max("med2").cast("double") / 2).alias("median_cents"),
            (F.max("mad4").cast("double") / 4).alias("mad_cents"),
            F.sum(
                F.when(
                    F.col("adev2") * 40000 > F.col("mad4") * 51891, 1
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
        .select(
            F.col("seg").alias("c_mktsegment"),
            "n_orders",
            "median_cents",
            "mad_cents",
            "n_outliers",
        )
    )


@register(
    "cuped_revenue_adjustment",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS ed,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    b AS (SELECT (MIN(ed) + MAX(ed)) // 2 AS mid FROM o),
    per_cust AS (
      SELECT o_custkey,
             SUM(CASE WHEN ed <= mid THEN cents ELSE 0 END) AS pre,
             SUM(CASE WHEN ed > mid THEN cents ELSE 0 END) AS post
      FROM o CROSS JOIN b GROUP BY 1
    ),
    lab AS (
      SELECT p.*,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t
      FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(pre AS HUGEINT)) AS sx,
             SUM(CAST(post AS HUGEINT)) AS sy,
             SUM(CAST(pre AS HUGEINT) * pre) AS sxx,
             SUM(CAST(pre AS HUGEINT) * post) AS sxy,
             SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n_t,
             SUM(CASE WHEN t = 1 THEN CAST(pre AS HUGEINT) ELSE 0 END)
               AS sx_t,
             SUM(CASE WHEN t = 1 THEN CAST(post AS HUGEINT) ELSE 0 END)
               AS sy_t
      FROM lab
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(n_t AS BIGINT) AS n_treatment,
           FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5)
             / 1e6 + 0.0 AS theta,
           FLOOR((CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                  - CAST(sy - sy_t AS DOUBLE) / CAST(n - n_t AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 + 0.0 AS raw_diff_cents,
           FLOOR((CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                  - CAST(sy - sy_t AS DOUBLE) / CAST(n - n_t AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                       - CAST(sx - sx_t AS DOUBLE)
                         / CAST(n - n_t AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 + 0.0 AS cuped_diff_cents
    FROM m
    """,
)
def cuped_revenue_adjustment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUPED variance reduction for an A/B readout (treatment =
    BUILDING-segment customers, metric = second-half revenue,
    covariate = FIRST-half revenue): theta = cov(pre, post)/var(pre)
    pooled over everyone, adjusted effect = raw_diff - theta *
    pre_diff — the standard experimentation-platform correction that
    removes pre-existing spend differences from the readout.

    Exactness: the per-customer pre/post frame is exact integer cents;
    theta and both diffs come from SEVEN pooled moment sums in
    decimal(38,0)/HUGEINT, folded to doubles in one fixed operand
    order and floor-gridded — no float accumulates across rows. Scale:
    one fact scan -> per-customer conditional aggregate -> one 7-sum
    reduce; the date midpoint comes from a 1-row bound aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("ed"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    b = o.agg(
        ((F.min("ed") + F.max("ed")) / 2).cast("long").alias("mid")
    )
    per_cust = (
        o.crossJoin(F.broadcast(b))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(F.col("ed") <= F.col("mid"), F.col("cents")).otherwise(0)
            ).alias("pre"),
            F.sum(
                F.when(F.col("ed") > F.col("mid"), F.col("cents")).otherwise(0)
            ).alias("post"),
        )
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("t"),
    )
    lab = per_cust.join(F.broadcast(c), "o_custkey")
    dec = "decimal(38,0)"
    m = lab.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("pre").cast(dec)).alias("sx"),
        F.sum(F.col("post").cast(dec)).alias("sy"),
        F.sum(F.col("pre").cast(dec) * F.col("pre")).alias("sxx"),
        F.sum(F.col("pre").cast(dec) * F.col("post")).alias("sxy"),
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0)).cast(dec).alias("n_t"),
        F.sum(
            F.when(F.col("t") == 1, F.col("pre")).otherwise(0).cast(dec)
        ).alias("sx_t"),
        F.sum(
            F.when(F.col("t") == 1, F.col("post")).otherwise(0).cast(dec)
        ).alias("sy_t"),
    )
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    mean_y_t = F.col("sy_t").cast("double") / F.col("n_t").cast("double")
    mean_y_c = (F.col("sy") - F.col("sy_t")).cast("double") / (
        F.col("n") - F.col("n_t")
    ).cast("double")
    mean_x_t = F.col("sx_t").cast("double") / F.col("n_t").cast("double")
    mean_x_c = (F.col("sx") - F.col("sx_t")).cast("double") / (
        F.col("n") - F.col("n_t")
    ).cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("n_t").cast("bigint").alias("n_treatment"),
        _q6(theta).alias("theta"),
        _q6(mean_y_t - mean_y_c).alias("raw_diff_cents"),
        _q6(
            mean_y_t - mean_y_c - theta * (mean_x_t - mean_x_c)
        ).alias("cuped_diff_cents"),
    )


@register(
    "label_centroid_similarity",
    oracle="""
    WITH x AS (
      SELECT label, CAST(i.i AS BIGINT) AS dim,
             CAST(FLOOR(CAST(embedding[i.i + 1] AS DOUBLE) * 1e6 + 0.5)
                  AS BIGINT) AS vq
      FROM embeddings CROSS JOIN (SELECT UNNEST(range(64)) AS i) i
    ),
    cent AS (
      SELECT label, dim, SUM(vq) AS s, COUNT(*) AS n
      FROM x GROUP BY 1, 2
    ),
    c AS (
      SELECT label, dim, CAST(s AS DOUBLE) / n AS c FROM cent
    ),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(a.c * b.c) AS dot,
             SUM(a.c * a.c) AS na,
             SUM(b.c * b.c) AS nb
      FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT label_a, label_b,
           FLOOR(dot / sqrt(na * nb) * 1e6 + 0.5) / 1e6 + 0.0
             AS centroid_cos
    FROM pairs
    """,
)
def label_centroid_similarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding
    CENTROIDS — the class-separability probe run before training a
    classifier on the corpus (two labels whose centroids nearly
    coincide will confuse any linear head).

    Exactness: each component is floor-quantized to the 1e-6 grid
    BEFORE the per-label sum, so centroid sums are exact integers in
    both engines; the |labels| x 64 centroid table then does the
    (deterministically ordered, 64-term) cosine fold. Scale: one
    explode + one (label, dim) aggregate over the corpus; the pair
    stage runs on the centroid table — |labels|^2 x 64 rows, corpus
    size irrelevant."""
    em = load_table(spark, sf_dir, "embeddings")
    x = em.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "label",
        F.col("pos").cast("bigint").alias("dim"),
        F.floor(F.col("col") * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("vq"),
    )
    c = (
        x.groupBy("label", "dim")
        .agg(F.sum("vq").alias("s"), F.count("*").alias("n"))
        .select(
            "label", "dim", (F.col("s").cast("double") / F.col("n")).alias("c")
        )
    )
    a = c.select(
        F.col("label").alias("label_a"), "dim", F.col("c").alias("ca")
    )
    b = c.select(
        F.col("label").alias("label_b"), "dim", F.col("c").alias("cb")
    )
    pairs = (
        a.join(b, (a["dim"] == b["dim"]) & (a["label_a"] < b["label_b"]))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("dot"),
            F.sum(F.col("ca") * F.col("ca")).alias("na"),
            F.sum(F.col("cb") * F.col("cb")).alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        _q6(F.col("dot") / F.sqrt(F.col("na") * F.col("nb"))).alias(
            "centroid_cos"
        ),
    )


@register(
    "duplicate_events_audit",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, value, ts,
             LAG(ts) OVER (
               PARTITION BY user_id, event_type, value
               ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                          AND ts <= prev_ts + INTERVAL 5 MINUTE
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_5m
    FROM e GROUP BY 1
    """,
)
def duplicate_events_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery audit: events with an identical
    (user, type, value) predecessor within 5 minutes — the near-dup
    rate a pipeline monitors to decide whether its sources need a
    dedup stage (the batch complement of streaming/dedup.py's
    dropDuplicates watermark path).

    One LAG window on the natural dedup key ordered by time — no
    self-join; per-key runs are the unit of work and the output is
    |event_type| rows of exact counts."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type", "value").orderBy(
        "ts", "event_id"
    )
    flagged = e.select(
        "event_type",
        F.when(
            F.lag("ts").over(w).isNotNull()
            & (
                F.col("ts")
                <= F.lag("ts").over(w) + F.expr("INTERVAL 5 MINUTE")
            ),
            1,
        )
        .otherwise(0)
        .alias("is_dup"),
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("is_dup").cast("bigint").alias("n_dup_5m"),
    )


@register(
    "interevent_gap_log2_histogram",
    oracle="""
    WITH g AS (
      SELECT event_type,
             date_diff('second',
                       LAG(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id),
                       ts) AS gap
      FROM events
    )
    SELECT event_type,
           CAST(CASE WHEN gap = 0 THEN -1
                     ELSE length(bin(gap)) - 1 END AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM g WHERE gap IS NOT NULL
    GROUP BY 1, 2
    """,
)
def interevent_gap_log2_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HdrHistogram-style latency profile of per-user inter-event gaps:
    counts per power-of-two bucket (floor(log2(gap_seconds));
    simultaneous events land in bucket -1) — the log-bucketed view
    that shows a bimodal think-time distribution where percentiles
    hide it.

    The bucket comes from the BINARY STRING LENGTH of the integer gap
    (len(bin(x)) - 1 == floor(log2(x)) exactly), not from float log2 —
    Spark's log2 is ln(x)/ln(2), whose 2^k edges are not reliably
    exact across engines; string length is. One LAG window + one
    aggregate; output is |types| x ~20 buckets."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    bucket = F.when(F.col("gap") == 0, F.lit(-1)).otherwise(
        F.length(F.conv(F.col("gap").cast("string"), 10, 2)) - 1
    )
    return g.groupBy(
        "event_type", bucket.cast("bigint").alias("log2_bucket")
    ).agg(F.count("*").cast("bigint").alias("n"))


@register(
    "lake_concurrent_disjoint_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 10 < 2
    ),
    lo AS (SELECT (MIN(k) + MAX(k)) // 2 AS mid FROM base),
    merged AS (
      SELECT k,
             CASE WHEN k <= mid AND k % 3 = 0 THEN 'A_TOUCHED'
                  WHEN k > mid AND k % 3 = 1 THEN 'B_TOUCHED'
                  ELSE status END AS status,
             cents
      FROM base CROSS JOIN lo
    )
    SELECT k, status, cents FROM merged
    """,
)
def lake_concurrent_disjoint_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Group-disjoint optimistic concurrency, DRIVER-VERIFIED: two
    writers read the SAME snapshot; writer A merges updates to the low
    half of the key space, then writer B — still pinned to the
    pre-A version — merges the high half. Under r1-r6 rules B would
    conflict and recompute; under the r7 Delta-style validation B's
    publish sees that A's commit touched a disjoint group and key box,
    REBASES onto it, and lands. The query returns the final table,
    so the oracle checks that NEITHER writer's rows were lost — the
    exact lost-update anomaly snapshot-isolation must prevent.

    The table is committed as explicit low/high key-range groups
    (split at (min+max)//2, the same arithmetic the oracle runs) so
    the disjointness is real at the file level: B's rebase carries
    A's new group by reference and drops only the group B itself
    rewrote. Asserts the rebase actually happened (manifest records
    rebased_from) — a silent fallback to retry-recompute would fail
    the assert, not just pass slower."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).filter(F.col("k") % 10 < 2)
    mid = int(
        o.agg(
            ((F.min("k") + F.max("k")) / 2).cast("long").alias("mid")
        ).first()["mid"]
    )
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_concurrent_"))
    try:
        t.commit(o.filter(F.col("k") <= mid))  # low-range group
        t.commit(o.filter(F.col("k") > mid))   # high-range group
        pinned = t.latest_version()  # BOTH writers read this snapshot
        upd_a = o.filter(
            (F.col("k") <= mid) & (F.col("k") % 3 == 0)
        ).withColumn("status", F.lit("A_TOUCHED"))
        upd_b = o.filter(
            (F.col("k") > mid) & (F.col("k") % 3 == 1)
        ).withColumn("status", F.lit("B_TOUCHED"))
        merge_into(t, spark, upd_a, key="k", expected_parent=pinned)
        v_b = merge_into(t, spark, upd_b, key="k", expected_parent=pinned)
        m = t._load_manifest(v_b)
        assert m.get("rebased_from") == pinned, (
            "writer B did not take the rebase path"
        )
        out = t.read(spark).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "lake_bloom_point_lookup",
    oracle="""
    WITH base AS (
      SELECT md5(CAST(o_orderkey AS VARCHAR)) AS k,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey % 4 AS slice
      FROM orders WHERE o_orderkey % 10 < 2
    ),
    upd AS (
      SELECT k FROM base WHERE slice = 0 AND cents % 100 < 3
    )
    SELECT b.k,
           CASE WHEN u.k IS NOT NULL THEN 'POINT_UPDATED'
                ELSE b.status END AS status,
           b.cents
    FROM base b LEFT JOIN upd u ON u.k = b.k
    """,
)
def lake_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter data skipping, DRIVER-VERIFIED on the keys range
    stats are blind to: the table's key is md5(o_orderkey) — every
    group's [min, max] box spans the whole hex space, so box pruning
    alone must rewrite all four groups on any merge. With
    set_bloom_columns('k'), a point-update merge rewrites ONLY the
    groups that actually hold the touched keys; the query asserts at
    least one group was carried by reference (a silently pruned-to-
    nothing bloom, or a bloom that stopped pruning, fails the assert
    rather than just running slower), then returns the final table
    for the oracle's value check. Reads also prune: the probe
    read(where={k: (v, v)}) must scan at most one group.

    Scale story: this is the uuid/content-hash MERGE shape every CDC
    pipeline on a hash-keyed table hits — O(delta x touched-groups)
    instead of O(table), with the bloom sized ~10 bits/key and carried
    in the manifest like the min/max stats."""
    import shutil
    import tempfile

    from ..io.versioned import VersionedTable, merge_into

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 10 < 2
    ).select(
        F.md5(F.col("o_orderkey").cast("string")).alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        (F.col("o_orderkey") % 4).alias("slice"),
    )
    t = VersionedTable(tempfile.mkdtemp(prefix="lake_bloom_"))
    try:
        for i in range(4):
            t.commit(
                o.filter(F.col("slice") == i).drop("slice"),
                mode="append",
            )
        t.set_bloom_columns(spark, ["k"])
        pre = set(t._load_manifest(t.latest_version())["groups"])
        upd = (
            o.filter((F.col("slice") == 0) & (F.col("cents") % 100 < 3))
            .drop("slice")
            .withColumn("status", F.lit("POINT_UPDATED"))
        )
        merge_into(t, spark, upd, key="k")
        m = t._load_manifest(t.latest_version())
        carried = pre & set(m["groups"])
        assert carried, "bloom touch test rewrote every group"
        # point read prunes: STRICTLY fewer groups than the table has
        # (not "exactly 1" — a Bloom false positive may legitimately
        # keep a second group at some scale factors; pruning-at-all is
        # the property, and it is deterministic per fixture)
        probe = t.read(spark).limit(1).collect()[0]["k"]
        files = t.read(spark, where={"k": (probe, probe)}).inputFiles()
        hit_groups = {f.split("/data/")[1].split("/")[0] for f in files}
        assert 1 <= len(hit_groups) < len(m["groups"]), (
            "bloom point read did not prune"
        )
        out = t.read(spark).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(t.path, ignore_errors=True)
    return out


@register(
    "multimodal_mjpeg_frames",
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             length(hex(encode(text))) // 2 AS n
      FROM documents WHERE length(text) > 0
    ), g AS (
      SELECT doc_id, hx, n, (n + 63) // 64 AS nf FROM h
    ), b AS (
      SELECT doc_id, f.f AS fi, j.j AS bj,
             CASE WHEN 64 * f.f + j.j < n
                  THEN substr(hx, 2 * (64 * f.f + j.j) + 1, 2)
                  ELSE '00' END AS bh
      FROM g,
           UNNEST(generate_series(0, nf - 1)) AS f(f),
           UNNEST(generate_series(0, 63)) AS j(j)
    ), rws AS (
      SELECT doc_id, fi, bj // 8 AS br,
             string_agg(repeat(bh, 8), '' ORDER BY bj) AS rowhex
      FROM b GROUP BY doc_id, fi, bj // 8
    ), px AS (
      SELECT doc_id, fi,
             string_agg(repeat(rowhex, 8), '' ORDER BY br) AS pxhex
      FROM rws GROUP BY doc_id, fi
    ), sm AS (
      SELECT doc_id, fi, SUM(CAST(('0x' || bh) AS INT)) AS sum_b
      FROM b GROUP BY doc_id, fi
    )
    SELECT p.doc_id, CAST(p.fi AS INT) AS frame_idx,
           CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
           CAST(s.sum_b * 15625 AS BIGINT) AS mean_pixel_ppm,
           CAST(('0x' || substr(md5(p.pxhex), 1, 15)) AS BIGINT)
             AS px_checksum
    FROM px p JOIN sm s USING (doc_id, fi)
    """,
)
def multimodal_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame extraction through a REAL MJPEG-in-AVI round trip
    (operators/multimodal.py::mjpeg_video_frame_features): each payload
    becomes one 64x64 flat-tile baseline JPEG per 64-byte slice, the
    frames pack into a spec-valid RIFF AVI (MainAVIHeader, MJPG stream
    headers, word-aligned movi '00dc' chunks, idx1), and the container
    is walked back with every frame run through the full baseline JPEG
    decoder — the 1→N fan-out of a real frame sampler with a genuine
    container AND a genuine codec, retiring the last video stand-in
    (ffmpeg remains the documented plug point for foreign streams
    only).

    DuckDB rebuilds every decoded frame pixel from hex(payload) slice
    algebra (the JPEG tile construction per 64-byte frame window, last
    window zero-padded), so frame count, order, dimensions, means, and
    the per-frame pixel checksums are all value-checked — a misplaced
    movi chunk, a broken idx offset, or an off-by-one in the frame
    slicing flips a hash. Scale: one Arrow-batched mapInPandas pass,
    repartitioned to all cores; output rows = total frames."""
    from ..operators.multimodal import (
        attach_fake_payload,
        mjpeg_video_frame_features,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    return mjpeg_video_frame_features(attach_fake_payload(d))
