"""Training-data preparation surface: weighted sampling, corpus statistics,
language-model scoring, and embedding compression.

The reference (elijah688/file-stream-import) ingests bulk data for exactly
this kind of downstream consumption (internal/writer/writer.go streams CSV
chunks into Postgres); these operators are what a training pipeline runs on
the ingested corpus. All are declarative DataFrame plans with DuckDB
oracles.

Engine-stability rules used throughout (see queries/__init__.py):

* **md5-derived randomness** — both engines parse the first 8 hex chars of
  ``md5(seed || key)`` into a BIGINT, so "random" draws are reproducible
  and identical across engines (same idiom as curation.hash_split).
* **ln() quantization** — natural log differs in the last ulp between the
  JVM and libm, so every ln() result is floor-quantized to an exact
  integer grid (``floor(ln(x)*1eK + 0.5)``, a BIGINT) before any ordering
  or summation depends on it; integer sums are exact in both engines.
* double sums in nondeterministic order go through DECIMAL or integer
  grids; ratios are floor-quantized; counts cast to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io.tables import load_table
from . import register


def _hash_u01(*cols) -> F.Column:
    """Deterministic uniform(0,1) from md5 of the concatenated key.

    (h + 0.5) / 2^32 with h the first 8 hex chars as an integer — never
    exactly 0 or 1, identical in Spark and DuckDB (pure IEEE division).
    """
    h = F.conv(F.substring(F.md5(F.concat_ws("", *cols)), 1, 8), 16, 10)
    return (h.cast("bigint") + F.lit(0.5)) / F.lit(4294967296.0)


@register(
    "weighted_sample_topk",
    oracle="""
    WITH t AS (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        FLOOR(ln((CAST(('0x' || substr(md5('ws=1:'
                 || CAST(l_orderkey AS VARCHAR) || ':'
                 || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT)
               + 0.5) / 4294967296.0) * 1e12 + 0.5)
          / l_extendedprice AS k
      FROM lineitem
    )
    SELECT l_returnflag, l_orderkey,
      CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
    FROM t
    QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag
      ORDER BY k DESC, l_orderkey, l_linenumber) <= 5
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    per group, keep the k rows maximizing ln(u)/w — equivalent to drawing
    k items with probability proportional to weight.

    The draw is seeded md5, not an RNG, so the sample is reproducible
    across runs, engines, and partitionings — the property a training
    pipeline needs for auditable subsampling. One window shuffle on the
    group key; at scale the window is replaceable by the two-phase
    partial top-k (operators/similarity.py knn_topk_partial pattern)
    because max-k of ln(u)/w commutes over partitions. ln is quantized
    to an exact 1e-12 grid before the division (see module docstring).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    u = _hash_u01(
        F.lit("ws=1:"),
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    k = (F.floor(F.log(u) * 1e12 + F.lit(0.5))) / F.col("l_extendedprice")
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("k").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("k", k)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "l_returnflag",
            "l_orderkey",
            F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
            "l_extendedprice",
        )
    )


@register(
    "text_zipf_fit",
    oracle=r"""
    WITH tf AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT lang, UNNEST(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents
      ) GROUP BY lang, tok
    ), ranked AS (
      SELECT lang, cnt,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rnk
      FROM tf
      QUALIFY rnk <= 100
    ), grid AS (
      SELECT lang,
        CAST(FLOOR(ln(rnk) * 1e6 + 0.5) AS BIGINT) AS xi,
        CAST(FLOOR(ln(cnt) * 1e6 + 0.5) AS BIGINT) AS yi
      FROM ranked
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_terms,
      FLOOR(
        CAST(COUNT(*) * SUM(xi * yi) - SUM(xi) * SUM(yi) AS DOUBLE)
        / CAST(COUNT(*) * SUM(xi * xi) - SUM(xi) * SUM(xi) AS DOUBLE)
        * 1e4 + 0.5) / 1e4 + 0.0 AS zipf_slope
    FROM grid GROUP BY lang
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: least-squares slope of ln(freq) vs
    ln(rank) over the top-100 terms (a natural corpus should sit near
    slope -1; a spammy or templated one deviates — a standard
    corpus-health signal).

    The regression runs on exact integer grids: ln(rank) and ln(freq)
    are floor-quantized to 1e-6 BIGINTs, so every sum in the closed-form
    slope is exact integer arithmetic — reduction-order-independent in
    both engines — and the single final division is identical IEEE. Term
    counting is one (lang, tok) groupBy with map-side partial aggregation;
    the top-100 window sees only distinct terms per language, vocabulary-
    bounded, not corpus-bounded.
    """
    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    tf = (
        d.select("lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    wnd = W.partitionBy("lang").orderBy(F.col("cnt").desc(), "tok")
    grid = (
        tf.withColumn("rnk", F.row_number().over(wnd))
        .filter(F.col("rnk") <= 100)
        .select(
            "lang",
            F.floor(F.log(F.col("rnk")) * 1e6 + F.lit(0.5)).alias("xi"),
            F.floor(F.log(F.col("cnt")) * 1e6 + F.lit(0.5)).alias("yi"),
        )
    )
    n = F.count("*")
    sxy, sx, sy, sxx = (
        F.sum(F.col("xi") * F.col("yi")),
        F.sum("xi"),
        F.sum("yi"),
        F.sum(F.col("xi") * F.col("xi")),
    )
    slope = (n * sxy - sx * sy).cast("double") / (n * sxx - sx * sx).cast("double")
    return grid.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_terms"),
        (F.floor(slope * 1e4 + F.lit(0.5)) / 1e4 + F.lit(0.0)).alias("zipf_slope"),
    )


@register(
    "doc_bigram_logprob",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      FROM documents
    ), bg AS (
      SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      FROM w, UNNEST(generate_series(1, len(ws)-1)) AS t(i)
      WHERE len(ws) >= 2
    ), c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1
    ), v AS (
      SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab
      FROM (SELECT UNNEST(ws) AS tok FROM w)
    )
    SELECT bg.doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      FLOOR(CAST(SUM(FLOOR(ln(
          CAST(c12.c12 + 1 AS DOUBLE) / CAST(c1.c1 + v.vocab AS DOUBLE)
        ) * 1e9 + 0.5)) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 + 0.0
        AS avg_logp
    FROM bg
    JOIN c12 USING (w1, w2)
    JOIN c1 USING (w1)
    CROSS JOIN v
    GROUP BY bg.doc_id
    """,
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score: mean add-one-smoothed bigram log
    probability per document, p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V).

    This is the classic perplexity-flavored filter (low average log-prob
    = text unlike the rest of the corpus). The LM tables are vocabulary-
    bounded, not corpus-bounded: c12 ≤ V², c1 ≤ V — the per-bigram join
    shuffles on (w1, w2) where AQE can broadcast the count side once the
    vocabulary is small relative to the corpus, and V is a 1-row
    broadcast. Every ln() is floor-quantized to a 1e-9 integer grid so
    per-document sums are exact integer arithmetic (engine-stable);
    documents with fewer than two tokens have no bigrams and are
    excluded by construction.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("ws"))
    bg = (
        w.filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws)-2),"
                    " i -> struct(ws[i] AS w1, ws[i+1] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = w.select(F.explode("ws").alias("tok")).agg(
        F.countDistinct("tok").alias("vocab")
    )
    lp = F.floor(
        F.log(
            (F.col("c12") + F.lit(1)).cast("double")
            / (F.col("c1") + F.col("vocab")).cast("double")
        )
        * 1e9
        + F.lit(0.5)
    )
    avg = (
        F.sum(F.col("lpq")).cast("double") / F.count("*").cast("double") / F.lit(1e9)
    )
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(v))
        .withColumn("lpq", lp)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            (F.floor(avg * 1e6 + F.lit(0.5)) / 1e6 + F.lit(0.0)).alias("avg_logp"),
        )
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH x AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    ), stats AS (
      SELECT i, MIN(val) AS mn, MAX(val) AS mx FROM x GROUP BY i
    ), q AS (
      SELECT vec_id, x.i, val, mn, mx,
        CASE WHEN mx > mn
          THEN CAST(FLOOR((val - mn) / (mx - mn) * 255 + 0.5) AS BIGINT)
          ELSE 0 END AS qv
      FROM x JOIN stats ON x.i = stats.i
    )
    SELECT vec_id,
      CAST(COUNT(*) AS BIGINT) AS n_dims,
      CAST(SUM(qv * i) AS BIGINT) AS checksum,
      FLOOR(MAX(ABS(val - (mn + CAST(qv AS DOUBLE) / 255.0 * (mx - mn))))
        * 1e9 + 0.5) / 1e9 + 0.0 AS max_abs_err
    FROM q GROUP BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column: per-dimension
    global min/max calibration, 256-level codes, reported as a per-vector
    code checksum plus the max reconstruction error.

    The calibration table is exactly dim rows (64 — fixed by the schema,
    constant-size like region/nation under the dim() broadcast policy),
    so it is hard-broadcast and the quantization pass is a pure
    projection over the exploded values: the only shuffles are the
    64-row stats aggregate and the per-vector regroup. All arithmetic is
    identical-IEEE in both engines (subtract/divide/floor on exact
    min/max — no transcendentals), so codes match bit-for-bit; this is
    the storage-compression step an embedding pipeline runs before ANN
    indexing (operators/similarity.py).
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "fval")
    ).select(
        "vec_id",
        (F.col("pos") + F.lit(1)).alias("i"),
        F.col("fval").cast("double").alias("val"),
    )
    stats = x.groupBy("i").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    q = x.join(F.broadcast(stats), "i").withColumn(
        "qv",
        F.when(
            F.col("mx") > F.col("mn"),
            F.floor(
                (F.col("val") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * 255
                + F.lit(0.5)
            ),
        ).otherwise(F.lit(0)),
    )
    err = F.abs(
        F.col("val")
        - (F.col("mn") + F.col("qv").cast("double") / 255.0 * (F.col("mx") - F.col("mn")))
    )
    return q.groupBy("vec_id").agg(
        F.count("*").cast("bigint").alias("n_dims"),
        F.sum(F.col("qv") * F.col("i")).cast("bigint").alias("checksum"),
        (F.floor(F.max(err) * 1e9 + F.lit(0.5)) / 1e9 + F.lit(0.0)).alias(
            "max_abs_err"
        ),
    )


@register(
    "corpus_pipeline_e2e",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source, text,
        len(string_split_regex(trim(text), '\s+')) AS n_tokens
      FROM documents
    ), gated AS (
      SELECT * FROM toks WHERE n_tokens BETWEEN 30 AND 80
    ), deduped AS (
      SELECT doc_id, source, n_tokens
      FROM gated
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) = 1
    ), split AS (
      SELECT source, n_tokens,
        CASE
          WHEN CAST(('0x' || substr(md5('split=1:' || CAST(doc_id AS VARCHAR)),
               1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
          WHEN CAST(('0x' || substr(md5('split=1:' || CAST(doc_id AS VARCHAR)),
               1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
          ELSE 'test'
        END AS split
      FROM deduped
    )
    SELECT split, source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM split GROUP BY split, source
    """,
)
def corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline in one registered query: quality
    gate (30–80 tokens) → exact content dedup (min doc_id per normalized
    md5) → seeded 80/10/10 hash split → per-(split, source) manifest.

    This is the composition a user of the reference would actually
    deploy downstream of its ingest: each stage is one of this repo's
    verified operators chained on a single lineage. Shuffle budget: one
    hash partition on the content hash (dedup window — WindowGroupLimit
    prunes duplicates map-side first) and one for the final aggregate;
    the gate and split are pure projections fused into the scan stage.
    """
    from ..operators import curation

    d = load_table(spark, sf_dir, "documents")
    gated = d.withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
    ).filter(F.col("n_tokens").between(30, 80))
    wnd = W.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    split = curation.hash_split(deduped, "doc_id")
    return split.groupBy("split", "source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
